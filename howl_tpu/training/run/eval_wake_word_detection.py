"""Wake-word experiment harness: N seeds x threshold sweep -> reports
(ref: training/run/eval_wake_word_detection.py:23-318).

The reference farms one training process per GPU (polling `ps aux`) and
re-runs a full eval per threshold. Here:

  * seeds train sequentially (single-host) or resume from existing workspaces;
    training is already data-parallel over the device mesh per seed;
  * the threshold sweep scores every clip's posteriors ONCE and re-runs only
    the on-device smoothing+FSM per threshold (~1 ms per batch) — the sweep is
    effectively free;
  * per-threshold ``{t}_results.csv`` files keep the reference format; the
    aggregate clean/noisy reports are CSV with mean/std/p90/p95/p99 across
    seeds (xlsx replaced by CSV; openpyxl-free).
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path
from typing import Dict, List

import numpy as np

from howl_tpu.models import MODEL_REGISTRY
from howl_tpu.settings import SETTINGS
from howl_tpu.utils.args_utils import ArgumentParserBuilder, opt
from howl_tpu.utils.logger import Logger

def _percentiles(values: List[float]) -> dict:
    arr = np.asarray(values, float)
    return {
        "mean": float(arr.mean()),
        "std": float(arr.std(ddof=1)) if len(arr) > 1 else 0.0,
        "p90": float(np.percentile(arr, 90)),
        "p95": float(np.percentile(arr, 95)),
        "p99": float(np.percentile(arr, 99)),
    }


def sweep_workspace(workspace_path: Path, model_name: str, dataset_paths, thresholds, use_stitched: bool):
    """Evaluate one trained workspace over all eval sets at every threshold.

    Returns {set_name: {threshold: (tp, tn, fp, fn)}} plus audio hours, and
    writes the reference-format {threshold}_results.csv files.
    """
    from howl_tpu.data.dataset.dataset import DatasetSplit, DatasetType, WakeWordDataset
    from howl_tpu.data.dataset.dataset_loader import RecursiveNoiseDatasetLoader, WakeWordDatasetLoader
    from howl_tpu.hub import load_workspace_engine
    from howl_tpu.inference.engine import StreamingEngine
    from howl_tpu.models.base import model_spec
    from howl_tpu.training.run.train import BatchedEvaluator, build_noise_bank
    from howl_tpu.utils import hash_utils

    online, ctx = load_workspace_engine(workspace_path, model_name)
    engine = StreamingEngine(
        online.model, online.variables, online.cfg, online.frontend,
        online.zmuv_mean, online.zmuv_std, spec=model_spec(model_name),
    )
    evaluator = BatchedEvaluator(engine)

    loader = WakeWordDatasetLoader()
    ds_kwargs = dict(sample_rate=SETTINGS.audio.sample_rate, mono=SETTINGS.audio.use_mono, frame_labeler=ctx.labeler)
    ww_dev = WakeWordDataset([], DatasetType.DEV, dataset_split=DatasetSplit.DEV, **ds_kwargs)
    ww_test = WakeWordDataset([], DatasetType.TEST, dataset_split=DatasetSplit.TEST, **ds_kwargs)
    for ds_path in dataset_paths:
        _, dev_ds, test_ds = loader.load_splits(Path(ds_path), **ds_kwargs)
        ww_dev.extend(dev_ds)
        ww_test.extend(test_ds)
        if use_stitched:
            _, dev_s, test_s = loader.load_splits(Path(ds_path), prefix="stitched-", **ds_kwargs)
            ww_dev.extend(dev_s)
            ww_test.extend(test_s)

    sets = {
        "Dev positive": (ww_dev.filter(lambda x: ctx.searcher.search(x.transcription), clone=True), True),
        "Dev negative": (ww_dev.filter(lambda x: not ctx.searcher.search(x.transcription), clone=True), False),
        "Test positive": (ww_test.filter(lambda x: ctx.searcher.search(x.transcription), clone=True), True),
        "Test negative": (ww_test.filter(lambda x: not ctx.searcher.search(x.transcription), clone=True), False),
    }

    mix_bank = None
    if SETTINGS.training.use_noise_dataset and SETTINGS.training.noise_dataset_path:
        noise_ds = RecursiveNoiseDatasetLoader().load(
            Path(SETTINGS.training.noise_dataset_path),
            sample_rate=SETTINGS.audio.sample_rate,
            mono=SETTINGS.audio.use_mono,
        )
        _, noise_rest = noise_ds.split(hash_utils.Sha256Splitter(80))
        mix_bank = build_noise_bank(noise_rest if len(noise_rest) else noise_ds, SETTINGS.audio.sample_rate * 2)

    results: Dict[str, Dict[float, tuple]] = {}
    hours: Dict[str, float] = {}
    for name, (dataset, positive) in sets.items():
        sweep, total_ms = evaluator.evaluate_sweep(dataset, positive, thresholds)
        results[name] = {t: (c.tp, c.tn, c.fp, c.fn) for t, c in sweep.items()}
        hours[name] = total_ms / 3.6e6
        if mix_bank is not None:
            sweep_n, total_ms_n = evaluator.evaluate_sweep(dataset, positive, thresholds, mixer_bank=mix_bank)
            split, kind = name.split(" ", 1)
            noisy_name = f"{split} noisy {kind}"
            results[noisy_name] = {t: (c.tp, c.tn, c.fp, c.fn) for t, c in sweep_n.items()}
            hours[noisy_name] = total_ms_n / 3.6e6

    # reference-format per-threshold csvs
    for t in thresholds:
        with (Path(workspace_path) / f"{round(float(t), 2)}_results.csv").open("w") as f:
            for name in results:
                tp, tn, fp, fn = results[name][float(t)]
                f.write(f"{name},{t},{tp},{tn},{fp},{fn}\n")
    return results, hours


def write_reports(report_dir: Path, per_seed: List[dict], hours: dict, thresholds, suffix: str):
    """Aggregate across seeds -> report_{suffix}.csv (+ raw json)."""
    report_dir.mkdir(parents=True, exist_ok=True)
    (report_dir / f"raw_results_{suffix}.json").write_text(json.dumps(per_seed, indent=2))
    set_names = sorted({name for seed in per_seed for name in seed})
    with (report_dir / f"report_{suffix}.csv").open("w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(
            ["set", "threshold", "metric", "mean", "std", "p90", "p95", "p99"]
        )
        for name in set_names:
            if ("noisy" in name) != (suffix == "noisy"):
                continue
            for t in thresholds:
                per_metric = {"tp": [], "tn": [], "fp": [], "fn": [], "tp_rate": [], "fah": []}
                for seed_results in per_seed:
                    if name not in seed_results:
                        continue
                    tp, tn, fp, fn = seed_results[name][float(t)]
                    per_metric["tp"].append(tp)
                    per_metric["tn"].append(tn)
                    per_metric["fp"].append(fp)
                    per_metric["fn"].append(fn)
                    per_metric["tp_rate"].append(tp / max(tp + fn, 1))
                    per_metric["fah"].append(fp / max(hours.get(name, 0.0), 1e-9))
                for metric, values in per_metric.items():
                    if not values:
                        continue
                    stats = _percentiles(values)
                    writer.writerow(
                        [name, t, metric]
                        + [round(stats[k], 4) for k in ("mean", "std", "p90", "p95", "p99")]
                    )


def run(args=None) -> dict:
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    apb = ArgumentParserBuilder()
    apb.add_options(
        opt("--model", type=str, choices=sorted(MODEL_REGISTRY), default="res8"),
        opt("--workspace", type=str, required=True, help="base dir; per-seed workspaces go under it"),
        opt("--dataset-paths", "-i", type=str, nargs="+", default=[SETTINGS.dataset.dataset_path]),
        opt("--num-models", "-n", type=int, default=1, help="number of seeds"),
        opt("--threshold-hop", type=float, default=0.05),
        opt("--use-stitched-datasets", action="store_true"),
        opt("--skip-training", action="store_true", help="only evaluate existing workspaces"),
        opt("--steps-per-epoch", type=int, default=0),
        opt("--no-augment", dest="use_augment", action="store_false", default=True),
    )
    args = apb.parser.parse_args(args)

    base = Path(args.workspace)
    thresholds = [round(t, 2) for t in np.arange(0.0, 1.000001, args.threshold_hop)]
    Logger.heading(f"wake word experiment: {args.num_models} seeds x {len(thresholds)} thresholds")

    # ---- TRAIN PHASE (sequential seeds; each run is mesh-DP internally) ----
    import os

    from howl_tpu.training.run.train import run as train_run

    seed_workspaces = []
    for seed in range(args.num_models):
        ws = base / f"seed_{seed}"
        seed_workspaces.append(ws)
        if args.skip_training or (ws / "model-best.flax").exists():
            Logger.info(f"seed {seed}: workspace exists, skipping training")
            continue
        os.environ["SEED"] = str(seed)
        SETTINGS.reset()
        train_args = [
            "--model", args.model, "--workspace", str(ws), "--eval-freq", "0",
        ] + sum ([["-i", p] for p in args.dataset_paths], [])
        if args.steps_per_epoch:
            train_args += ["--steps-per-epoch", str(args.steps_per_epoch)]
        if args.use_stitched_datasets:
            train_args += ["--use-stitched-datasets"]
        if not args.use_augment:
            train_args += ["--no-augment"]
        train_run(train_args)

    # ---- EVAL PHASE: one model pass per set, all thresholds ----
    per_seed = []
    hours = {}
    for ws in seed_workspaces:
        results, ws_hours = sweep_workspace(
            ws, args.model, args.dataset_paths, thresholds, args.use_stitched_datasets
        )
        per_seed.append({name: {float(t): v for t, v in res.items()} for name, res in results.items()})
        hours = ws_hours

    # ---- REPORT PHASE ----
    report_dir = base / "reports"
    write_reports(report_dir, per_seed, hours, thresholds, "clean")
    if any("noisy" in name for seed in per_seed for name in seed):
        write_reports(report_dir, per_seed, hours, thresholds, "noisy")
    (report_dir / "hours.json").write_text(json.dumps(hours, indent=2))
    Logger.info(f"reports written to {report_dir}")
    return {"per_seed": per_seed, "hours": hours, "thresholds": thresholds}


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
