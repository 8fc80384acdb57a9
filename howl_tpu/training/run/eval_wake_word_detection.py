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
    from howl_tpu.hub import load_workspace_streaming_engine
    from howl_tpu.training.run.train import BatchedEvaluator, build_noise_bank
    from howl_tpu.utils import hash_utils

    engine, ctx = load_workspace_streaming_engine(workspace_path, model_name)
    # eval batches split over all devices' data axis (padding handles ragged
    # final batches); identical results to single-device (test_train_dp.py)
    from howl_tpu.parallel.mesh import make_mesh

    evaluator = BatchedEvaluator(engine, mesh=make_mesh())

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


def train_seeds_sharded(args, base: Path, seeds) -> None:
    """Train all seeds of the wakeword model as ONE mesh-sharded program
    (frame OR ctc objective — the reference harness sweeps any objective via
    env vars, ref eval_wake_word_detection.py:187-207): stacked TrainStates on
    the 'seed' axis, per-seed batches sharded (seed, data), then per-seed
    workspaces unstacked so the eval phase consumes them exactly like
    sequentially-trained ones."""
    import jax

    from howl_tpu.context import InferenceContext
    from howl_tpu.data.common.tokenizer import WakeWordTokenizer
    from howl_tpu.data.dataset.dataset import DatasetSplit, DatasetType, WakeWordDataset
    from howl_tpu.data.dataset.dataset_loader import WakeWordDatasetLoader
    from howl_tpu.data.transform.batchifier import AudioSequenceBatchifier, WakeWordFrameBatchifier
    from howl_tpu.models import create_model
    from howl_tpu.ops.augment import AugmentConfig
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.parallel.mesh import make_mesh
    from howl_tpu.parallel.seed_sweep import create_seed_states, make_seed_sweep_step, shard_seed_batch
    from howl_tpu.training.step import (
        StepConfig,
        featurize,
        make_classification_train_step,
        make_ctc_train_step,
    )
    from howl_tpu.workspace import Workspace

    use_frame = SETTINGS.training.objective == "frame"
    n_seeds = len(seeds)
    n_dev = len(jax.devices())
    mesh = make_mesh(seed=n_seeds, data=max(n_dev // n_seeds, 1))
    Logger.info(f"sharded seed training on mesh {mesh}")

    ctx = InferenceContext(
        vocab=SETTINGS.training.vocab, token_type=SETTINGS.training.token_type, use_blank=not use_frame
    )
    loader = WakeWordDatasetLoader()
    ds_kwargs = dict(sample_rate=SETTINGS.audio.sample_rate, mono=SETTINGS.audio.use_mono, frame_labeler=ctx.labeler)
    ww_train = WakeWordDataset([], DatasetType.TRAINING, dataset_split=DatasetSplit.TRAINING, **ds_kwargs)
    for ds_path in args.dataset_paths:
        train_ds, _, _ = loader.load_splits(Path(ds_path), **ds_kwargs)
        ww_train.extend(train_ds)
        if args.use_stitched_datasets:
            train_s, _, _ = loader.load_splits(Path(ds_path), prefix="stitched-", **ds_kwargs)
            ww_train.extend(train_s)
    if len(ww_train) == 0:
        raise SystemExit(f"no training clips under {args.dataset_paths}")

    sample_rate = SETTINGS.audio.sample_rate
    window_samples_bank = int(SETTINGS.training.max_window_size_seconds * sample_rate)
    noise_bank = None
    if SETTINGS.training.use_noise_dataset and SETTINGS.training.noise_dataset_path:
        # same on-device noise mixing as the sequential per-seed path
        # (train.py:283-297) — without this the sharded seeds would train
        # clean while the report's noisy eval assumes noise-augmented models
        from howl_tpu.data.dataset.dataset_loader import RecursiveNoiseDatasetLoader
        from howl_tpu.training.run.train import build_noise_bank
        from howl_tpu.utils import hash_utils

        noise_ds = RecursiveNoiseDatasetLoader().load(
            Path(SETTINGS.training.noise_dataset_path), sample_rate=sample_rate, mono=SETTINGS.audio.use_mono
        )
        noise_train, _ = noise_ds.split(hash_utils.Sha256Splitter(80))
        noise_bank = build_noise_bank(noise_train if len(noise_train) else noise_ds, window_samples_bank)
    window_ms = int(SETTINGS.training.max_window_size_seconds * 1000)
    window_samples = int(window_ms / 1000 * sample_rate)
    frontend_cfg = FrontendConfig.from_settings()

    if not use_frame:
        # one corpus-wide WAV-header scan, shared by the probe and all seeds
        from howl_tpu.utils.audio_utils import wav_num_samples

        ctc_max_audio = max(
            (wav_num_samples(m.path, sample_rate) for m in ww_train.metadata_list),
            default=window_samples,
        )
        ctc_tokenizer = WakeWordTokenizer(ctx.vocab, ignore_oov=False)

    def make_batchifier(seed=None):
        if use_frame:
            return WakeWordFrameBatchifier(
                ctx.negative_label, window_size_ms=window_ms, sample_rate=sample_rate, seed=seed
            )
        return AudioSequenceBatchifier(
            ctx.negative_label, ctc_tokenizer, sample_rate=sample_rate, max_audio_samples=ctc_max_audio
        )

    # shared ZMUV fit (one model-independent statistic)
    from howl_tpu.ops.zmuv import fit_zmuv

    probe_bf = make_batchifier(seed=0)
    rng = np.random.default_rng(0)
    zmuv = fit_zmuv(
        (probe_bf([ww_train[int(i)]]).audio_data for i in rng.permutation(len(ww_train))[:128]),
        frontend_cfg,
    )

    from howl_tpu.models.base import model_spec

    step_cfg = StepConfig(
        frontend=frontend_cfg,
        zmuv_mean=zmuv.mean,
        zmuv_std=zmuv.std,
        augment=AugmentConfig(sample_rate=sample_rate) if args.use_augment else None,
        use_vtlp=args.use_augment,
        negative_label=ctx.negative_label,
        blank_label=ctx.blank_label,
        # see StepConfig.use_deltas: exactly value-preserving for ch0 models
        use_deltas=model_spec(args.model).uses_deltas,
    )
    model = create_model(args.model, num_labels=ctx.num_labels)
    example_samples = window_samples if use_frame else probe_bf.max_audio_samples
    example_feats = featurize(np.zeros((1, example_samples), np.float32), step_cfg)
    batch_size = SETTINGS.training.batch_size
    steps_per_epoch = args.steps_per_epoch or max(len(ww_train) // batch_size, 1)
    states = create_seed_states(
        model,
        seeds=list(seeds),
        example_feats=example_feats,
        mesh=mesh,
        learning_rate=SETTINGS.training.learning_rate,
        weight_decay=SETTINGS.training.weight_decay,
        lr_decay=SETTINGS.training.lr_decay,
        steps_per_epoch=steps_per_epoch,
    )
    per_model_step = (
        make_classification_train_step(model, step_cfg, noise_bank)
        if use_frame
        else make_ctc_train_step(model, step_cfg, noise_bank)
    )
    sweep_step = make_seed_sweep_step(per_model_step)
    keys = jax.vmap(jax.random.PRNGKey)(np.asarray(seeds))
    batchifiers = [make_batchifier(seed=1000 + s) for s in seeds]
    sample_rngs = [np.random.default_rng(2000 + s) for s in seeds]

    for epoch_idx in range(SETTINGS.training.num_epochs):
        losses = []
        for _ in range(steps_per_epoch):
            batches = [
                bf([ww_train[int(i)] for i in r.integers(0, len(ww_train), batch_size)])
                for bf, r in zip(batchifiers, sample_rngs)
            ]
            audio = np.stack([b.audio_data for b in batches])
            labels = np.stack([b.labels for b in batches])
            if use_frame:
                lengths = np.stack([b.lengths for b in batches])
                audio, labels, lengths = shard_seed_batch((audio, labels, lengths), mesh)
                states, metrics = sweep_step(states, audio, labels, lengths, keys)
            else:
                audio_lengths = np.stack([b.audio_lengths for b in batches])
                label_lengths = np.stack([b.label_lengths for b in batches])
                audio, labels, audio_lengths, label_lengths = shard_seed_batch(
                    (audio, labels, audio_lengths, label_lengths), mesh
                )
                states, metrics = sweep_step(states, audio, labels, audio_lengths, label_lengths, keys)
            losses.append(np.asarray(metrics["loss"]))
        mean_loss = np.mean(np.stack(losses), axis=0) if losses else np.full(n_seeds, np.nan)
        Logger.info(f"epoch {epoch_idx}: per-seed loss={np.round(mean_loss, 4).tolist()}")

    host_states = jax.device_get(states)
    for idx, s in enumerate(seeds):
        ws = Workspace(base / f"seed_{s}")
        ws.save_model(
            {
                "params": jax.tree.map(lambda x: x[idx], host_states.params),
                "batch_stats": jax.tree.map(lambda x: x[idx], host_states.batch_stats),
            },
            best=True,
        )
        ws.save_zmuv(zmuv)
        ws.save_settings(SETTINGS)
        ws.write_args(args)


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
        opt(
            "--sharded-seeds",
            action="store_true",
            help="train ALL seeds as one program sharded over the mesh 'seed' "
            "axis (frame or ctc objective; replaces sequential per-seed training)",
        ),
    )
    args = apb.parser.parse_args(args)

    base = Path(args.workspace)
    thresholds = [round(t, 2) for t in np.arange(0.0, 1.000001, args.threshold_hop)]
    Logger.heading(f"wake word experiment: {args.num_models} seeds x {len(thresholds)} thresholds")

    from howl_tpu.training.run.train import run as train_run

    seed_workspaces = [base / f"seed_{s}" for s in range(args.num_models)]
    missing = [s for s in range(args.num_models) if not (seed_workspaces[s] / "model-best.flax").exists()]

    if args.sharded_seeds and not args.skip_training and missing:
        # train ONLY the missing seeds (the sequential branch skips existing
        # workspaces the same way; retraining all would overwrite them)
        # ---- TRAIN PHASE (all seeds concurrently, one sharded program) ----
        train_seeds_sharded(args, base, missing)
    else:
        # ---- TRAIN PHASE (sequential seeds; each train_run builds its own
        # data-parallel mesh over all devices — train.py --num-devices) ----
        for seed in range(args.num_models):
            ws = seed_workspaces[seed]
            if args.skip_training or (ws / "model-best.flax").exists():
                Logger.info(f"seed {seed}: workspace exists, skipping training")
                continue
            train_args = [
                "--model", args.model, "--workspace", str(ws), "--eval-freq", "0", "--seed", str(seed),
            ] + sum([["-i", p] for p in args.dataset_paths], [])
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
