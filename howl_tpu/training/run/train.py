"""Wake-word training / evaluation driver (ref: training/run/train.py:35-328).

Capability parity with the reference flow — aligned-dataset loading, pos/neg
splits via the transcript searcher, ZMUV fit, frame-CE or CTC objective,
noise-dataset mixing, periodic dev evaluation gating the best checkpoint, final
clean/noisy dev/test sweeps with errors.tsv and per-threshold results csv —
with the numeric path redesigned for TPU:

  * the train step (frontend+augmentations+model+loss+AdamW) is ONE jitted
    program; host code only samples fixed-shape windows;
  * evaluation scores ENTIRE datasets as batched device programs via
    StreamingEngine.infer_batch instead of the reference's per-clip Python
    loop over per-window forward passes (SURVEY.md §3.1 bottleneck);
  * noisy eval mixes noise on device with a fixed key (deterministic, like the
    reference's seeded DatasetMixer).
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from howl_tpu.context import InferenceContext
from howl_tpu.data.common.tokenizer import WakeWordTokenizer
from howl_tpu.data.dataset.dataset import DatasetSplit, DatasetType, WakeWordDataset
from howl_tpu.data.dataset.dataset_loader import RecursiveNoiseDatasetLoader, WakeWordDatasetLoader
from howl_tpu.data.transform.batchifier import AudioSequenceBatchifier, WakeWordFrameBatchifier
from howl_tpu.inference.config import EngineConfig
from howl_tpu.inference.engine import StreamingEngine
from howl_tpu.models import MODEL_REGISTRY, ConfusionMatrix, create_model
from howl_tpu.models.base import model_spec
from howl_tpu.ops.augment import AugmentConfig
from howl_tpu.ops.frontend import FrontendConfig
from howl_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from howl_tpu.settings import SETTINGS
from howl_tpu.training.state import create_train_state, param_count
from howl_tpu.training.step import StepConfig, featurize, make_classification_train_step, make_ctc_train_step
from howl_tpu.utils import hash_utils
from howl_tpu.utils.args_utils import ArgumentParserBuilder, opt
from howl_tpu.utils.logger import Logger
from howl_tpu.utils.random_utils import set_random_seed
from howl_tpu.workspace import Workspace


def build_noise_bank(
    noise_ds, window_samples: int, max_windows: int = 512, seed: int = 0
) -> Optional[np.ndarray]:
    """Seeded FULL-CORPUS (N, window) noise bank for on-device eval mixing.

    This used to take the first ``max_windows`` contiguous chunks of the
    first few files (~4 minutes of noise); the reference's seeded eval
    ``DatasetMixer`` samples uniformly over the whole noise corpus
    (ref: training/run/train.py:219-220, howl/data/transform/transform.py:199-229).
    Draws are now uniform over (clip, offset) via ``NoiseBankSampler`` —
    deterministic per ``seed`` (every eval pass sees the same noise, like the
    reference's ``seed=0`` mixers), with the whole-corpus distribution."""
    if not len(noise_ds.metadata_list):
        return None
    from howl_tpu.data.noise_bank import NoiseBankSampler

    return NoiseBankSampler(
        noise_ds, window_samples, num_windows=max_windows, seed=seed
    ).sample(0)


@partial(jax.jit, static_argnames=("strength", "prob"))
def _mix_for_eval_device(audio, noise_bank, key, strength: float, prob: float):
    batch, n = audio.shape
    k_apply, k_row, k_alpha = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k_apply, prob, (batch,))
    rows = jax.random.randint(k_row, (batch,), 0, noise_bank.shape[0])
    reps = -(-n // noise_bank.shape[1])
    tiled = jnp.tile(noise_bank[rows], (1, reps))[:, :n]
    alpha = jnp.where(apply, jax.random.uniform(k_alpha, (batch,)) * strength, 0.0)[:, None]
    return audio * (1.0 - alpha) + tiled * alpha


def mix_for_eval(audio, noise_bank, seed: int = 0, strength: float = 0.2, prob: float = 0.75, fold: int = 0):
    """Deterministic noisy-eval mixing ON DEVICE (ref train.py:219-220 seeded
    DatasetMixer). Vectorized over the batch — the round-1 host loop mixed
    per-row in Python, which dominated eval at hey-snips scale (13,943
    negatives). ``fold`` varies the key across batches of one eval pass."""
    key = jax.random.fold_in(jax.random.PRNGKey(seed), fold)
    return _mix_for_eval_device(jnp.asarray(audio), jnp.asarray(noise_bank), key, float(strength), float(prob))


class BatchedEvaluator:
    """Scores whole eval splits through StreamingEngine with length bucketing.

    With ``mesh``, each eval batch is split over the mesh's ``data`` axis and
    the engine variables replicate across it, so the hey-snips-scale sweeps
    (13,943 negatives) ride all chips; results are identical to the
    single-device path (tests/test_train_dp.py)."""

    def __init__(self, engine: StreamingEngine, bucket_seconds: float = 1.0, max_batch: int = 256, mesh=None):
        self.engine = engine
        self.bucket_samples = int(bucket_seconds * engine.cfg.sample_rate)
        self.max_batch = max_batch
        self.mesh = mesh
        if mesh is not None:
            engine.variables = replicate(engine.variables, mesh)

    def _shard(self, chunk_len: int, audio, lengths):
        """Pad rows to a multiple of the data-axis size and place on the mesh.
        Padded rows have length 0 (every window masked invalid) and are
        sliced off the results by the callers via ``chunk_len``."""
        if self.mesh is None:
            return audio, lengths
        n_data = self.mesh.shape["data"]
        pad = -chunk_len % n_data
        if pad:
            audio = np.concatenate([np.asarray(audio), np.zeros((pad, audio.shape[1]), np.float32)])
            lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])
        return shard_batch((audio, lengths), self.mesh)

    def _batches(self, dataset, mixer_bank, mixer_seed):
        buckets = {}
        total_ms = 0.0
        batch_counter = 0
        for idx in range(len(dataset)):
            sample = dataset[idx]
            n = max(len(sample.audio_data), 1)
            bucket = -(-n // self.bucket_samples) * self.bucket_samples
            buckets.setdefault(bucket, []).append((idx, sample))
            total_ms += n / self.engine.cfg.sample_rate * 1000.0
        self.last_total_ms = total_ms
        for bucket, items in sorted(buckets.items()):
            for start in range(0, len(items), self.max_batch):
                chunk = items[start : start + self.max_batch]
                audio = np.zeros((len(chunk), bucket), np.float32)
                lengths = np.zeros(len(chunk), np.int64)
                for row, (_, sample) in enumerate(chunk):
                    n = min(len(sample.audio_data), bucket)
                    audio[row, :n] = sample.audio_data[:n]
                    lengths[row] = n
                if mixer_bank is not None:
                    audio = mix_for_eval(audio, mixer_bank, seed=mixer_seed, fold=batch_counter)
                batch_counter += 1
                audio, lengths = self._shard(len(chunk), audio, lengths)
                yield chunk, audio, lengths

    def evaluate(self, dataset, positive_set: bool, mixer_bank: Optional[np.ndarray] = None, mixer_seed: int = 0):
        """Returns (ConfusionMatrix, errors list, total_audio_ms)."""
        conf = ConfusionMatrix()
        errors = []
        for chunk, audio, lengths in self._batches(dataset, mixer_bank, mixer_seed):
            result = self.engine.infer_batch(audio, lengths)
            detected = np.asarray(result["detected"])[: len(chunk)]
            conf.increment_array(detected, np.full(len(chunk), positive_set))
            for row, (_, sample) in enumerate(chunk):
                if bool(detected[row]) != positive_set:
                    errors.append(
                        (sample.metadata.transcription, int(detected[row]), int(positive_set), str(sample.metadata.path))
                    )
        return conf, errors, self.last_total_ms

    def evaluate_sweep(
        self,
        dataset,
        positive_set: bool,
        thresholds,
        mixer_bank: Optional[np.ndarray] = None,
        mixer_seed: int = 0,
    ):
        """Threshold sweep as ONE device dispatch per batch: the model scores
        once and the cheap smoothing+FSM is vmapped over the thresholds axis
        (the reference re-runs full training eval per threshold,
        ref eval_wake_word_detection.py:241-256; round 2 here still paid one
        relay round-trip per threshold per batch).

        Returns ({threshold: ConfusionMatrix}, total_audio_ms)."""
        thresholds = [float(t) for t in thresholds]
        results = {t: ConfusionMatrix() for t in thresholds}
        for chunk, audio, lengths in self._batches(dataset, mixer_bank, mixer_seed):
            detected = self.engine.infer_sweep_batch(audio, lengths, thresholds)  # (K, B)
            labels = np.full(len(chunk), positive_set)
            for k, t in enumerate(thresholds):
                results[t].increment_array(detected[k, : len(chunk)], labels)
        return results, self.last_total_ms


def run(args=None) -> dict:
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    apb = ArgumentParserBuilder()
    apb.add_options(
        opt("--model", type=str, choices=sorted(MODEL_REGISTRY), default="las"),
        opt("--workspace", type=str, default=str(Path("workspaces") / "default")),
        opt("--load-weights", action="store_true"),
        opt("--load-last", action="store_true"),
        opt("--resume", action="store_true", help="restore the FULL train state (incl. optimizer) and continue"),
        opt("--dataset-paths", "-i", type=str, nargs="+", default=[SETTINGS.dataset.dataset_path]),
        opt("--eval-freq", type=int, default=10),
        opt("--eval", action="store_true"),
        opt("--use-stitched-datasets", action="store_true"),
        opt("--steps-per-epoch", type=int, default=0, help="0 = one pass over the train set"),
        opt("--use-augment", action="store_true", default=True),
        opt("--no-augment", dest="use_augment", action="store_false"),
        opt("--seed", type=int, default=None, help="override SETTINGS.training.seed (explicit plumbing; no env mutation)"),
        opt(
            "--num-devices",
            type=int,
            default=0,
            help="data-parallel mesh size for training AND batched eval "
            "(0 = largest divisor of the batch size <= all devices). Params "
            "replicate, batches split on the data axis; GSPMD inserts the "
            "gradient all-reduce and global BatchNorm stats (SURVEY.md §2.9 "
            "first-class add #1 — replaces the reference's single .to(device), "
            "ref train.py:131)",
        ),
        opt(
            "--fused-trunk",
            action="store_true",
            help="trunk-mode training for res8: batches become context segments "
            "and logits pool the central window span of clip-contextual trunk "
            "features, exactly matching the engine's fused clip-level scoring",
        ),
        opt(
            "--use-timestretch",
            action="store_true",
            help="host-side phase-vocoder time stretch on full clips before window "
            "sampling (ref transform.py:146-166; opt-in, rescales label timestamps)",
        ),
        opt(
            "--bf16",
            action="store_true",
            help="mixed-precision training: bf16 activations with f32 params/"
            "optimizer state and a 3-pass HIGH-precision DFT GEMM (checkpoints "
            "stay f32; convergence parity gated by tests/test_train_bf16.py)",
        ),
        opt(
            "--noise-bank-mb",
            type=float,
            default=16.0,
            help="device-memory budget for the training noise bank (f32; 16 MB "
            "= 524 half-second windows at 16 kHz). Sized by budget, not a "
            "hard window count (VERDICT r3 #4)",
        ),
        opt(
            "--noise-refresh-epochs",
            type=int,
            default=1,
            help="re-draw the noise bank from the FULL corpus every N epochs "
            "(host decode overlapped with training, swap costs zero recompile; "
            "0 = static bank cut once at startup)",
        ),
    )
    args = apb.parser.parse_args(args)
    if args.seed is not None:
        SETTINGS.training.seed = args.seed

    set_random_seed(SETTINGS.training.seed)
    use_frame = SETTINGS.training.objective == "frame"
    workspace = Workspace(Path(args.workspace), delete_existing=not (args.eval or args.resume))

    Logger.heading("Loading datasets")
    ctx = InferenceContext(
        vocab=SETTINGS.training.vocab, token_type=SETTINGS.training.token_type, use_blank=not use_frame
    )
    loader = WakeWordDatasetLoader()
    ds_kwargs = dict(sample_rate=SETTINGS.audio.sample_rate, mono=SETTINGS.audio.use_mono, frame_labeler=ctx.labeler)

    ww_train = WakeWordDataset([], DatasetType.TRAINING, dataset_split=DatasetSplit.TRAINING, **ds_kwargs)
    ww_dev = WakeWordDataset([], DatasetType.DEV, dataset_split=DatasetSplit.DEV, **ds_kwargs)
    ww_test = WakeWordDataset([], DatasetType.TEST, dataset_split=DatasetSplit.TEST, **ds_kwargs)
    for ds_path in args.dataset_paths:
        train_ds, dev_ds, test_ds = loader.load_splits(Path(ds_path), **ds_kwargs)
        ww_train.extend(train_ds)
        ww_dev.extend(dev_ds)
        ww_test.extend(test_ds)
    if args.use_stitched_datasets:
        for ds_path in args.dataset_paths:
            train_ds, dev_ds, test_ds = loader.load_splits(Path(ds_path), prefix="stitched-", **ds_kwargs)
            ww_train.extend(train_ds)
            ww_dev.extend(dev_ds)
            ww_test.extend(test_ds)

    for name, ds in (("train", ww_train), ("dev", ww_dev), ("test", ww_test)):
        Logger.info(f"{name}: {len(ds)} clips")
    if len(ww_train) == 0 and not args.eval:
        raise SystemExit(
            f"no training clips found under {args.dataset_paths} — expected "
            "aligned-metadata-{training,dev,test}.jsonl plus an audio/ directory"
        )

    dev_pos = ww_dev.filter(lambda x: ctx.searcher.search(x.transcription), clone=True)
    dev_neg = ww_dev.filter(lambda x: not ctx.searcher.search(x.transcription), clone=True)
    test_pos = ww_test.filter(lambda x: ctx.searcher.search(x.transcription), clone=True)
    test_neg = ww_test.filter(lambda x: not ctx.searcher.search(x.transcription), clone=True)
    Logger.info(
        f"dev+: {len(dev_pos)} dev-: {len(dev_neg)} test+: {len(test_pos)} test-: {len(test_neg)}"
    )

    sample_rate = SETTINGS.audio.sample_rate
    window_ms = int(SETTINGS.training.max_window_size_seconds * 1000)
    window_samples = int(window_ms / 1000 * sample_rate)

    trunk_context_samples = 0
    trunk_span = None
    if args.fused_trunk:
        if not use_frame or not model_spec(args.model).supports_trunk:
            raise SystemExit("--fused-trunk requires the frame objective and a trunk-capable model (res8)")
        # margin >= trunk receptive field: conv0 (1 frame/side) + 6 post-pool
        # 3x3 convs (6 pooled = 18 frames/side) -> 19 frames; round to 20
        hop = SETTINGS.audio_transform.hop_length
        trunk_context_samples = 20 * hop
        pool_t = 3  # res8 time pooling
        span = (window_samples // hop + 1) // pool_t
        lo = round((trunk_context_samples // hop) / pool_t)
        trunk_span = (lo, lo + span)

    if use_frame:
        batchifier = WakeWordFrameBatchifier(
            ctx.negative_label,
            window_size_ms=window_ms,
            sample_rate=sample_rate,
            context_samples=trunk_context_samples,
        )
    else:
        tokenizer = WakeWordTokenizer(ctx.vocab, ignore_oov=False)
        # WAV-header scan: no decode of the whole corpus just to size batches
        from howl_tpu.utils.audio_utils import wav_num_samples

        max_audio = max(
            (wav_num_samples(m.path, sample_rate) for m in ww_train.metadata_list),
            default=window_samples,
        )
        batchifier = AudioSequenceBatchifier(
            ctx.negative_label, tokenizer, sample_rate=sample_rate, max_audio_samples=max_audio
        )

    # noise dataset -> device banks (train) + host banks (eval mixers)
    noise_bank = None
    noise_sampler = None
    dev_mix_bank = test_mix_bank = None
    if SETTINGS.training.use_noise_dataset and SETTINGS.training.noise_dataset_path:
        noise_ds = RecursiveNoiseDatasetLoader().load(
            Path(SETTINGS.training.noise_dataset_path), sample_rate=sample_rate, mono=SETTINGS.audio.use_mono
        )
        Logger.info(f"loaded {len(noise_ds.metadata_list)} noise files")
        noise_train, noise_rest = noise_ds.split(hash_utils.Sha256Splitter(80))
        noise_dev, noise_test = noise_rest.split(hash_utils.Sha256Splitter(50))
        # small noise corpora can leave a split empty; fall back to all noise
        for name in ("noise_train", "noise_dev", "noise_test"):
            if len(locals()[name]) == 0:
                Logger.warning(f"{name} split is empty; falling back to the full noise set")
        noise_train = noise_train if len(noise_train) else noise_ds
        noise_dev = noise_dev if len(noise_dev) else noise_ds
        noise_test = noise_test if len(noise_test) else noise_ds
        # bank sized by memory budget, windows drawn from the FULL train-noise
        # corpus; refreshed between epochs so long runs see the reference
        # DatasetMixer's whole-corpus distribution (VERDICT r3 #4)
        from howl_tpu.data.noise_bank import NoiseBankSampler, windows_for_budget

        noise_sampler = NoiseBankSampler(
            noise_train,
            window_samples,
            num_windows=windows_for_budget(args.noise_bank_mb, window_samples),
            seed=SETTINGS.training.seed,
        )
        noise_bank = noise_sampler.sample(0)
        # eval mixers tile noise across the clip, so chunk size just needs to
        # be <= the shortest noise clip
        probe_lens = [len(noise_ds.load_audio(m)) for m in noise_ds.metadata_list[:8]]
        eval_chunk = min([sample_rate * 2] + [n for n in probe_lens if n])
        dev_mix_bank = build_noise_bank(noise_dev, eval_chunk)
        test_mix_bank = build_noise_bank(noise_test, eval_chunk)

    Logger.heading("ZMUV normalization")
    frontend_cfg = FrontendConfig.from_settings()
    zmuv = workspace.load_zmuv()
    if zmuv is None:
        from howl_tpu.ops.zmuv import fit_zmuv

        rng = np.random.default_rng(0)
        idxs = rng.permutation(len(ww_train))[:256]
        zmuv = fit_zmuv(
            (batchifier([ww_train[int(i)]]).audio_data for i in idxs), frontend_cfg
        )
        workspace.save_zmuv(zmuv)
    Logger.info(f"zmuv: mean={zmuv.mean:.4f} std={zmuv.std:.4f}")

    Logger.heading("Model preparation")
    batch_size = SETTINGS.training.batch_size
    n_avail = len(jax.devices())
    if args.num_devices:
        if batch_size % args.num_devices:
            raise SystemExit(
                f"--num-devices {args.num_devices} must divide the batch size {batch_size}"
            )
        n_data = args.num_devices
    else:
        n_data = max(d for d in range(1, n_avail + 1) if batch_size % d == 0)
    mesh = make_mesh(data=n_data)
    Logger.info(f"mesh: {mesh}")

    step_cfg = StepConfig(
        frontend=frontend_cfg,
        zmuv_mean=zmuv.mean,
        zmuv_std=zmuv.std,
        augment=AugmentConfig(sample_rate=sample_rate) if args.use_augment else None,
        use_vtlp=args.use_augment,
        # ref train.py:215 constructs DatasetMixer with do_replace=False, so
        # replace-mode (clear-label) mixing is OFF during training by default
        replace_prob=0.0,
        negative_label=ctx.negative_label,
        blank_label=ctx.blank_label,
        trunk_span=trunk_span,
        # delta/accel channels are computed only for models that read them
        # (LAS); exactly value-preserving for channel-0 models since ZMUV is
        # one scalar affine (see StepConfig.use_deltas)
        use_deltas=model_spec(args.model).uses_deltas,
        # bf16 mode: 3-pass HIGH DFT GEMM — its 2.2e-4 log-mel error sits far
        # below the bf16 activation noise (docs/PERFORMANCE.md)
        dft_precision=jax.lax.Precision.HIGH if args.bf16 else None,
    )
    model_kwargs = {"dtype": jnp.bfloat16} if args.bf16 else {}
    model = create_model(args.model, num_labels=ctx.num_labels, **model_kwargs)
    spec = model_spec(args.model)
    if SETTINGS.training.convert_static:
        # wrap the static classifier into a per-frame sequential model
        # (ref train.py:247-248: ConvertedStaticModel(model, 40, 10))
        from dataclasses import replace as dc_replace

        from howl_tpu.models.base import ConvertedStaticModel

        model = ConvertedStaticModel(inner=model, frame_window_size=40, frame_stride_size=10)
        spec = dc_replace(spec, is_sequential=True)
    example_audio = np.zeros((1, window_samples), np.float32)
    example_feats = featurize(example_audio, step_cfg)
    steps_per_epoch = args.steps_per_epoch or max(len(ww_train) // SETTINGS.training.batch_size, 1)
    state = create_train_state(
        model,
        jax.random.PRNGKey(SETTINGS.training.seed),
        example_feats,
        learning_rate=SETTINGS.training.learning_rate,
        weight_decay=SETTINGS.training.weight_decay,
        lr_decay=SETTINGS.training.lr_decay,
        steps_per_epoch=steps_per_epoch,
    )
    Logger.info(f"{param_count(state)} parameters")

    if args.resume and workspace.has_train_state():
        # exact resume: params + optimizer state + step counter (the reference
        # never checkpointed optimizer state, SURVEY.md §5)
        state = workspace.load_train_state(state)
        Logger.info(f"resumed full train state at step {int(state.step)}")
    elif args.resume:
        Logger.warning(f"--resume given but {workspace.path}/train_state.flax not found; training fresh")
    elif args.load_weights or args.eval:
        variables = workspace.load_model(
            {"params": state.params, "batch_stats": state.batch_stats}, best=not args.load_last
        )
        state = state.replace(params=variables["params"], batch_stats=variables["batch_stats"])
    # params/opt-state replicate across the mesh; batches arrive split on the
    # data axis (shard_batch below) and GSPMD derives the gradient all-reduce
    # and cross-replica BatchNorm stats (tests/test_train_dp.py proves 1-vs-8
    # device step equivalence)
    state = replicate(state, mesh)

    def make_engine() -> StreamingEngine:
        eng_cfg = EngineConfig.from_settings(ctx)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return StreamingEngine(
            model, variables, eng_cfg, frontend_cfg, zmuv.mean, zmuv.std, spec=spec
        )

    def evaluate_engine(dataset, prefix: str, positive_set: bool, save: bool = False, mixer_bank=None, epoch_idx: int = 0):
        engine = make_engine()
        evaluator = BatchedEvaluator(engine, mesh=mesh)
        conf, errors, total_ms = evaluator.evaluate(dataset, positive_set, mixer_bank)
        Logger.info(f"{prefix}: {conf} mcc={conf.mcc:.4f}")
        with (workspace.path / "errors.tsv").open("a") as error_file:
            print(prefix, file=error_file)
            for row in errors:
                error_file.write("\t".join(map(str, row)) + "\n")
        if save and not args.eval and positive_set:
            workspace.log_scalar(f"{prefix}/Metric/tp_rate", conf.tp / max(len(dataset), 1), epoch_idx)
            workspace.increment_model(
                {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)},
                conf.tp,
            )
        if args.eval:
            threshold = engine.cfg.inference_threshold
            with (workspace.path / f"{round(threshold, 2)}_results.csv").open("a") as f:
                f.write(f"{prefix},{threshold},{conf.tp},{conf.tn},{conf.fp},{conf.fn}\n")
        return conf

    def do_evaluate() -> dict:
        results = {}
        results["dev_pos"] = evaluate_engine(dev_pos, "Dev positive", True)
        results["dev_neg"] = evaluate_engine(dev_neg, "Dev negative", False)
        if dev_mix_bank is not None:
            results["dev_noisy_pos"] = evaluate_engine(dev_pos, "Dev noisy positive", True, mixer_bank=dev_mix_bank)
            results["dev_noisy_neg"] = evaluate_engine(dev_neg, "Dev noisy negative", False, mixer_bank=dev_mix_bank)
        results["test_pos"] = evaluate_engine(test_pos, "Test positive", True)
        results["test_neg"] = evaluate_engine(test_neg, "Test negative", False)
        if test_mix_bank is not None:
            results["test_noisy_pos"] = evaluate_engine(test_pos, "Test noisy positive", True, mixer_bank=test_mix_bank)
            results["test_noisy_neg"] = evaluate_engine(test_neg, "Test noisy negative", False, mixer_bank=test_mix_bank)
        return results

    if args.eval:
        Logger.heading("Model evaluation")
        return {k: vars(v) | {"mcc": v.mcc} for k, v in do_evaluate().items()}

    Logger.heading("Model training")
    workspace.write_args(args)
    workspace.save_settings(SETTINGS)

    noise_bank_dev = jax.numpy.asarray(noise_bank) if noise_bank is not None else None
    if use_frame:
        train_step = make_classification_train_step(model, step_cfg, noise_bank_dev)
    else:
        train_step = make_ctc_train_step(model, step_cfg, noise_bank_dev)

    # between-epoch bank refresh: decode the next draw on a background thread
    # while this epoch trains; the swap is one upload + set_bank (same shape
    # -> zero recompile, the bank is a traced argument of the step)
    bank_prefetcher = None
    if noise_sampler is not None and args.noise_refresh_epochs > 0 and args.use_augment:
        from howl_tpu.data.noise_bank import NoiseBankPrefetcher

        bank_prefetcher = NoiseBankPrefetcher(noise_sampler)
        bank_prefetcher.start(1)

    key = jax.random.PRNGKey(SETTINGS.training.seed + 1)
    rng = np.random.default_rng(SETTINGS.training.seed)
    timestretch = None
    if args.use_timestretch and args.use_augment:
        from howl_tpu.ops.timestretch import TimestretchSampleAugment

        timestretch = TimestretchSampleAugment(seed=SETTINGS.training.seed)

    for epoch_idx in range(SETTINGS.training.num_epochs):
        order = rng.permutation(len(ww_train))
        losses = []
        for start in range(0, steps_per_epoch * batch_size, batch_size):
            idxs = [int(order[(start + j) % len(order)]) for j in range(batch_size)]
            samples = [ww_train[i] for i in idxs]
            if timestretch is not None:
                samples = timestretch(samples)
            batch = batchifier(samples)
            if use_frame:
                audio, labels, lengths = shard_batch(
                    (batch.audio_data, batch.labels, batch.lengths), mesh
                )
                state, metrics = train_step(state, audio, labels, lengths, key)
            else:
                audio, labels, audio_lengths, label_lengths = shard_batch(
                    (batch.audio_data, batch.labels, batch.audio_lengths, batch.label_lengths), mesh
                )
                state, metrics = train_step(state, audio, labels, audio_lengths, label_lengths, key)
            losses.append(float(metrics["loss"]))
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        workspace.log_scalar("Training/Loss", mean_loss, epoch_idx)
        lr = state.learning_rate
        if lr is not None:
            workspace.log_scalar("Training/LearningRate", float(lr), epoch_idx)
        Logger.info(f"epoch {epoch_idx}: loss={mean_loss:.4f}")
        if (
            bank_prefetcher is not None
            and (epoch_idx + 1) % args.noise_refresh_epochs == 0
            and epoch_idx + 1 < SETTINGS.training.num_epochs
        ):
            refresh_idx = (epoch_idx + 1) // args.noise_refresh_epochs
            train_step.set_bank(jax.numpy.asarray(bank_prefetcher.get()))
            bank_prefetcher.start(refresh_idx + 1)
        if args.eval_freq > 0 and epoch_idx % args.eval_freq == 0 and epoch_idx != 0:
            evaluate_engine(dev_pos, "Dev positive", True, save=True, epoch_idx=epoch_idx)

    # make sure a checkpoint exists even when eval_freq never triggered
    workspace.increment_model(
        {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)},
        workspace.best_quality if workspace.best_quality > float("-inf") else 0.0,
    )
    workspace.save_train_state(state)

    Logger.heading("Model evaluation")
    return {k: vars(v) | {"mcc": v.mcc} for k, v in do_evaluate().items()}


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
