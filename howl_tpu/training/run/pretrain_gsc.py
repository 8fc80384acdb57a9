"""GSC keyword-classification pretraining (ref: training/run/pretrain_gsc.py:22-148).

Flow parity: GSC loader -> ZMUV fit -> AdamW train loop with exponential LR
decay -> dev/test accuracy -> workspace checkpoints. TPU-first differences: the
whole train step (frontend + augmentation + model + loss) is one jitted
program; batches are fixed-shape windows; optional mesh DP via --num-devices.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import numpy as np

from howl_tpu.data.dataset.gsc_loader import GoogleSpeechCommandsDatasetLoader
from howl_tpu.data.transform.batchifier import ClassificationBatchSampler
from howl_tpu.models import MODEL_REGISTRY, create_model
from howl_tpu.models.base import model_spec
from howl_tpu.ops.augment import AugmentConfig
from howl_tpu.ops.frontend import FrontendConfig
from howl_tpu.ops.zmuv import ZmuvTransform
from howl_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from howl_tpu.settings import SETTINGS
from howl_tpu.training.state import create_train_state, param_count
from howl_tpu.training.step import (
    StepConfig,
    featurize,
    make_classification_eval_step,
    make_classification_train_step,
)
from howl_tpu.utils.args_utils import ArgumentParserBuilder, opt
from howl_tpu.utils.logger import Logger
from howl_tpu.utils.random_utils import set_random_seed
from howl_tpu.workspace import Workspace


def fit_zmuv(sampler, frontend_cfg: FrontendConfig, max_batches: int = 128) -> ZmuvTransform:
    """Fit global mean/std over frontend features (ref pretrain_gsc.py:97-106)."""
    from howl_tpu.ops.zmuv import fit_zmuv as _fit

    zmuv = _fit((batch.audio_data for batch in sampler), frontend_cfg, max_batches=max_batches)
    Logger.info(f"zmuv: mean={zmuv.mean:.4f} std={zmuv.std:.4f}")
    return zmuv


def evaluate_accuracy(eval_step, state, sampler, prefix: str) -> float:
    num_corr = 0
    num_tot = 0
    for batch in sampler:
        logits = np.asarray(eval_step(state, batch.audio_data, batch.lengths))
        valid = getattr(batch, "valid", len(batch.labels))
        preds = logits.argmax(-1)[:valid]
        num_corr += int((preds == batch.labels[:valid]).sum())
        num_tot += valid
    acc = num_corr / max(num_tot, 1)
    Logger.info(f"{prefix} accuracy: {acc:.4f} ({num_corr}/{num_tot})")
    return acc


def run_sharded_seeds(args, mesh, model, step_cfg, example_feats, make_sampler, train_ds, dev_ds, test_ds, workspace):
    """Train N seeds as ONE sharded program: stacked TrainStates on the mesh
    'seed' axis, per-seed batches sharded (seed, data). The TPU-native
    replacement for the reference's one-process-per-GPU farm (SURVEY §2.9)."""
    import jax

    from howl_tpu.parallel.seed_sweep import create_seed_states, make_seed_sweep_step, shard_seed_batch
    from howl_tpu.training.step import make_classification_eval_step, make_classification_train_step

    n_seeds = args.sharded_seeds
    steps_per_epoch = max(len(train_ds) // SETTINGS.training.batch_size, 1)
    states = create_seed_states(
        model,
        seeds=list(range(n_seeds)),
        example_feats=example_feats,
        mesh=mesh,
        learning_rate=SETTINGS.training.learning_rate,
        weight_decay=SETTINGS.training.weight_decay,
        lr_decay=SETTINGS.training.lr_decay,
        steps_per_epoch=steps_per_epoch,
    )
    sweep_step = make_seed_sweep_step(make_classification_train_step(model, step_cfg))
    eval_step = make_classification_eval_step(model, step_cfg)
    sweep_eval = jax.jit(jax.vmap(eval_step, in_axes=(0, None, None)))
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(n_seeds))

    def make_seed_samplers(epoch):
        return [iter(make_sampler(train_ds, True, True, seed=1000 * (s + 1) + epoch)) for s in range(n_seeds)]

    for epoch_idx in range(SETTINGS.training.num_epochs):
        losses = []
        for batches in zip(*make_seed_samplers(epoch_idx)):
            audio = np.stack([b.audio_data for b in batches])
            labels = np.stack([b.labels for b in batches])
            lengths = np.stack([b.lengths for b in batches])
            audio, labels, lengths = shard_seed_batch((audio, labels, lengths), mesh)
            states, metrics = sweep_step(states, audio, labels, lengths, keys)
            losses.append(np.asarray(metrics["loss"]))
        mean_loss = np.mean(np.stack(losses), axis=0) if losses else np.full(n_seeds, np.nan)
        Logger.info(f"epoch {epoch_idx}: per-seed loss={np.round(mean_loss, 4).tolist()}")

    def sweep_accuracy(sampler, prefix):
        corr = np.zeros(n_seeds)
        tot = 0
        for batch in sampler:
            logits = np.asarray(sweep_eval(states, batch.audio_data, batch.lengths))  # (S, B, L)
            valid = getattr(batch, "valid", len(batch.labels))
            preds = logits.argmax(-1)[:, :valid]
            corr += (preds == batch.labels[None, :valid]).sum(axis=1)
            tot += valid
        accs = corr / max(tot, 1)
        Logger.info(f"{prefix} per-seed accuracy: {np.round(accs, 4).tolist()}")
        return accs

    dev_accs = sweep_accuracy(make_sampler(dev_ds, False, False), "Dev")
    test_accs = sweep_accuracy(make_sampler(test_ds, False, False), "Test")

    # unstack per-seed checkpoints into seed_i/ subdirectories
    host_states = jax.device_get(states)
    for s in range(n_seeds):
        seed_vars = {
            "params": jax.tree.map(lambda x: x[s], host_states.params),
            "batch_stats": jax.tree.map(lambda x: x[s], host_states.batch_stats),
        }
        seed_ws = Workspace(workspace.path / f"seed_{s}", delete_existing=False)
        seed_ws.increment_model(seed_vars, float(dev_accs[s]) / 10)
    return {
        "dev_acc": float(dev_accs.mean()),
        "test_acc": float(test_accs.mean()),
        "per_seed_dev_acc": dev_accs.tolist(),
        "per_seed_test_acc": test_accs.tolist(),
    }


def run(args=None) -> dict:
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    apb = ArgumentParserBuilder()
    apb.add_options(
        opt("--model", type=str, choices=sorted(MODEL_REGISTRY), default="las"),
        opt("--workspace", type=str, default=str(Path("workspaces") / "default")),
        opt("--load-weights", action="store_true"),
        opt("--eval", action="store_true"),
        opt("--num-labels", type=int, default=30),
        opt(
            "--silence-proportion",
            type=float,
            default=0.0,
            help="inject this fraction of synthetic silence samples labeled "
            "'__silence__' (ref HonkSpeechCommandsDataset, dataset.py:297-320)",
        ),
        opt("--num-devices", type=int, default=0, help="mesh data-axis size (0 = all devices)"),
        opt("--use-augment", action="store_true", default=True),
        opt("--no-augment", dest="use_augment", action="store_false"),
        opt(
            "--bf16",
            action="store_true",
            help="mixed-precision training: bf16 activations, f32 params + logits (all model families)",
        ),
        opt(
            "--sharded-seeds",
            type=int,
            default=0,
            help="train N seeds concurrently as ONE program sharded over the "
            "mesh 'seed' axis (replaces the reference's process job farm)",
        ),
    )
    args = apb.parser.parse_args(args)

    workspace = Workspace(Path(args.workspace), delete_existing=not args.eval)
    set_random_seed(SETTINGS.training.seed)
    sample_rate = SETTINGS.audio.sample_rate
    window_samples = int(SETTINGS.training.max_window_size_seconds * sample_rate)

    loader = GoogleSpeechCommandsDatasetLoader(SETTINGS.training.vocab)
    train_ds, dev_ds, test_ds = loader.load_splits(Path(SETTINGS.dataset.dataset_path))
    if args.silence_proportion > 0:
        for ds in (train_ds, dev_ds, test_ds):
            ds.label_map.setdefault("__silence__", len(SETTINGS.training.vocab) + 1)
            ds.silence_proportion = args.silence_proportion
    Logger.info(f"splits: train={len(train_ds)} dev={len(dev_ds)} test={len(test_ds)}")

    batch_size = SETTINGS.training.batch_size
    if args.sharded_seeds > 1:
        import jax as _jax

        n_dev = len(_jax.devices())
        mesh = make_mesh(seed=args.sharded_seeds, data=max(n_dev // args.sharded_seeds, 1))
    else:
        mesh = make_mesh(data=args.num_devices or None)
    Logger.info(f"mesh: {mesh}")

    def make_sampler(ds, shuffle, drop_last, seed=0):
        return ClassificationBatchSampler(
            ds, batch_size, window_samples, shuffle=shuffle, drop_last=drop_last, seed=seed
        )

    frontend_cfg = FrontendConfig.from_settings()
    zmuv = workspace.load_zmuv()
    if zmuv is None:
        zmuv = fit_zmuv(make_sampler(train_ds, True, True), frontend_cfg)
        workspace.save_zmuv(zmuv)

    augment_cfg = AugmentConfig(sample_rate=sample_rate) if args.use_augment else None
    step_cfg = StepConfig(
        frontend=frontend_cfg,
        zmuv_mean=zmuv.mean,
        zmuv_std=zmuv.std,
        augment=augment_cfg,
        use_vtlp=args.use_augment,
        # delta channels only for models that read them (exactly value-
        # preserving for channel-0 models; see StepConfig.use_deltas)
        use_deltas=model_spec(args.model).uses_deltas,
    )

    model_kwargs = {}
    if getattr(args, "bf16", False):
        import jax.numpy as jnp

        model_kwargs["dtype"] = jnp.bfloat16
    model = create_model(args.model, num_labels=args.num_labels, **model_kwargs)
    example_feats = featurize(np.zeros((1, window_samples), np.float32), step_cfg)

    if args.sharded_seeds > 1 and not args.eval:
        workspace.write_args(args)
        workspace.save_settings(SETTINGS)
        return run_sharded_seeds(
            args, mesh, model, step_cfg, example_feats, make_sampler, train_ds, dev_ds, test_ds, workspace
        )

    steps_per_epoch = max(len(train_ds) // batch_size, 1)
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
    state = replicate(state, mesh)

    train_step = make_classification_train_step(model, step_cfg)
    eval_step = make_classification_eval_step(model, step_cfg)

    if args.load_weights or args.eval:
        variables = workspace.load_model({"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=variables["params"], batch_stats=variables["batch_stats"])
    if args.eval:
        dev_acc = evaluate_accuracy(eval_step, state, make_sampler(dev_ds, False, False), "Dev")
        test_acc = evaluate_accuracy(eval_step, state, make_sampler(test_ds, False, False), "Test")
        return {"dev_acc": dev_acc, "test_acc": test_acc}

    workspace.write_args(args)
    workspace.save_settings(SETTINGS)
    key = jax.random.PRNGKey(SETTINGS.training.seed + 1)

    dev_acc = 0.0
    for epoch_idx in range(SETTINGS.training.num_epochs):
        sampler = make_sampler(train_ds, True, True, seed=epoch_idx)
        losses = []
        for batch in sampler:
            audio, labels, lengths = shard_batch(
                (batch.audio_data, batch.labels, batch.lengths), mesh
            )
            state, metrics = train_step(state, audio, labels, lengths, key)
            losses.append(float(metrics["loss"]))
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        workspace.log_scalar("Training/Loss", mean_loss, epoch_idx)
        Logger.info(f"epoch {epoch_idx}: loss={mean_loss:.4f}")
        dev_acc = evaluate_accuracy(eval_step, state, make_sampler(dev_ds, False, False), "Dev")
        workspace.log_scalar("Dev/Metric/acc", dev_acc, epoch_idx)
        workspace.increment_model(
            {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)},
            dev_acc / 10,
        )
        workspace.save_train_state(state)

    test_acc = evaluate_accuracy(eval_step, state, make_sampler(test_ds, False, False), "Test")
    workspace.log_scalar("Test/Metric/acc", test_acc, SETTINGS.training.num_epochs)
    Logger.info(f"model: {args.model} dev_acc: {dev_acc:.4f} test_acc: {test_acc:.4f}")
    return {"dev_acc": dev_acc, "test_acc": test_acc}


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
