"""Component timing of the fused training step at the bench config.

Times scan-chained variants of the batch-1024 bf16 res8 train step so the
cost can be attributed before optimization work: full step, no waveform/spec
augmentation, static (no-VTLP) frontend, forward-only (no grad/optimizer),
and model-only (features precomputed — isolates the frontend+aug share).
Scratch measurement tool; same chained methodology as bench.py.

Usage: python tools/ablate_train_step.py [batch] [iters]
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import sys

import time
from functools import partial

import numpy as np

def main():
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    import jax
    import jax.numpy as jnp

    from howl_tpu.models import create_model
    from howl_tpu.ops.augment import AugmentConfig
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.state import create_train_state
    from howl_tpu.training.step import StepConfig, featurize, make_classification_train_step

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else (1024 if on_tpu else 8)
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else (64 if on_tpu else 2)
    window_samples = 8000
    frontend = FrontendConfig(n_mels=40)

    def step_cfg(**over):
        base = dict(
            frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, augment=AugmentConfig(),
            use_vtlp=True, negative_label=3, use_deltas=False,
            dft_precision=jax.lax.Precision.HIGH if on_tpu else None,
        )
        base.update(over)
        return StepConfig(**base)

    model = create_model("res8", num_labels=4, **({"dtype": jnp.bfloat16} if on_tpu else {}))
    feats0 = featurize(np.zeros((1, window_samples), np.float32), step_cfg())
    state0 = create_train_state(
        model, jax.random.PRNGKey(0), feats0, learning_rate=0.01, lr_decay=0.99, steps_per_epoch=100
    )
    rng = np.random.default_rng(0)
    audio = jax.device_put((rng.standard_normal((batch, window_samples)) * 0.1).astype(np.float32))
    labels = jax.device_put(rng.integers(0, 4, batch).astype(np.int32))
    lengths = jax.device_put(np.full(batch, window_samples, np.int32))

    def chain(step_fn):
        @partial(jax.jit, static_argnames=("n",))
        def run(state, key, n):
            def body(carry, _):
                state, key = carry
                key, sub = jax.random.split(key)
                state, metrics = step_fn(state, audio, labels, lengths, sub)
                return (state, key), metrics["loss"]

            (state, key), losses = jax.lax.scan(body, (state, key), None, length=n)
            return state, losses

        return run

    def time_chain(run, state):
        s, losses = run(state, jax.random.PRNGKey(1), n=iters)
        _ = float(np.asarray(losses[-1]))
        best = float("inf")
        for _rep in range(4):
            t0 = time.perf_counter()
            s, losses = run(state, jax.random.PRNGKey(1), n=iters)
            _ = float(np.asarray(losses[-1]))
            best = min(best, time.perf_counter() - t0)
        return batch * iters / best

    variants = [
        ("full step", make_classification_train_step(model, step_cfg())),
        ("no wave/spec aug", make_classification_train_step(model, step_cfg(augment=None))),
        ("static frontend (no VTLP)", make_classification_train_step(model, step_cfg(use_vtlp=False))),
    ]
    print(f"batch={batch} iters={iters}")
    for name, fn in variants:
        print(f"{name:28s}: {time_chain(chain(fn), state0):10,.0f} ex/s")

    # forward-only: same featurize+aug, loss without grad/optimizer
    cfg = step_cfg()

    def fwd_only(state, audio_, labels_, lengths_, key):
        from howl_tpu.ops import augment as aug
        from howl_tpu.training.objectives import frame_ce_loss

        k_wave, k_vtlp, k_spec, k_drop = jax.random.split(jax.random.fold_in(key, state.step), 4)
        a, replaced = aug.augment_audio(audio_, k_wave, cfg.augment, None, cfg.replace_prob)
        lab = jnp.where(replaced, cfg.negative_label, labels_)
        feats = featurize(a, cfg, k_vtlp)
        feats = aug.spec_augment(feats, k_spec, cfg.augment)
        out, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, feats,
            lengths=None, train=True, rngs={"dropout": k_drop}, mutable=["batch_stats"],
        )
        # fold the loss back into params-shaped state so the chain still
        # serializes through the carry (no optimizer update)
        loss = frame_ce_loss(out, lab)
        state = state.replace(step=state.step + 1)
        return state, {"loss": loss}

    print(f"{'forward only (no grad/opt)':28s}: {time_chain(chain(fwd_only), state0):10,.0f} ex/s")

    # model-only: precomputed features, full grad/opt (isolates frontend+aug)
    feats_fixed = featurize(np.asarray(audio), cfg)
    feats_fixed = jax.device_put(np.asarray(feats_fixed))

    def model_only(state, audio_, labels_, lengths_, key):
        from howl_tpu.training.objectives import frame_ce_loss

        k_drop = jax.random.fold_in(key, state.step)
        # iteration-dependence via a zero-cost perturbation through the chain
        feats = feats_fixed + (state.step.astype(jnp.float32) * 0.0)

        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats}, feats,
                lengths=None, train=True, rngs={"dropout": k_drop}, mutable=["batch_stats"],
            )
            return frame_ce_loss(out, labels_), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, {"loss": loss}

    print(f"{'model fwd/bwd only':28s}: {time_chain(chain(model_only), state0):10,.0f} ex/s")

if __name__ == "__main__":
    main()
