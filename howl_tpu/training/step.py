"""Jitted train/eval steps: frontend + augmentation + model + loss in ONE
compiled program per geometry.

The reference splits this across DataLoader workers (augmentation, CPU),
per-batch H2D copies, and separate CUDA kernels (ref: training/run/train.py:281-302).
Here the host only ships raw PCM windows; everything else — VTLP mel, ZMUV,
waveform noise/shift, SpecAugment, the model, the loss, AdamW — fuses under one
jit. Under a sharded mesh the same program is the DP program: batch arrays
arrive split on the ``data`` axis and GSPMD inserts the gradient all-reduce.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from howl_tpu.ops import augment as aug
from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram, log_mel_spectrogram_vtlp, stack_deltas
from howl_tpu.training.objectives import ctc_loss, frame_ce_loss


class StepConfig(NamedTuple):
    frontend: FrontendConfig
    zmuv_mean: float
    zmuv_std: float
    augment: Optional[aug.AugmentConfig] = None
    use_vtlp: bool = True
    vtlp_prob: float = 0.75
    replace_prob: float = 0.0
    negative_label: int = 0
    blank_label: int = -1
    # trunk-mode training (fused-trunk res8): batches are context segments and
    # the logits come from trunk frames [lo, hi) via Res8.windowed_logits, so
    # training matches the engine's fused clip-level scoring exactly
    trunk_span: Optional[Tuple[int, int]] = None
    # skip the delta/accel channel stack for models that only read channel 0
    # (every family except LAS). EXACTLY value-preserving for those models:
    # ZMUV is one scalar affine, so channel 0 is bit-identical either way —
    # the deltas were pure wasted compute (the reference always pays it,
    # ref transform.py:280)
    use_deltas: bool = True
    # DFT GEMM precision inside the train step (None = exact HIGHEST; pass
    # jax.lax.Precision.HIGH with bf16 model compute, where 3-pass error
    # [2.2e-4 log-mel] is far below the bf16 activation noise)
    dft_precision: Optional[object] = None


def featurize(audio: jnp.ndarray, cfg: StepConfig, key: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, samples) -> ZMUV-normalized (B, 3, F, T) features.

    With a key, applies VTLP (random warp alpha ~ U[0.9, 1.1), applied with
    ``vtlp_prob`` as in ref transform.py:256-263) — traced, so the random
    filterbank stays on device.
    """
    if key is not None and cfg.use_vtlp:
        k_alpha, k_prob = jax.random.split(key)
        alpha = jax.random.uniform(k_alpha, (), minval=0.9, maxval=1.1)
        alpha = jnp.where(jax.random.bernoulli(k_prob, cfg.vtlp_prob), alpha, 1.0)
        feats = log_mel_spectrogram_vtlp(audio, alpha, cfg.frontend, precision=cfg.dft_precision)
    else:
        feats = log_mel_spectrogram(audio, cfg.frontend, precision=cfg.dft_precision)
    feats = stack_deltas(feats) if cfg.use_deltas else feats[:, None]
    return (feats - cfg.zmuv_mean) / cfg.zmuv_std


class NoiseBankTrainStep:
    """Train-step callable holding a REFRESHABLE device noise bank.

    The bank enters the jitted program as a traced ARGUMENT
    (``aug.PreparedNoiseBank`` is a registered pytree), not a closure
    constant, so ``set_bank`` with a same-shape bank swaps contents with ZERO
    retrace/recompile — the epoch-refresh path that lets long runs sample the
    entire noise corpus like the reference's per-example ``DatasetMixer``
    (ref transform.py:199-229). The bank's windowing views (wrap extension +
    the Pallas kernel's tile-aligned flat view) are derived ONCE per
    (bank, window size) here — deriving them inside every step execution
    costs ~166 MB of HBM traffic per step at the recipe (512, 32000) bank.
    Call signature matches the bankless step: (state, audio, *rest)."""

    def __init__(self, jitted: Callable, noise_bank):
        self._jitted = jitted
        self._prepared: dict = {}
        self._bank = None
        self.set_bank(noise_bank)

    def set_bank(self, noise_bank):
        """Swap in a refreshed bank (same shape -> no recompile)."""
        self._prepared.clear()
        if isinstance(noise_bank, aug.PreparedNoiseBank):
            self._prepared[noise_bank.window] = noise_bank
            self._bank = None
        else:
            self._bank = noise_bank

    def _prepared_for(self, window: int) -> aug.PreparedNoiseBank:
        prep = self._prepared.get(window)
        if prep is None:
            if self._bank is None:
                raise ValueError(
                    f"noise bank was prepared for windows {sorted(self._prepared)}; "
                    f"cannot serve {window}-sample windows (set_bank with a raw array to re-derive)"
                )
            prep = self._prepared[window] = aug.prepare_noise_bank(self._bank, window)
        return prep

    def __call__(self, state, audio, *rest):
        return self._jitted(state, audio, *rest, self._prepared_for(audio.shape[-1]))


def _with_bank(noise_bank, jitted: Callable) -> Callable:
    """Bind an optional noise bank to a jitted step taking it as last arg."""
    if noise_bank is None:

        def step(state, audio, *rest):
            return jitted(state, audio, *rest, None)

        return step
    return NoiseBankTrainStep(jitted, noise_bank)


def make_classification_train_step(model, cfg: StepConfig, noise_bank=None) -> Callable:
    """Returns jitted (state, audio, labels, lengths, key) -> (state, metrics).

    With a noise bank, the returned callable is a ``NoiseBankTrainStep``
    (same call signature) whose bank can be hot-swapped via ``set_bank``."""
    return _with_bank(noise_bank, _build_classification_step(model, cfg))


def _build_classification_step(model, cfg: StepConfig) -> Callable:
    @jax.jit
    def train_step(state, audio, labels, lengths, key, noise_bank):
        k_wave, k_vtlp, k_spec, k_drop = jax.random.split(jax.random.fold_in(key, state.step), 4)
        if cfg.augment is not None:
            audio, replaced = aug.augment_audio(audio, k_wave, cfg.augment, noise_bank, cfg.replace_prob)
            labels = jnp.where(replaced, cfg.negative_label, labels)
        feats = featurize(audio, cfg, k_vtlp if cfg.use_vtlp else None)
        if cfg.augment is not None:
            feats = aug.spec_augment(feats, k_spec, cfg.augment)
        # clamp: windows shorter than n_fft would yield negative lengths,
        # which flax RNN masking treats as all-masked (garbage logits)
        model_lengths = (
            jnp.maximum(cfg.frontend.compute_lengths(lengths), 1) if lengths is not None else None
        )

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            apply_kwargs = dict(train=True, rngs={"dropout": k_drop}, mutable=["batch_stats"])
            if cfg.trunk_span is not None:
                out, mutated = state.apply_fn(
                    variables, feats, cfg.trunk_span[0], cfg.trunk_span[1],
                    method="windowed_logits", **apply_kwargs
                )
            else:
                out, mutated = state.apply_fn(variables, feats, lengths=model_lengths, **apply_kwargs)
            loss = frame_ce_loss(out, labels)
            return loss, (out, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        acc = (logits.argmax(-1) == labels).mean()
        return state, {"loss": loss, "accuracy": acc}

    return train_step


def make_classification_eval_step(model, cfg: StepConfig) -> Callable:
    """Returns jitted (state, audio, lengths) -> logits (B, L)."""

    @jax.jit
    def eval_step(state, audio, lengths):
        feats = featurize(audio, cfg)
        model_lengths = (
            jnp.maximum(cfg.frontend.compute_lengths(lengths), 1) if lengths is not None else None
        )
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            feats,
            lengths=model_lengths,
            train=False,
        )

    return eval_step


def make_ctc_train_step(model, cfg: StepConfig, noise_bank=None) -> Callable:
    """CTC objective over sequential models (ref train.py:250-253, 293-299)."""
    return _with_bank(noise_bank, _build_ctc_step(model, cfg))


def _build_ctc_step(model, cfg: StepConfig) -> Callable:
    @jax.jit
    def train_step(state, audio, labels, audio_lengths, label_lengths, key, noise_bank):
        k_wave, k_vtlp, k_spec, k_drop = jax.random.split(jax.random.fold_in(key, state.step), 4)
        if cfg.augment is not None:
            audio, _ = aug.augment_audio(audio, k_wave, cfg.augment, noise_bank, 0.0)
        feats = featurize(audio, cfg, k_vtlp if cfg.use_vtlp else None)
        if cfg.augment is not None:
            feats = aug.spec_augment(feats, k_spec, cfg.augment)
        frame_lengths = jnp.maximum(cfg.frontend.compute_lengths(audio_lengths), 1)

        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                feats,
                lengths=frame_lengths,
                train=True,
                rngs={"dropout": k_drop},
                mutable=["batch_stats"],
            )
            # model may downsample time; map frame lengths through it
            out_lengths = model.compute_length(frame_lengths)
            out_lengths = jnp.minimum(out_lengths, out.shape[0])
            loss = ctc_loss(out, out_lengths, labels, label_lengths, cfg.blank_label)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, {"loss": loss}

    return train_step
