"""On-device augmentation: everything the reference ran in CPU DataLoader
workers (ref: howl/data/transform/transform.py:100-232, 299-339) expressed as
pure jnp functions over fixed-shape batches, applied inside the jitted train
step with explicit PRNG keys.

Per-example application probability (0.75 default in the reference's
AugmentModule.forward, transform.py:90-97) becomes a bernoulli mask + where.

Timestretch is the one exception: resampling changes lengths, so it runs on
host over full clips before window sampling — see howl_tpu/ops/timestretch.py
(phase vocoder + label-timestamp rescaling, wired via train.py
--use-timestretch).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    """Reference-default magnitudes (transform.py parameter domains)."""

    prob: float = 0.75
    timeshift_max_s: float = 0.25  # TimeshiftTransform domain[0]
    white_strength: float = 0.001  # NoiseTransform 'white' domain[3]
    salt_pepper_prob: float = 1.0 / 10000  # 'salt_pepper' domain[2]
    mixer_strength: float = 0.2  # DatasetMixer 'strength' domain[1]
    sa_freq: int = 10  # SpecAugment 'sa_freq' domain[2]
    sa_time: int = 75  # SpecAugment 'sa_time' domain[2]
    sample_rate: int = 16000


def _per_example_mask(key, batch: int, prob: float):
    return jax.random.bernoulli(key, prob, (batch,))


# the chunk-grid shift must offer at least this many distinct magnitudes per
# direction, or the op falls back to sample-exact gathers (a grid coarser
# than this would visibly collapse the augmentation's shift diversity)
_MIN_SHIFT_STEPS = 8


def _shift_chunk(n: int, pad: int = None) -> int:
    """Largest divisor of n in [64, 128] for the one-hot chunked shift whose
    grid still offers >= _MIN_SHIFT_STEPS distinct shift magnitudes within
    ``pad`` (default: the n//2 maximum); 0 if none exists (fall back to the
    per-row dynamic_slice gather). The floor of 64 bounds the one-hot at
    O(b * (n/64)^2): smaller divisors make the permutation matrix dwarf the
    gather it replaces (c=8 at n=7928 would materialize a 7.5 GB one-hot for
    a 1024-row batch). A small shift range prefers a smaller chunk (e.g.
    pad=800 at n=8000 picks c=100, 8 steps) over losing the matmul."""
    if pad is None:
        pad = n // 2
    for c in range(128, 63, -1):
        if n % c == 0 and pad // c >= _MIN_SHIFT_STEPS:
            return c
    return 0


def timeshift(
    audio: jnp.ndarray, key: jax.Array, cfg: AugmentConfig, _force_gather: bool = False
) -> jnp.ndarray:
    """Random shift left/right by up to ``timeshift_max_s`` (zero-filled).

    The reference crops up to half the clip from one side (transform.py:120-144);
    with fixed shapes a shift + zero mask is the equivalent operation.

    Per-row gathers are hostile to the TPU (a vmapped dynamic_slice measured
    3.1 ms for (1024, 8000) on v5e — and per-ELEMENT take_along_axis ~9 ms at
    an eighth the batch), so for production window lengths the shift runs as
    ONE one-hot permutation matmul over whole chunks: shifts are quantized to
    the chunk grid (c = 125 samples = 7.8 ms at the 0.5 s recipe — the same
    rationale as the noise-bank NOISE_OFFSET_QUANTUM: sub-chunk shift
    resolution carries no augmentation value, while the in-chunk residual
    stage it replaces cost a second GEMM against a 2x-wider one-hot, the
    step's largest HBM write). one-hot x f32 at Precision.HIGHEST is bitwise
    identical to a gather at the same quantized starts (``_force_gather``
    routes through that gather for the parity test). Windows whose chunk grid
    would offer < _MIN_SHIFT_STEPS distinct magnitudes (or with no chunk
    divisor at all) keep SAMPLE-exact shifts via the gather. Skipped rows are
    passed through verbatim with a final select (the identity one-hot alone
    would still rewrite them through the matmul, flipping -0.0 and spreading
    any non-finite sample); for APPLIED rows a non-finite input sample NaNs
    its whole one-hot neighborhood rather than staying put — corrupt PCM
    should be rejected upstream either way.
    """
    b, n = audio.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pad = min(int(cfg.timeshift_max_s * cfg.sample_rate), n // 2)  # static bound
    max_shift = jnp.minimum(
        (jax.random.uniform(k1, (b,)) * cfg.timeshift_max_s * cfg.sample_rate).astype(jnp.int32),
        n // 2,
    )
    left = jax.random.bernoulli(k2, 0.5, (b,))
    shift = jnp.where(left, -max_shift, max_shift)
    apply = _per_example_mask(k3, b, cfg.prob)
    del k4
    c = _shift_chunk(n, pad)
    if c == 0:
        # sample-exact per-row contiguous-slice gather: no divisor satisfies
        # the grid (window has no [64, 128] divisor, or the shift range is
        # tiny — quantizing it would collapse shift diversity)
        padded = jnp.pad(audio, ((0, 0), (pad, pad)))
        starts = jnp.where(apply, jnp.clip(pad - shift, 0, 2 * pad), pad)
        return jax.vmap(lambda row, s: jax.lax.dynamic_slice(row, (s,), (n,)))(padded, starts)
    pad_c = -(-pad // c) * c  # zero-pad rounded up to whole chunks
    kq = pad_c // c
    q_shift = jnp.clip(jnp.round(shift / c).astype(jnp.int32), -kq, kq)
    q = jnp.where(apply, kq - q_shift, kq)  # start chunk per row
    if _force_gather:
        padded = jnp.pad(audio, ((0, 0), (pad_c, pad_c)))
        return jax.vmap(lambda row, s: jax.lax.dynamic_slice(row, (s,), (n,)))(padded, q * c)
    k_in = (n + 2 * pad_c) // c
    k_out = n // c
    # exact one-hot products need f32 operands; sub-f32 audio round-trips
    # losslessly (the permutation only moves values), cast back at the select
    padded = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad_c, pad_c))).reshape(b, k_in, c)
    oh = (q[:, None, None] + jnp.arange(k_out)[:, None] == jnp.arange(k_in)[None, :]).astype(
        jnp.float32
    )
    out = jnp.einsum("bkc,bjk->bjc", padded, oh, precision=jax.lax.Precision.HIGHEST)
    return jnp.where(apply[:, None], out.reshape(b, n).astype(audio.dtype), audio)


def white_noise(audio: jnp.ndarray, key: jax.Array, cfg: AugmentConfig) -> jnp.ndarray:
    """Additive gaussian noise with per-example random strength (transform.py:179-187)."""
    b, n = audio.shape
    k1, k2, k3 = jax.random.split(key, 3)
    strength = jax.random.uniform(k1, (b, 1)) * cfg.white_strength
    noise = jax.random.normal(k2, (b, n)) * strength
    apply = _per_example_mask(k3, b, cfg.prob)[:, None]
    return jnp.where(apply, jnp.clip(audio + noise, -1.0, 1.0), audio)


def salt_pepper_noise(audio: jnp.ndarray, key: jax.Array, cfg: AugmentConfig) -> jnp.ndarray:
    """Random ±1 impulses (transform.py:188-196)."""
    b, n = audio.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    prob = jax.random.uniform(k1, (b, 1)) * cfg.salt_pepper_prob
    # one uniform draw yields both disjoint impulse sets (each marginally
    # bernoulli(p/2)); the reference drew them independently, which differs
    # only in the P(both)=p^2/4 ~ 2.5e-9 overlap — half the RNG bits
    u = jax.random.uniform(k2, (b, n))
    noise = (u < prob / 2.0).astype(audio.dtype) - (u > 1.0 - prob / 2.0).astype(audio.dtype)
    del k3
    apply = _per_example_mask(k4, b, cfg.prob)[:, None]
    return jnp.where(apply, jnp.clip(audio + noise, -1.0, 1.0), audio)


@jax.tree_util.register_pytree_node_class
class PreparedNoiseBank:
    """A noise bank pre-processed for ``mix_noise_bank``: the wrap-extended
    view plus (when the Pallas kernel applies) the tile-aligned flat view it
    DMAs from. Build ONCE per bank+window via ``prepare_noise_bank`` —
    deriving these inside every train-step execution costs ~166 MB of HBM
    traffic per step at the recipe (512, 32000) bank. A pytree (arrays as
    children, ints as static aux), so it passes through jit/vmap unchanged."""

    def __init__(self, extended, flat, bank_w: int, window: int, w_ext: int):
        self.extended = extended
        self.flat = flat
        self.bank_w = bank_w
        self.window = window
        self.w_ext = w_ext

    def tree_flatten(self):
        return (self.extended, self.flat), (self.bank_w, self.window, self.w_ext)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


# Minimum number of quantum-aligned window starts for quantized draws: banks
# offering fewer keep sample-exact starts (and the XLA gather) — quantizing a
# 1024..2047-sample bank would collapse its window diversity to 1-2 starts.
# Shape-based, so CPU and TPU draw identically for the same key. The flagship
# 0.5 s recipe's (N, 8000) train bank has exactly ceil(8000/1024) = 8 starts
# and stays on the Pallas kernel.
MIN_QUANTIZED_STARTS = 8


def _bank_quantized(bank_w: int) -> bool:
    from howl_tpu.ops.augment_pallas import NOISE_OFFSET_QUANTUM

    # ceil — must count exactly the starts the quantized draw below offers
    return -(-bank_w // NOISE_OFFSET_QUANTUM) >= MIN_QUANTIZED_STARTS


def prepare_noise_bank(
    noise_bank: jnp.ndarray, window_samples: int, for_pallas: bool = None
) -> PreparedNoiseBank:
    """Pre-derive the circular-window views of a (N, W) noise bank for windows
    of ``window_samples``: the wrap-extended bank (so every circular window is
    one contiguous slice) and — when the bank is wide enough for quantized
    draws (>= MIN_QUANTIZED_STARTS quanta) AND the Pallas kernel can actually
    run — the quantum-aligned flat view it DMAs from. ``for_pallas`` forces
    (True) or skips (False) the flat view; None auto-detects the same
    single-device-TPU condition ``mix_noise_bank`` uses, so a DP/CPU program
    never pays the flat view's extra HBM (it is ~2.5x the bank's size)."""
    from howl_tpu.ops.augment_pallas import flatten_bank

    noise_bank = jnp.asarray(noise_bank)
    n = window_samples
    bank_w = noise_bank.shape[1]
    if n > bank_w:  # tiny banks: keep extending until a slice fits
        reps = -(-n // bank_w)
        extended = jnp.concatenate([noise_bank] + [noise_bank] * reps, axis=1)[:, : bank_w + n]
    else:
        extended = jnp.concatenate([noise_bank, noise_bank[:, :n]], axis=1)
    if for_pallas is None:
        for_pallas = jax.devices()[0].platform == "tpu" and jax.device_count() == 1
    flat, w_ext = (None, 0)
    if for_pallas and _bank_quantized(bank_w):
        flat, w_ext = flatten_bank(extended, n)
    return PreparedNoiseBank(extended, flat, bank_w, n, w_ext)


def mix_noise_bank(
    audio: jnp.ndarray,
    key: jax.Array,
    noise_bank,
    cfg: AugmentConfig,
    replace_prob: float = 0.0,
    use_pallas: bool = None,
):
    """Background-noise mixing from a device-resident bank (transform.py:199-232).

    noise_bank: a (N, W) array of pre-cut noise clips in HBM, or a
    ``PreparedNoiseBank`` from ``prepare_noise_bank`` (preferred in hot loops —
    the raw-array form re-derives the windowing views inside every execution).
    Each example draws a random row + random circular offset;
    ``mixed = (1-a)*x + a*noise`` with a ~ U[0, mixer_strength]. With
    probability ``replace_prob`` the clip is fully replaced (a=1) — callers
    must then clear its labels (the sampler passes the replace mask back for
    that).

    For banks offering at least MIN_QUANTIZED_STARTS aligned starts (width
    > 7 x 1024 samples), window starts are quantized to NOISE_OFFSET_QUANTUM
    on EVERY backend —
    it's the Mosaic DMA alignment unit, and drawing identically everywhere
    keeps CPU and TPU bitwise-equal for the same key (a quantized bank still
    yields thousands of distinct windows; the reference's sample-exact starts
    carry no augmentation value). Narrower banks keep sample-exact starts
    (quantizing them would collapse diversity to a handful of windows) and
    always use the XLA gather. On TPU a quantized bank's gather+mix runs as
    one fused Pallas DMA kernel (ops/augment_pallas.py): 2.4 ms -> 0.72 ms at
    batch 1024 x 8000 from a (512, 32000) bank. ``use_pallas`` overrides the
    platform auto-detection (True + interpret is exercised by tests) and
    raises if the bank cannot take the kernel (too narrow for quantized
    starts).

    Returns (mixed_audio, replaced_mask).
    """
    from howl_tpu.ops.augment_pallas import NOISE_OFFSET_QUANTUM, flatten_bank, mix_noise_bank_pallas

    b, n = audio.shape
    if not isinstance(noise_bank, PreparedNoiseBank):
        noise_bank = prepare_noise_bank(noise_bank, n, for_pallas=use_pallas)
    if noise_bank.window != n:
        raise ValueError(
            f"noise bank was prepared for {noise_bank.window}-sample windows, got {n}"
        )
    bank_w, extended = noise_bank.bank_w, noise_bank.extended
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    rows = jax.random.randint(k1, (b,), 0, extended.shape[0])
    quantized = _bank_quantized(bank_w)
    if use_pallas and not quantized:
        raise ValueError(
            f"use_pallas=True requires a bank offering at least {MIN_QUANTIZED_STARTS} "
            f"quantized ({NOISE_OFFSET_QUANTUM}-sample-aligned) window starts; width "
            f"{bank_w} offers {-(-bank_w // NOISE_OFFSET_QUANTUM)} "
            "(use the XLA fallback for narrow banks)"
        )
    if quantized:
        # ceil: the last aligned start below bank_w is drawable (floor would
        # drop one start from banks that are not an exact quantum multiple)
        offs = jax.random.randint(k2, (b,), 0, -(-bank_w // NOISE_OFFSET_QUANTUM))
        offs = offs * NOISE_OFFSET_QUANTUM
    else:
        offs = jax.random.randint(k2, (b,), 0, bank_w)
    alpha = jax.random.uniform(k3, (b, 1)) * cfg.mixer_strength
    replaced = jax.random.bernoulli(k4, replace_prob, (b,))
    alpha = jnp.where(replaced[:, None], 1.0, alpha)
    apply = _per_example_mask(k5, b, cfg.prob)
    alpha = jnp.where(apply[:, None], alpha, 0.0)
    if use_pallas is None:
        # auto-select only for single-device programs: under the GSPMD DP
        # path (train.py --num-devices) a pallas_call is an unpartitionable
        # custom call — XLA would all-gather the sharded batch around it.
        # Sharded callers that run per-device (shard_map) can pass True.
        use_pallas = (
            quantized
            and noise_bank.flat is not None
            and jax.devices()[0].platform == "tpu"
            and jax.device_count() == 1
        )
    if use_pallas:
        flat, w_ext = noise_bank.flat, noise_bank.w_ext
        if flat is None:
            # prepared without the Pallas view (for_pallas=False/None off-TPU)
            # but the caller forced the kernel: derive it inline this once
            flat, w_ext = flatten_bank(extended, n)
        interpret = jax.devices()[0].platform != "tpu"  # CPU tests run interpreted
        mixed = mix_noise_bank_pallas(audio, flat, w_ext, rows, offs, alpha, interpret=interpret)
    else:
        # circular window = contiguous slice of the wrap-extended bank; one
        # (row, offset) pair per example (slices of shape (1, n)) instead of
        # per-element modular take_along_axis indices (~11 ms -> ~0.1 ms for
        # (128, 8000) on v5e)
        noise = jax.vmap(lambda r, s: jax.lax.dynamic_slice(extended, (r, s), (1, n))[0])(rows, offs)
        mixed = audio * (1.0 - alpha) + noise * alpha
    return mixed, replaced & apply


def spec_augment(feats: jnp.ndarray, key: jax.Array, cfg: AugmentConfig) -> jnp.ndarray:
    """Time + frequency masking on (B, C, F, T) features (transform.py:299-339)."""
    b, _, f, t = feats.shape
    kt1, kt2, kf1, kf2, kp1, kp2 = jax.random.split(key, 6)
    # time mask; draws that don't fit the window are SKIPPED like the
    # reference (transform.py tmask catches randrange's ValueError when
    # t_len >= T and applies nothing) — clamping them to t-1 would silence
    # ~15% of default-config windows (sa_time=75 vs 61 frames) per step
    t_len = jax.random.randint(kt1, (b,), 0, max(cfg.sa_time, 1))
    t_len = jnp.where(t_len >= t, 0, t_len)
    t_start = (jax.random.uniform(kt2, (b,)) * (t - t_len)).astype(jnp.int32)
    t_idx = jnp.arange(t)[None, :]
    t_mask = (t_idx >= t_start[:, None]) & (t_idx < (t_start + t_len)[:, None])
    apply_t = jax.random.bernoulli(kp1, cfg.prob, (b,))
    t_mask = t_mask & apply_t[:, None]
    feats = feats * ~t_mask[:, None, None, :]
    # frequency mask (same skip-if-too-long semantics)
    f_len = jax.random.randint(kf1, (b,), 0, max(cfg.sa_freq, 1))
    f_len = jnp.where(f_len >= f, 0, f_len)
    f_start = (jax.random.uniform(kf2, (b,)) * (f - f_len)).astype(jnp.int32)
    f_idx = jnp.arange(f)[None, :]
    f_mask = (f_idx >= f_start[:, None]) & (f_idx < (f_start + f_len)[:, None])
    apply_f = jax.random.bernoulli(kp2, cfg.prob, (b,))
    f_mask = f_mask & apply_f[:, None]
    feats = feats * ~f_mask[:, None, :, None]
    return feats


def augment_audio(
    audio: jnp.ndarray,
    key: jax.Array,
    cfg: AugmentConfig,
    noise_bank: jnp.ndarray = None,
    replace_prob: float = 0.0,
):
    """Full waveform augmentation chain (mixer? -> timeshift -> noise);
    order matches the reference collate composition (train.py:202-227).

    Returns (audio, replaced_mask) — replaced examples must flip to negative.
    """
    b = audio.shape[0]
    k_mix, k_shift, k_white, k_sp, k_pick = jax.random.split(key, 5)
    replaced = jnp.zeros((b,), bool)
    if noise_bank is not None:
        audio, replaced = mix_noise_bank(audio, k_mix, noise_bank, cfg, replace_prob)
    audio = timeshift(audio, k_shift, cfg)
    # reference NoiseTransform applies white OR salt-pepper sequentially, each
    # with its own prob; same here
    audio = white_noise(audio, k_white, cfg)
    audio = salt_pepper_noise(audio, k_sp, cfg)
    del k_pick
    return audio, replaced
