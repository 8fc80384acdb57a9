"""Log-mel audio frontend, pure-JAX reference implementation.

Capability parity with the reference's torchaudio pipeline
(ref: howl/data/transform/transform.py:234-296 — MelSpectrogram(n_fft=512,
hop=200, power=2, HTK mel, no norm, center/reflect, periodic Hann) -> +1e-7 ->
log -> ComputeDeltas stacked as (log-mels, deltas, accels) channels), but built
TPU-first:

  * framing is a static gather; the DFT is expressed as two real GEMMs
    (frames @ cos, frames @ sin) which XLA maps straight onto the MXU — for
    512-point transforms this beats an FFT butterfly on TPU and fuses with the
    downstream mel GEMM;
  * the mel projection is a single (n_freqs, n_mels) matmul;
  * everything is shape-static and jit/vmap/grad-safe.

A fused single-pass Pallas kernel lives in frontend_pallas.py; this module is
the correctness oracle for it.

VTLP (vocal tract length perturbation) builds a warped filterbank with the same
breakpoint algebra as the reference (transform.py:373-449) and is traceable in
the warp factor so a fresh random alpha per training batch stays inside jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    """HTK mel scale (torchaudio MelSpectrogram default)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: int, f_min: float = 0.0, f_max: float = None
) -> np.ndarray:
    """Triangular HTK-mel filterbank, shape (n_freqs, n_mels), no normalization."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up)).astype(np.float32)


def vtlp_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    alpha,
    f_min: float = 0.0,
    f_max: float = None,
    f_hi: float = 4800.0,
):
    """VTLP-warped filterbank; traceable in ``alpha`` (ref: transform.py:373-414).

    Mel breakpoints below the crossover scale by alpha; above, they compress
    linearly so the Nyquist endpoint is preserved.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    S = sample_rate
    all_freqs = jnp.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = jnp.linspace(float(hz_to_mel(f_min)), float(hz_to_mel(f_max)), n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    alpha = jnp.asarray(alpha, jnp.float32)
    cutoff = f_hi * jnp.minimum(alpha, 1.0) / alpha
    low = f_pts * alpha
    denom = S / 2.0 - f_hi * jnp.minimum(alpha, 1.0) / alpha
    high = S / 2.0 - ((S / 2.0 - f_hi * jnp.minimum(alpha, 1.0)) / denom) * (S / 2.0 - f_pts)
    f_pts = jnp.where(f_pts <= cutoff, low, high)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return jnp.maximum(0.0, jnp.minimum(down, up)).astype(jnp.float32)


def _hann_window(n: int) -> np.ndarray:
    """Periodic Hann (torch.hann_window default)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis: (n_fft, n_freqs) cosine and sine matrices.

    ``|rfft(x)|^2 == (x @ C)^2 + (x @ S)^2`` — two MXU GEMMs instead of an FFT.
    """
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None] * np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * t / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def nyquist_crop_bins(config: "FrontendConfig") -> int:
    """Number of DFT bins the mel projection actually reads.

    For even ``n_fft`` the top mel triangle ends exactly at the Nyquist
    frequency, so the Nyquist bin's filterbank weight is identically zero
    (up-slope hits its endpoint; `mel_filterbank` clamps to 0) and bin
    ``n_fft // 2`` can be dropped from the DFT. That makes the combined
    [cos|sin] windowed-DFT matrix square — (512, 512) at the default
    geometry: exact 128-lane MXU tiles with no padding waste, where the
    separate 257-bin matrices each padded 257 -> 384 lanes (1.5x dead MXU
    work). Verified against the full-width oracle (incl. VTLP warps) in
    tests/test_frontend.py.

    The zero-weight argument only holds when the top triangle ends at or
    below Nyquist; an f_max above Nyquist would silently drop real spectral
    energy, so fall back to the full bin count there.
    """
    if config.f_max is not None and config.f_max > config.sample_rate / 2:
        return config.n_freqs
    return config.n_fft // 2 if config.n_fft % 2 == 0 else config.n_freqs


def windowed_dft_matrix(n_fft: int, n_bins: int) -> np.ndarray:
    """Combined windowed real-DFT basis, shape (n_fft, 2*n_bins).

    Columns are [cos | -sin] pre-multiplied by the periodic Hann window
    (built in float64, cast once), so ``frames @ W`` yields [re | im] of the
    windowed rfft in ONE GEMM — the separate window multiply over the
    2.56x-expanded frames tensor disappears entirely.
    """
    t = np.arange(n_fft, dtype=np.float64)[:, None] * np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * t / n_fft
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft, dtype=np.float64) / n_fft)
    m = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1) * win[:, None]
    return np.ascontiguousarray(m).astype(np.float32)


@dataclass(frozen=True)
class FrontendConfig:
    """Geometry of the log-mel frontend; defaults mirror SETTINGS.audio_transform."""

    sample_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 200
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float = None
    center: bool = True
    log_offset: float = 1e-7

    @classmethod
    def from_settings(cls) -> "FrontendConfig":
        from howl_tpu.settings import SETTINGS

        s = SETTINGS.audio_transform
        # use_meyda_spectrogram switches the transform to the browser
        # (Meyda.js / honkling) convention: HTK mel with a FIXED f_max of
        # 8 kHz instead of Nyquist (ref transform.py:241-247, meyda.py:15).
        # At 16 kHz those coincide; the flag still pins the browser basis at
        # any other rate. Device parity vs the host MeydaMelSpectrogram is
        # asserted in tests/test_config_and_exports.py.
        f_max = 8000.0 if s.use_meyda_spectrogram else None
        return cls(
            sample_rate=s.sample_rate, n_fft=s.num_fft, hop_length=s.hop_length, n_mels=s.num_mels,
            f_max=f_max,
        )

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        if self.center:
            return num_samples // self.hop_length + 1
        return max((num_samples - self.n_fft) // self.hop_length + 1, 0)

    def compute_lengths(self, lengths):
        """Frame-length formula used by sequential models for packing
        (parity with ref transform.py:291: ``(len - win) // hop + 1``)."""
        return (jnp.asarray(lengths) - self.n_fft) // self.hop_length + 1


def frame_signal(audio: jnp.ndarray, config: FrontendConfig) -> jnp.ndarray:
    """(..., samples) -> (..., frames, n_fft) with optional center reflect-pad.

    Framing is expressed as reshape + overlapping row slices + concat instead
    of an index gather: frame i = rows i..i+k of the (rows, hop) view plus a
    remainder slice. XLA lowers slices/concats as contiguous copies — on TPU
    this is ~50x faster than the element-wise gather lowering of
    ``audio[..., idx]``.
    """
    hop, n_fft = config.hop_length, config.n_fft
    if config.center:
        pad = n_fft // 2
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = (audio.shape[-1] - n_fft) // hop + 1
    k_full = n_fft // hop
    rem = n_fft - k_full * hop
    rows_needed = n_frames + k_full + (1 if rem else 0)
    total = rows_needed * hop
    if audio.shape[-1] < total:
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, total - audio.shape[-1])])
    view = audio[..., :total].reshape(*audio.shape[:-1], rows_needed, hop)
    pieces = [view[..., j : j + n_frames, :] for j in range(k_full)]
    if rem:
        pieces.append(view[..., k_full : k_full + n_frames, :rem])
    return jnp.concatenate(pieces, axis=-1)


@partial(jax.jit, static_argnames=("config", "stacked", "precision"))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    config: FrontendConfig = FrontendConfig(),
    stacked: bool = False,
    precision=None,
):
    """(B, samples) float32 -> (B, n_mels, frames) log-mel spectrogram.

    ``stacked=True`` additionally returns delta/accel channels as
    (B, 3, n_mels, frames) matching the reference feature layout.

    ``precision`` sets the DFT GEMM matmul precision (default HIGHEST — exact
    oracle). Serving engines pass ``jax.lax.Precision.HIGH``: measured on v5e
    it is ~1.2x faster end-to-end with 2.2e-4 above-floor log-mel error vs
    HIGHEST (same grade as HIGHEST's own error vs the torchaudio goldens).
    ``"bf16"`` is the 1-pass mode (DFT + mel GEMMs with bf16 operands, f32
    accumulation — ~7.5e-2 log-mel max error, the grade the engines' bf16
    feature cast already accepts); validate decision equivalence per model
    before serving with it (tools/validate_tpu_decisions.py).
    """
    fb = jnp.asarray(mel_filterbank(config.n_freqs, config.n_mels, config.sample_rate, config.f_min, config.f_max))
    out = _mel_core(audio, fb, config, precision=precision)
    return stack_deltas(out) if stacked else out


def log_mel_spectrogram_vtlp(
    audio: jnp.ndarray,
    alpha,
    config: FrontendConfig = FrontendConfig(),
    stacked: bool = False,
    precision=None,
):
    """VTLP-augmented variant; ``alpha`` may be a traced scalar."""
    fb = vtlp_filterbank(config.n_freqs, config.n_mels, config.sample_rate, alpha, config.f_min, config.f_max)
    out = _mel_core(audio, fb, config, precision=precision)
    return stack_deltas(out) if stacked else out


def _mel_core(audio: jnp.ndarray, fb: jnp.ndarray, config: FrontendConfig, precision=None) -> jnp.ndarray:
    # "bf16" mode casts BEFORE framing: frame_signal materializes the
    # 2.56x-expanded frames tensor (the chain's dominant HBM traffic), and
    # the cast commutes exactly with its pad/reshape/concat — so the frames
    # materialize at half the bytes with bit-identical GEMM inputs (same
    # trick as the Pallas kernel's pre-pad cast, frontend_pallas.py)
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    frames = frame_signal(audio.astype(dt), config)  # (B, T, n_fft)
    # Two windowed+cropped DFT GEMMs: Hann folded into the matrices (no
    # separate window pass over the 2.56x-expanded frames) and the Nyquist bin
    # cropped — its mel weight is identically zero, see nyquist_crop_bins.
    # Measured on v5e (tools/bench_frontend_variants.py): this 3D-batched
    # two-matrix form beats both the single combined (n_fft, 2*n_bins) GEMM
    # and a flattened-2D form; the chain is HBM-bound, so folding the window
    # pass is worth more than GEMM-shape games.
    n_bins = nyquist_crop_bins(config)
    w = jnp.asarray(windowed_dft_matrix(config.n_fft, n_bins))
    cw, sw = w[:, :n_bins], w[:, n_bins:]
    if precision == "bf16":
        # 1-pass bf16 mode, the jnp twin of frontend_pallas.py's
        # precision="bf16": both GEMM operands quantized to bf16 (explicit
        # casts so CPU tests see the same numerics), f32 accumulation. The
        # ~2^-9 relative DFT error (~7.5e-2 log-mel max) sits below the
        # serving engines' bf16 feature-cast noise — decision equivalence is
        # validated on hardware per model (tools/validate_tpu_decisions.py).
        # The mel GEMM is 1-pass bf16 too: the all-positive contraction has
        # no cancellation, keeping its relative error at the same grade.
        kw = dict(preferred_element_type=jnp.float32)
        re = jnp.matmul(frames, cw.astype(jnp.bfloat16), **kw)
        im = jnp.matmul(frames, sw.astype(jnp.bfloat16), **kw)
        power = re * re + im * im
        mel = jnp.matmul(power.astype(jnp.bfloat16), fb[:n_bins].astype(jnp.bfloat16), **kw)
        return jnp.log(mel + config.log_offset).swapaxes(-1, -2)
    # HIGHEST precision default: the log compresses dynamic range, so 1-pass
    # bf16 MXU GEMMs (the TPU f32-matmul default) would leak visible error into
    # the features unless the engine's decision logic is known to absorb it
    # (that is what the "bf16" mode above is for). Serving engines default to
    # HIGH (3-pass) — see log_mel_spectrogram.
    prec = jax.lax.Precision.HIGHEST if precision is None else precision
    re = jnp.matmul(frames, cw, precision=prec)  # (B, T, n_bins) — MXU GEMM
    im = jnp.matmul(frames, sw, precision=prec)
    power = re * re + im * im
    # mel GEMM stays HIGHEST: ~1/16 of the DFT MACs, read directly by the log
    mel = jnp.matmul(power, fb[:n_bins], precision=jax.lax.Precision.HIGHEST)  # (B, T, n_mels)
    return jnp.log(mel + config.log_offset).swapaxes(-1, -2)  # (B, n_mels, T)


def compute_deltas(x: jnp.ndarray, win_length: int = 5) -> jnp.ndarray:
    """Regression deltas over the time axis (torchaudio ComputeDeltas semantics:
    replicate-pad, window N=(win-1)//2, denominator 2*sum(n^2))."""
    n = (win_length - 1) // 2
    denom = 2.0 * sum(i * i for i in range(1, n + 1))
    padded = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(n, n)], mode="edge")
    out = jnp.zeros_like(x)
    for i in range(1, n + 1):
        right = jax.lax.slice_in_dim(padded, n + i, n + i + x.shape[-1], axis=-1)
        left = jax.lax.slice_in_dim(padded, n - i, n - i + x.shape[-1], axis=-1)
        out = out + i * (right - left)
    return out / denom


def stack_deltas(log_mels: jnp.ndarray) -> jnp.ndarray:
    """(B, n_mels, T) -> (B, 3, n_mels, T): log-mels, deltas, accels."""
    deltas = compute_deltas(log_mels)
    accels = compute_deltas(deltas)
    return jnp.stack((log_mels, deltas, accels), axis=1)
