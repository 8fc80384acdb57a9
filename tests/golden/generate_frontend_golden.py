"""Generate golden log-mel fixtures with torchaudio-exact semantics.

The reference frontend is torchaudio.transforms.MelSpectrogram(n_fft=512,
hop_length=200, n_mels) -> +1e-7 -> log -> ComputeDeltas stacked
(ref howl/data/transform/transform.py:249-280). torchaudio is not installed in
this container, but its MelSpectrogram is by construction:

  Spectrogram = |torch.stft(x, n_fft, hop, win=hann periodic, center=True,
                            pad_mode="reflect", onesided=True)|^2
  MelScale    = spec^T @ melscale_fbanks(n_freqs, 0, sr/2, n_mels, sr,
                                         norm=None, mel_scale="htk")

both of which are reproduced here with plain torch + the documented HTK
filterbank algebra (torchaudio/functional/functional.py melscale_fbanks).
ComputeDeltas(win_length=5) is the replicate-padded regression filter.

Provenance / residual risk: torchaudio itself is not installed, so these
goldens pin (a) torch.stft — torchaudio's actual Spectrogram backend, exact —
and (b) a RE-DERIVED melscale algebra. (b) is differentially pinned against
the reference's own in-repo copy of the same construction,
create_vtlp_fb_matrix(training=False) at ref transform.py:373-410 (the
torchaudio MelScale filterbank algorithm the VTLP path uses), in
tests/test_golden_fixtures.py::test_generator_melscale_matches_reference_algebra.
What remains UNPINNED is only torchaudio's ComputeDeltas (replicate-padded
regression filter per its documented formula) and any hypothetical divergence
between create_vtlp_fb_matrix and a future torchaudio release; regenerate
against real torchaudio offline if bit-provenance is ever required.

Run from the repo root to (re)generate tests/golden/*.npy:

    python tests/golden/generate_frontend_golden.py

The fixtures are committed; tests never run torch on the hot path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import torch

HERE = Path(__file__).resolve().parent
SR = 16000
N_FFT = 512
HOP = 200


def make_inputs() -> np.ndarray:
    """Three deterministic 1 s signals: tone mix, linear chirp, filtered noise."""
    rng = np.random.default_rng(1234)
    t = np.arange(SR) / SR
    tones = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1330 * t + 0.7)
    chirp = 0.4 * np.sin(2 * np.pi * (200 * t + 0.5 * (3800 - 200) * t * t))
    noise = rng.standard_normal(SR)
    noise = np.convolve(noise, np.ones(8) / 8.0, mode="same") * 0.25
    return np.stack([tones, chirp, noise]).astype(np.float32)


def htk_mel_fbanks(n_freqs: int, n_mels: int, sr: int) -> torch.Tensor:
    """melscale_fbanks(norm=None, mel_scale="htk") per torchaudio's algorithm."""
    all_freqs = torch.linspace(0, sr // 2, n_freqs, dtype=torch.float64)
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
    m_pts = torch.linspace(hz2mel(0.0), hz2mel(sr / 2.0), n_mels + 2, dtype=torch.float64)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return torch.clamp(torch.min(down, up), min=0.0)


def log_mel(audio: np.ndarray, n_mels: int) -> np.ndarray:
    """(B, samples) -> (B, n_mels, frames) float64 log-mel, torchaudio-exact."""
    x = torch.from_numpy(audio).to(torch.float64)
    window = torch.hann_window(N_FFT, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        x,
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=N_FFT,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    power = spec.abs() ** 2  # (B, n_freqs, T)
    fb = htk_mel_fbanks(N_FFT // 2 + 1, n_mels, SR)  # (n_freqs, n_mels)
    mel = torch.einsum("bft,fm->bmt", power, fb)
    return torch.log(mel + 1e-7).numpy()


def compute_deltas(x: np.ndarray, win_length: int = 5) -> np.ndarray:
    """torchaudio ComputeDeltas: replicate pad, d_t = sum n*(x[t+n]-x[t-n]) / (2*sum n^2)."""
    t = torch.from_numpy(x)
    n = (win_length - 1) // 2
    denom = 2.0 * sum(i * i for i in range(1, n + 1))
    padded = torch.nn.functional.pad(t, (n, n), mode="replicate")
    out = torch.zeros_like(t)
    for i in range(1, n + 1):
        out += i * (padded[..., n + i : n + i + t.shape[-1]] - padded[..., n - i : n - i + t.shape[-1]])
    return (out / denom).numpy()


def main():
    audio = make_inputs()
    np.save(HERE / "frontend_input.npy", audio)
    for n_mels in (40, 80):
        mels = log_mel(audio, n_mels)
        np.save(HERE / f"frontend_logmel_{n_mels}.npy", mels.astype(np.float32))
    mels40 = log_mel(audio, 40).astype(np.float32)
    deltas = compute_deltas(mels40)
    accels = compute_deltas(deltas)
    np.save(HERE / "frontend_stacked_40.npy", np.stack([mels40, deltas, accels], axis=1))
    print("wrote goldens:", sorted(p.name for p in HERE.glob("*.npy")))


if __name__ == "__main__":
    main()
