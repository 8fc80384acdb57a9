"""howl_tpu: a TPU-native wake-word detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of castorini/howl
(reference layer map in SURVEY.md): corpus mining, forced-alignment attachment,
synthetic wakeword stitching, streaming classifier training (res8 / LSTM / LAS /
MobileNet-style CNNs) on log-Mel windows with on-device augmentation, batched
sliding-window streaming inference with posterior smoothing and a vectorized
finite-state sequence matcher, threshold-sweep evaluation, and a live client.

Design tenets (TPU-first, not a port):
  * every hot numeric path is jitted, batched, static-shape JAX;
  * the audio frontend (framing -> DFT-as-GEMM -> mel GEMM -> log -> ZMUV) is a
    single fused Pallas kernel riding the MXU, with a pure-jnp reference;
  * streaming inference is one `lax.scan` over stride windows scoring thousands
    of streams concurrently (the reference evaluates clip-by-clip in Python);
  * scaling is expressed as `jax.sharding.Mesh` axes (`data` for batch DP,
    `seed` for the N-model experiment sweep) instead of process job-farming.
"""

__version__ = "0.1.0"

import os as _os
from pathlib import Path as _Path


def root_path() -> _Path:
    """Repo root (parent of the package; ref howl/__init__.py:5-10)."""
    return _Path(_os.path.dirname(_os.path.realpath(__file__))).parent


def datasets_path() -> _Path:
    return root_path() / "datasets"


def workspaces_path() -> _Path:
    return root_path() / "workspaces"
