"""Platform selection glue.

Some deployment environments register an out-of-tree TPU PJRT plugin from
``sitecustomize`` and pin ``jax_platforms`` through jax.config — which silently
overrides the user's ``JAX_PLATFORMS`` environment variable. Entry points call
``ensure_platform()`` before first device use so the env var wins again.
"""

from __future__ import annotations

import os


def ensure_platform():
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        # no explicit env override: honor SETTINGS.training.device (the
        # reference's device knob, ref howl/settings.py:58 — there a torch
        # device string, here a jax platform preference). The default "tpu"
        # leaves whatever the deployment's sitecustomize registered; "cpu"
        # forces host execution (e.g. DEVICE=cpu for ETL-only runs).
        from howl_tpu.settings import SETTINGS

        device = SETTINGS.training.device
        if device and device.lower() in ("cpu",):
            env = "cpu"
        else:
            return
    import jax

    try:
        current = jax.config.jax_platforms
    except AttributeError:
        current = None
    if current != env:
        jax.config.update("jax_platforms", env)
