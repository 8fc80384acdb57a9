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
        return
    import jax

    try:
        current = jax.config.jax_platforms
    except AttributeError:
        current = None
    if current != env:
        jax.config.update("jax_platforms", env)
