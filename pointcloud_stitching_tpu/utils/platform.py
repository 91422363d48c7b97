"""Backend selection helper.

This container's sitecustomize force-registers the axon TPU plugin and pins
JAX_PLATFORMS=axon *before* user code runs, so the usual env-var contract is
broken: exporting JAX_PLATFORMS=cpu has no effect by itself. CLIs call
apply_platform_override() early to restore the expected behaviour (needed
e.g. to run host-side tools on CPU while a benchmark owns the single TPU).
"""
from __future__ import annotations

import os


def apply_platform_override() -> str | None:
    """Honour PCS_PLATFORM (or a non-axon JAX_PLATFORMS) via jax.config."""
    want = os.environ.get("PCS_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        import jax
        jax.config.update("jax_platforms", want)
        return want
    return None
