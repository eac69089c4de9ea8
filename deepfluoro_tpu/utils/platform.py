"""Platform selection helper.

The reference picks cuda -> mps -> cpu with a --no-gpu override
(util.py:17-36). In JAX the backend is global; this helper implements the
--no-gpu contract and restores standard JAX_PLATFORMS env-var behavior even
in environments whose sitecustomize pre-imports jax (which freezes the
config default before user code runs).
"""

from __future__ import annotations

import os


def select_platform(no_gpu: bool = False) -> None:
    """Call before any jax computation. no_gpu forces the CPU backend."""
    import jax

    if no_gpu:
        jax.config.update("jax_platforms", "cpu")
        return
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass  # backends already initialized; keep whatever is active
