"""Platform selection helper.

The reference picks cuda -> mps -> cpu with a --no-gpu override
(util.py:17-36). In JAX the backend is global; this helper implements the
--no-gpu contract and restores standard JAX_PLATFORMS env-var behavior even
in environments whose sitecustomize pre-imports jax (which freezes the
config default before user code runs).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (first compiles of the
    depth-6 programs are expensive, especially over remote-device tunnels)."""
    import jax

    if path is None:
        path = os.environ.get(
            "DFT_COMPILE_CACHE",
            os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "deepfluoro_tpu_xla",
            ),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


def _pin_backend(platform: str) -> None:
    """Eagerly initialize ONLY the named backend. A lazy first backend touch
    (jax.process_count() etc.) goes through get_backend(None), which some
    plugin shims (the axon remote-TPU register) route into initializing
    their own platform FIRST — dialing a dead tunnel hangs the process
    indefinitely even though the user asked for cpu. An explicit-platform
    devices() call initializes just that backend and pins it as default."""
    import jax

    try:
        jax.devices(platform)
    except Exception:
        pass  # unknown platform name etc.; fall back to lazy init


def select_platform(no_gpu: bool = False) -> None:
    """Call before any jax computation. no_gpu forces the CPU backend."""
    import jax

    if no_gpu:
        jax.config.update("jax_platforms", "cpu")
        _pin_backend("cpu")
        return
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass  # backends already initialized; keep whatever is active
        else:
            first = env.split(",")[0].strip()
            if first:
                _pin_backend(first)
