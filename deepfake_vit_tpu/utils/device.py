"""Device helpers (reference ``src/utils/io_utils.py:279-304`` analog)."""

from __future__ import annotations

from typing import Optional

import jax


def get_device(prefer: Optional[str] = None) -> jax.Device:
    """Return the first device of the preferred platform, else default.

    ``prefer`` ∈ {"tpu", "cpu", "gpu", None}. Mirrors the reference's
    cuda-availability fallback: unknown/unavailable platform → default
    backend's first device.
    """
    if prefer:
        try:
            return jax.devices(prefer)[0]
        except RuntimeError:
            pass
    return jax.devices()[0]


def enable_compilation_cache(path: str = "/root/.jax_cache") -> None:
    """Persistent XLA compilation cache — first compile per program shape is
    paid once per machine, not once per process (the TPU tunnel makes cold
    compiles expensive)."""
    import os

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def device_summary() -> dict:
    devs = jax.devices()
    return {
        "platform": devs[0].platform,
        "num_devices": len(devs),
        "num_processes": jax.process_count(),
        "devices": [str(d) for d in devs],
    }
