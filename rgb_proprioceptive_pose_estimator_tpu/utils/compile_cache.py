"""Persistent XLA compilation cache (train.compile_cache_dir).

TPU compiles of the full train step take 20-40 s cold; a preempted-and-
resumed run (train.save_on_signal) or a restarted serving process pays it
again for an identical program. JAX's persistent compilation cache keys
compiled executables by (HLO, compile options, backend version) and reuses
them across processes -- this module is the one switch that turns it on.

Process-global and idempotent: JAX exposes the cache as global config, so
the first enable() wins and later calls with a DIFFERENT directory raise
rather than silently retargeting half a process's compiles.
"""

from __future__ import annotations

import jax

_enabled_dir: str | None = None


def enable_compile_cache(directory: str) -> None:
    """Point JAX's persistent compilation cache at `directory` (created on
    first write). Entry-size/compile-time thresholds are zeroed: this
    workload has exactly a handful of programs (train/eval/predict steps)
    and wants all of them cached, including the small CPU-test ones."""
    global _enabled_dir
    if not directory:
        return
    if _enabled_dir is not None:
        if _enabled_dir != directory:
            raise ValueError(
                "train.compile_cache_dir: the JAX compilation cache is "
                f"process-global and already set to {_enabled_dir!r}; "
                f"cannot retarget it to {directory!r} in the same process")
        return
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = directory
