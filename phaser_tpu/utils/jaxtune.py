"""JAX runtime tuning for the engine's device paths.

`enable_compile_cache()` turns on JAX's persistent compilation cache so the
fused assign+compact programs (first compile 20-40 s on TPU) are reused
across CLI invocations — the GTEx-scale use case runs thousands of samples
with identical program shapes. Cache location: $PHASER_TPU_JIT_CACHE, else
~/.cache/phaser_tpu/jit. No-op if the running JAX lacks the config knobs.
"""

from __future__ import annotations

import os

_done = False


def enable_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    path = os.environ.get("PHASER_TPU_JIT_CACHE")
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "phaser_tpu", "jit")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # 0.0: also persist the many small programs (collective allgathers,
        # shape-bucketed helpers) — each costs 50-200 ms to compile and the
        # multi-process engine pays that per process otherwise
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
