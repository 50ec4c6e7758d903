"""Persistent XLA compile cache for the TPU tools.

Remote ('axon'-tunneled) TPU compiles of the full generator / train step
cost ~10-15 minutes each; JAX's persistent compilation cache works through
the tunnel (measured: a repeat jit drops from the full remote compile to
~20 ms executable reload), so every CLI that jits a big program calls
`enable_persistent_compile_cache()` first. Same mechanism the multi-chip
dry run (__graft_entry__.py) and the test suite (tests/conftest.py) already
use, shared here for the serving/benchmark/evidence tools.

Keys include the HLO + compile options, so kernel or flag changes miss the
cache naturally; no staleness risk.
"""

import os


def enable_persistent_compile_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a repo-local directory.

    Must run before the first backend use in the process. Returns the
    cache directory. Honors an explicit JAX_COMPILATION_CACHE_DIR.
    """
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
