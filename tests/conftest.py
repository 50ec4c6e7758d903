"""Test harness config: run everything on 8 virtual CPU devices.

This is the JAX-native way to exercise the multi-chip sharding path without
TPU hardware (SURVEY.md §4): XLA's host platform is forced to expose 8
devices, and sharded train-step tests build a real `jax.sharding.Mesh` over
them.

Note: this environment's sitecustomize registers an 'axon' TPU platform and
forces `jax_platforms` at interpreter startup, so the env var alone is not
enough — we override the config value before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: repeated suite runs on this 1-core box should
# not pay XLA CPU compiles again (same cache the multi-chip dry run uses).
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
