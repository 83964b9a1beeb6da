"""Test configuration: run everything on a virtual 8-device CPU mesh.

Note: this host pins JAX_PLATFORMS=axon in the environment and the plugin
wins over env-var overrides, so we must force the platform through
jax.config *before* any backend is initialized.

A persistent XLA compilation cache (shared across pytest processes and
runs) makes the slow tier's full-detector compiles near-instant on a warm
machine — the same LOGS.COMPILATION_CACHE_DIR mechanism production CLIs
use (config/finalize.py), pointed at a test-local directory so cache
entries from CPU test shapes never mix with the TPU serving cache.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

_cache = os.path.expanduser("~/.cache/detectron2_tensorflow_tpu/xla-tests")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # CPU caching is off by default (only the per-process in-memory cache);
    # these two knobs extend the persistent cache to the CPU backend.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except (OSError, AttributeError, ValueError):  # read-only FS / older jax / unknown value
    pass
