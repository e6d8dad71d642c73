"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (SURVEY.md §4.4: the
JAX-native 'fake backend' for exercising shard_map halo exchange and
agglomeration without a pod), keeping CI deterministic and fast; the real
TPU path is exercised by bench.py and __graft_entry__.py.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize force-registers the TPU tunnel backend and
# overrides jax_platforms to "axon,cpu"; pin it back so tests run on the
# 8-virtual-device CPU backend regardless.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: first-op eager compiles cost ~1s each on this
# CPU backend; caching makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sparsh_amg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
