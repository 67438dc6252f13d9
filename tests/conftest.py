"""Test configuration: force CPU backend with 8 virtual devices so tests run
fast locally and multi-chip sharding tests run anywhere (SURVEY.md §4:
multi-host tests via xla_force_host_platform_device_count).

The axon TPU plugin (sitecustomize) pins jax_platforms to the tunneled TPU;
tests must override it AFTER import, hence jax.config.update rather than
env vars.
"""

import os

# GEM_TPU_TESTS=1 leaves the backend on the real chip for the @pytest.mark.tpu
# subset: `GEM_TPU_TESTS=1 python -m pytest tests -m tpu` (see
# tests/test_tpu_subset.py).  Default: force CPU with 8 virtual devices.
_TPU_MODE = os.environ.get("GEM_TPU_TESTS") == "1"

if not _TPU_MODE:
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent compile cache: repeat test runs skip XLA compilation (the same
# cache the executor uses on TPU — SURVEY.md §5.4 kernel-cache analog).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
