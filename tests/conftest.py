"""Test harness: run everything on CPU with 8 virtual devices.

This is the TPU analog of the reference's `trainer=ddp_sim` CPU-DDP
simulation (kod/configs/trainer/ddp_sim.yaml) — sharding/collective tests
execute on a virtual 8-device mesh (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin in this image overrides JAX_PLATFORMS at import time;
# jax.config.update takes precedence again. Must run before backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache across test sessions: jit compiles dominate the
# fast tier on this 1-core host (same programs recompile every run without
# it). CPU-backend executables are cacheable since jax 0.4.30+.
_cache = os.environ.get("JAX_TEST_COMPILATION_CACHE", "/root/.jax_test_cache")
if _cache and _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    # keep Trainer._select_platform's compile-cache default from clobbering
    # the test cache dir (it defers to this env var)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # default policy refuses to cache on single-process CPU; override
    jax.config.update(
        "jax_persistent_cache_enable_xla_caches", "all"
    )
