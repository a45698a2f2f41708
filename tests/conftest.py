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
