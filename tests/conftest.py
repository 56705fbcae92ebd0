"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-substitute test strategy the reference lacks entirely
(SURVEY.md §4): kernels and sharding validate against numpy oracles on
CPU; the real chip is only needed for benchmarks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
