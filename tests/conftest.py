"""Test configuration: force an 8-device CPU mesh before any JAX backend use.

The environment's axon TPU plugin overrides ``JAX_PLATFORMS`` at import time,
so we must re-pin the platform via ``jax.config.update`` here (conftest runs
before test modules import).  Multi-chip sharding logic is tested on 8
virtual CPU devices, per SURVEY.md §4.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
