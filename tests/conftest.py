"""Test harness: force the CPU backend with 8 virtual devices so mesh /
shard_map logic is exercised without a TPU pod (standard JAX practice; the
axon TPU plugin is disabled by clearing PALLAS_AXON_POOL_IPS before jax
imports)."""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin registers itself in sitecustomize at interpreter start
# (before this file runs), so the env vars alone are not enough -- pin the
# platform explicitly too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
