"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must run before jax initialises its backends.  This environment's axon TPU
plugin registers itself from sitecustomize whenever PALLAS_AXON_POOL_IPS is
set and overrides backend selection — clear it so JAX_PLATFORMS=cpu sticks.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable axon TPU plugin registration
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon plugin may already be registered from sitecustomize (it runs at
# interpreter start); the config update overrides platform selection anyway
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
