import os

# Force a deterministic 8-device CPU mesh for all tests: the standard JAX
# recipe for testing a v5e-8 mesh without hardware. The ambient environment
# may pin an experimental TPU platform programmatically (sitecustomize), so we
# override via jax.config, not just env vars, before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
