import os

# Tests run on a virtual 8-device CPU mesh. The axon TPU plugin overrides
# JAX_PLATFORMS from the environment, so force the platform via jax.config
# too (remote-TPU compiles take minutes; CPU compiles take seconds).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
