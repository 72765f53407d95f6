import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is exercised by
# bench.py.  The container's sitecustomize registers the axon TPU backend
# and forces jax_platforms via config (which overrides JAX_PLATFORMS), so we
# must override the config value too, before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
