import os
import sys

# Force CPU with a virtual 8-device mesh for sharding tests; the real chip is
# reserved for bench.py.
# overwrite (the machine presets JAX_PLATFORMS=axon for the real chip, and
# the axon plugin clobbers the env var at jax import — force via config too)
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
