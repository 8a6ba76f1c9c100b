import os

# Tests run on a virtual 8-device CPU mesh with f64 enabled so they reproduce
# the reference's numerical behavior; TPU benchmarks run separately in f32.
#
# The environment registers an 'axon' TPU platform via sitecustomize and pins
# JAX_PLATFORMS=axon, so the env var alone is not enough — the jax config
# update below is what actually forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
