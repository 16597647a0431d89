"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding logic is tested on a host-platform mesh
(``--xla_force_host_platform_device_count=8``), the TPU-world analogue of a
fake backend. The environment's sitecustomize pre-initializes a TPU backend,
so the reset needs all three steps of the documented recipe
(``__graft_entry__._ensure_devices``): clear the backend registry, clear
``get_backend``'s separate memo cache, and set the CPU device count via
config (XLA_FLAGS is only parsed at import time).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    if jax.devices()[0].platform != "cpu" or len(jax.devices()) < 8:
        import jax._src.xla_bridge as _xb

        _xb._clear_backends()
        _xb.get_backend.cache_clear()
        jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    pass

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) >= 8, (
    f"tests need the 8-device CPU mesh, got {jax.devices()}"
)
