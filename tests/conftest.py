"""Test configuration: force CPU with a virtual 8-device mesh.

Mirrors the strategy in SURVEY.md §7: sharding/collective logic is tested on
a host-platform device mesh, and numerics run in f64 on CPU where the
reference's tight L1 tolerances apply.

jax may already be imported (e.g. a sitecustomize registering a TPU plugin),
so the platform is forced via jax.config before backend initialization
rather than via environment variables.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("QUOKKA_TPU_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except AttributeError:  # older jax: XLA_FLAGS path above covers it
        pass
