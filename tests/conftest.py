"""Test harness: CPU backend with 8 virtual devices, kernels interpreted.

The CI substrate per SURVEY.md §4: parity tests run against the jnp oracle
with Pallas kernels in interpreter mode (the analogue of the reference's CPU
exact-softmax loop, tests/main.cu:74-91), and multi-chip sharding tests run
on a virtual 8-device CPU mesh (the fake-backend story the reference lacks).

Set TPU_FLASH_TEST_BACKEND=tpu to run the same suite on real hardware.

Note: jax may already be imported by sitecustomize before this conftest runs,
so the platform is forced via jax.config (backend init is lazy), not env.
"""

import os

_backend = os.environ.get("TPU_FLASH_TEST_BACKEND", "cpu")
if _backend == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
