"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first ``import jax`` anywhere in the test run.
"""

import os

# force CPU even if the environment pre-sets a TPU platform (e.g. axon)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon site hook re-forces JAX_PLATFORMS; the config flag wins over it
jax.config.update("jax_platforms", "cpu")
