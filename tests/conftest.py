"""Test configuration.

Forces an 8-device virtual CPU platform so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4).  Note the axon sitecustomize
in this image calls jax.config.update("jax_platforms", "axon,cpu") at
interpreter start, which overrides JAX_PLATFORMS from the environment — so we
must override the *config* again here, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
