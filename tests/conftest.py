"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-device (mesh / shard_map) paths run in CI without TPUs, per the test
strategy in SURVEY.md §4.

Note: this environment may pre-import jax with a TPU PJRT plugin via a
sitecustomize hook and an ambient ``JAX_PLATFORMS`` env var, so a
``setdefault`` is not enough — both the env var and the live jax config
must be overridden before any backend is used.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
