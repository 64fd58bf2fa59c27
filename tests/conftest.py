"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-device (mesh / shard_map) paths run in CI without TPUs, per the test
strategy in SURVEY.md §4. Must run before the first `import jax`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
