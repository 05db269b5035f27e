"""Test configuration: force an 8-device virtual CPU mesh.

The session environment pins ``JAX_PLATFORMS=axon`` (remote TPU) via a site
hook that ignores later env-var edits, so the platform is forced through
``jax.config`` instead. Multi-chip sharding paths are exercised on virtual
CPU devices; real-TPU benchmarking lives in ``bench.py``, not in the test
suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
