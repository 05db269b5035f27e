"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding paths are exercised on virtual CPU devices
(``--xla_force_host_platform_device_count``); real-TPU benchmarking lives in
``bench.py``, not in the test suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
