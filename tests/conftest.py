"""Test configuration.

Tests run on a virtual 8-device CPU mesh so they need no TPU and exercise
the multi-chip sharding paths (SURVEY.md section 4: single-host multi-device
simulation before real pods).  Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
