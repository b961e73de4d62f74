"""Test configuration.

Tests run on a virtual 8-device CPU mesh so they need no TPU and exercise
the multi-chip sharding paths (SURVEY.md section 4: single-host multi-device
simulation before real pods).

Note: the axon TPU plugin force-registers itself and overrides the
JAX_PLATFORMS environment variable, so the platform must be pinned through
jax.config *before* the backend initializes (first device use).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
