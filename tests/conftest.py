"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware the standard JAX
way (SURVEY.md section 4): force the host platform and split it into 8
virtual devices.  Must happen before jax initializes.
"""

import os

# Force CPU even when the ambient environment points JAX at a TPU
# tunnel (JAX_PLATFORMS=axon/tpu): the suite needs 8 virtual devices.
# Override with GLOME_TEST_PLATFORM to run the suite elsewhere.
_plat = os.environ.get("GLOME_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Site customization in this image registers a TPU backend
# programmatically (jax.config), which outranks the env var; set the
# config knob back explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", _plat)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Fast default profile: tests marked `slow` (the golden render and
    the full-scene overflow sweeps, ~8 of the suite's 12 CPU minutes)
    only run with GLOME_SLOW=1.  The verify path sets it."""
    if os.environ.get("GLOME_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow; set GLOME_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
