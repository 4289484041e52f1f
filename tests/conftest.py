"""Test configuration.

Runs the suite on the CPU backend with 8 virtual devices so that
sharding/multi-chip semantics are tested without TPU hardware (the standard
JAX answer to distributed tests — SURVEY.md §4).  Tests marked `tpu` are
skipped unless a real TPU is present AND KGTPU_TEST_TPU=1.
"""

import os
import sys

# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms programmatically, so the env var
# alone is not enough — force the CPU backend through the config API too.
# KGTPU_TEST_TPU=1 keeps the real TPU for @pytest.mark.tpu runs.
if os.environ.get("KGTPU_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if os.environ.get("KGTPU_TEST_TPU") == "1":
        return
    skip = pytest.mark.skip(reason="TPU test (set KGTPU_TEST_TPU=1 to run)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
