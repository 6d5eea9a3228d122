"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The TPU-world analog of the reference's nbdev `#|cuda` flag skipping
(SURVEY §4): rendering/pose tests run on CPU for reproducibility and
multi-device sharding tests use XLA's host-platform device virtualization.
Kernel tests that require real TPU hardware are marked `tpu` and skipped
here — run them on hardware with::

    DIFFDRR_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

(the env var keeps the axon/TPU backend instead of forcing CPU).
"""

import os

_ON_HW = bool(os.environ.get("DIFFDRR_TPU_TESTS"))

if not _ON_HW:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _ON_HW:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    if any(d.platform in ("tpu", "axon") for d in jax.devices()):
        return
    skip_tpu = pytest.mark.skip(reason="no TPU available")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
