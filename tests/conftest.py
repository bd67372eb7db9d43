"""Test configuration: force a deterministic 8-device CPU mesh so tests never
touch (or fight over) the single tunneled TPU, and so sharding tests run
without TPU hardware (SURVEY.md §4 test plan).

Note: the container's sitecustomize imports jax and latches
JAX_PLATFORMS=axon before user code runs, so plain os.environ assignment is
too late — jax.config.update must be used instead, before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures():
    return FIXTURES
