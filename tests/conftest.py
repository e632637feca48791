"""Test harness: run everything on a virtual 8-device CPU mesh.

Real TPU hardware (1 chip here) is reserved for `bench.py`; tests exercise the
multi-device sharding paths via `--xla_force_host_platform_device_count=8`,
as prescribed by SURVEY.md §4 item 5.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
