"""Test harness: run everything on a virtual 8-device CPU mesh.

Real TPU hardware (1 chip here) is reserved for `bench.py`; tests exercise the
multi-device sharding paths via 8 virtual CPU devices, as prescribed by
SURVEY.md §4 item 5.

Note: this environment's axon sitecustomize registers the TPU plugin and sets
`jax.config.jax_platforms` directly, so the JAX_PLATFORMS env var alone is
not enough — we override the config before any backend initialization.
"""

import os

# zero-egress box: without these, the first HF tokenizer/config lookup per
# process burns ~45 s in urllib retry backoff before falling back to the
# byte tokenizer (models/t5.py) — make the fallback immediate
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
