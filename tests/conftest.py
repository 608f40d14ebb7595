"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX way to exercise SPMD sharding without TPU hardware
(SURVEY.md §4d). Must run before the first `import jax` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# Some environments force-register a TPU plugin whose registration overrides
# JAX_PLATFORMS; re-pin via config BEFORE any backend initializes so tests are
# CPU-only (deterministic, exact-f32) and never touch the TPU link.
jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "cpu":  # pragma: no cover — belt and braces
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

# cache CPU compiles across suite runs (the sharded train-step tests are
# compile-dominated)
from thermal3d.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-scale runs gated behind RUN_SLOW=1")
    config.addinivalue_line(
        "markers", "heavy: compile-bound integration tests gated behind "
        "RUN_HEAVY=1 — every gated path keeps a cheaper default-suite "
        "sibling; run the full tier in CI/nightly (README 'Tests')")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_HEAVY"):
        return
    skip = pytest.mark.skip(
        reason="heavy compile-bound integration test; set RUN_HEAVY=1")
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


TINY_KW = dict(
    img_size=(32, 32),
    enc_embed_dim=64,
    enc_depth=2,
    enc_num_heads=2,
    dec_embed_dim=48,
    dec_depth=2,
    dec_num_heads=2,
)


@pytest.fixture
def tiny_config():
    from thermal3d.core.config import DustrModelConfig

    return DustrModelConfig(**TINY_KW)
