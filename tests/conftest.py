"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize pre-imports jax and registers the remote-TPU
("axon") backend before any conftest runs, so JAX_PLATFORMS env tricks do not
stick — instead we flip ``jax_platforms`` via jax.config *before the first
backend use* and request 8 virtual host devices through XLA_FLAGS (read
lazily at CPU-client creation).

Multi-chip sharding logic is validated on these virtual CPU devices
(SURVEY.md §4: hardware-free strategy); real-TPU performance is exercised by
bench.py, not the test suite.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="include tests marked slow (>10 s; CI-nightly tier)")


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow by default so the everyday suite stays fast;
    `--runslow` (or an explicit -m expression) runs the full tier."""
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip_slow = pytest.mark.skip(reason="slow tier; run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x7E74A)


@pytest.fixture(scope="session")
def noisy_carrier_iq():
    """10 ms of a noisy complex carrier at 2.4 MS/s (mirrors the reference
    fixture tests/conftest.py:53-67)."""
    fs = 2.4e6
    n = int(fs * 0.010)
    t = np.arange(n) / fs
    rng_ = np.random.default_rng(42)
    sig = np.exp(2j * np.pi * 10e3 * t)
    noise = (rng_.standard_normal(n) + 1j * rng_.standard_normal(n)) * 0.1
    return (sig + noise).astype(np.complex64)
