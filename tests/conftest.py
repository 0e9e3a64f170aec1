"""Test harness: force an 8-device virtual CPU platform before JAX loads.

Distributed tests run on a single process with 8 fake CPU devices (the
standard JAX trick), so sharding/collective logic is exercised without TPU
hardware.  Golden tests import the read-only PyTorch reference from
/root/reference as a numerical oracle (never copied into this repo).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin overrides JAX_PLATFORMS; force CPU via the config API
# (effective because no backend has been initialized yet).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def reference_path():
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference repo not mounted")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    return REFERENCE_PATH


def snr_db(signal: np.ndarray, estimate: np.ndarray) -> float:
    """Signal-to-noise ratio of estimate vs signal, in dB."""
    signal = np.asarray(signal, np.float64)
    noise = signal - np.asarray(estimate, np.float64)
    p_sig = np.mean(signal**2)
    p_noise = np.mean(noise**2)
    if p_noise == 0:
        return float("inf")
    return float(10.0 * np.log10(p_sig / p_noise))


@pytest.fixture
def snr():
    return snr_db
