"""Fused Pallas power-STFT (ops/pallas/stft.py) vs the XLA hop-blocked
path.

The kernel is NOT the production default — it was built for round-4
VERDICT #2 and measured slower than the XLA path at every MSS scale on
the v5e (docs/PERFORMANCE.md round 5) — but it stays selectable
(ops/spectral.set_stft_impl('pallas')), so its forward and custom-VJP
backward are pinned here in interpret mode against the XLA oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_tpu.ops.pallas.stft import spectrogram_power_pallas
from ddsp_tpu.ops.spectral import spectrogram


@pytest.mark.parametrize("n_fft", [64, 256, 2048])
def test_pallas_stft_forward_matches_xla(n_fft):
    hop = n_fft // 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.standard_normal((2, 8192)).astype(np.float32))
    want = np.asarray(spectrogram(x, n_fft, hop, matmul_dtype=jnp.bfloat16))
    got = np.asarray(spectrogram_power_pallas(x, n_fft, hop, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6 * np.abs(want).max())


@pytest.mark.parametrize("n_fft", [64, 512])
def test_pallas_stft_backward_matches_xla(n_fft):
    hop = n_fft // 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(0.1 * rng.standard_normal((2, 8192)).astype(np.float32))
    target = spectrogram(x, n_fft, hop, matmul_dtype=jnp.bfloat16)

    def loss_xla(p):
        return jnp.mean(
            jnp.abs(spectrogram(p, n_fft, hop, matmul_dtype=jnp.bfloat16) - target)
        )

    def loss_pal(p):
        return jnp.mean(
            jnp.abs(spectrogram_power_pallas(p, n_fft, hop, interpret=True) - target)
        )

    y = x + 0.01
    g_ref = np.asarray(jax.grad(loss_xla)(y))
    g_pal = np.asarray(jax.grad(loss_pal)(y))
    # bf16 dmag cast in the kernel's backward: loss-grade agreement
    assert np.abs(g_pal - g_ref).max() <= 5e-3 * np.abs(g_ref).max()
    cos = float(
        np.sum(g_pal * g_ref)
        / (np.linalg.norm(g_pal) * np.linalg.norm(g_ref) + 1e-30)
    )
    assert cos > 0.9999, cos


def test_stft_impl_switch_routes(monkeypatch):
    from ddsp_tpu.ops import spectral

    rng = np.random.default_rng(2)
    x = jnp.asarray(0.1 * rng.standard_normal((1, 4096)).astype(np.float32))
    spectral.set_stft_impl("pallas")
    try:
        a = np.asarray(spectrogram(x, 256, 64, matmul_dtype=jnp.bfloat16))
    finally:
        spectral.set_stft_impl("auto")
    b = np.asarray(spectrogram(x, 256, 64, matmul_dtype=jnp.bfloat16))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6 * np.abs(b).max())
