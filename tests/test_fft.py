"""Matmul-FFT layer vs numpy FFT oracles (direct DFT + Cooley-Tukey paths)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddsp_tpu.ops.fft import (
    fft_pair,
    irfft_pair,
    next_pow2,
    rfft_convolve_same,
    rfft_pair,
)


@pytest.mark.parametrize("n", [64, 388, 1024, 4096])
def test_rfft_direct(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, n)).astype(np.float32)
    re, im = rfft_pair(x)
    want = np.fft.rfft(x)
    np.testing.assert_allclose(np.asarray(re), want.real, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(im), want.imag, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("n", [8192, 131072])
def test_rfft_cooley_tukey(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, n)).astype(np.float32)
    re, im = rfft_pair(x)
    want = np.fft.rfft(x)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(re), want.real, atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=2e-3 * scale)


@pytest.mark.parametrize("n_bins,n", [(195, 388), (33, 64), (513, 1024)])
def test_irfft_direct(n_bins, n):
    rng = np.random.default_rng(2)
    spec = rng.standard_normal((2, n_bins)) + 1j * rng.standard_normal((2, n_bins))
    spec = spec.astype(np.complex64)
    got = np.asarray(
        irfft_pair(jnp.asarray(spec.real), jnp.asarray(spec.imag), n)
    )
    want = np.fft.irfft(spec, n)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_irfft_large_roundtrip():
    n = 16384
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, n)).astype(np.float32)
    re, im = rfft_pair(x)
    back = np.asarray(irfft_pair(re, im, n))
    np.testing.assert_allclose(back, x, atol=2e-3)


def test_fft_pair_zero_pad():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 100)).astype(np.float32)
    re, im = fft_pair(jnp.asarray(x), None, 256)
    want = np.fft.fft(x, 256)
    np.testing.assert_allclose(np.asarray(re), want.real, atol=1e-3)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=1e-3)


def test_convolve_same_vs_direct():
    rng = np.random.default_rng(5)
    sig = rng.standard_normal((1, 300)).astype(np.float32)
    ker = rng.standard_normal((1, 50)).astype(np.float32)
    got = np.asarray(rfft_convolve_same(sig, ker, 50))
    want = np.convolve(sig[0], ker[0])[:300]
    np.testing.assert_allclose(got[0], want, atol=1e-3)


def test_convolve_same_large_kernel(snr):
    """Reverb-scale: 12000-sample signal, 4000-tap kernel -> CT path."""
    rng = np.random.default_rng(6)
    sig = rng.standard_normal((1, 12000)).astype(np.float32)
    ker = rng.standard_normal((1, 4000)).astype(np.float32)
    assert next_pow2(12000 + 4000 - 1) == 16384
    got = np.asarray(rfft_convolve_same(sig, ker, 4000))
    want = np.convolve(sig[0], ker[0])[:12000]
    assert snr(want, got[0]) > 55.0


def test_convolve_same_packed_even_batch(snr):
    """Even batches pack signal pairs into complex FFTs on the large path;
    output must match per-row direct convolution (shared and per-row kernels,
    and gradients must flow)."""
    rng = np.random.default_rng(7)
    sig = rng.standard_normal((4, 9000)).astype(np.float32)
    for ker_rows in (1, 4):
        ker = 0.1 * rng.standard_normal((ker_rows, 3000)).astype(np.float32)
        got = np.asarray(rfft_convolve_same(jnp.asarray(sig), jnp.asarray(ker), 3000))
        want = np.stack(
            [np.convolve(s, ker[i % ker_rows])[:9000] for i, s in enumerate(sig)]
        )
        for row_want, row_got in zip(want, got):
            assert snr(row_want, row_got) > 55.0

    import jax

    g = jax.grad(
        lambda s: jnp.sum(rfft_convolve_same(s, jnp.asarray(ker), 3000) ** 2)
    )(jnp.asarray(sig))
    assert np.isfinite(np.asarray(g)).all()


def test_rfft_pair_large_matmul_dtype(snr):
    """matmul_dtype is honored on the Cooley-Tukey path (n > DIRECT_MAX)."""
    import jax.numpy as jnp

    from ddsp_tpu.ops.fft import DIRECT_MAX, rfft_pair

    n = 4 * DIRECT_MAX
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, n)).astype(np.float32)
    ref = np.fft.rfft(x, n)
    re32, im32 = (np.asarray(a) for a in rfft_pair(jnp.asarray(x), n))
    re16, im16 = (
        np.asarray(a)
        for a in rfft_pair(jnp.asarray(x), n, matmul_dtype=jnp.bfloat16)
    )
    assert re16.dtype == np.float32 and im16.dtype == np.float32  # f32 accum
    assert snr(ref.real, re32) > 80 and snr(ref.imag, im32) > 80
    # bf16 inputs: loss-grade accuracy, clearly worse than f32 but usable
    assert snr(ref.real, re16) > 25 and snr(ref.imag, im16) > 25
    assert snr(ref.real, re16) < snr(ref.real, re32)


def test_overlap_save_adaptive_chunking(snr):
    """The chunk-count search scales with length/kernel (round 4): at long
    render-like lengths the old fixed cap of 6 left ~40% of the MACs on
    the table.  The plan must pick more chunks when profitable and the
    chunked convolution must still match direct convolution exactly."""
    from ddsp_tpu.ops.fft import _overlap_save_plan

    length, klen = 120000, 3000
    k = _overlap_save_plan(length, klen)
    assert k > 6, k  # the adaptive cap actually unlocked more chunks
    rng = np.random.default_rng(11)
    sig = rng.standard_normal((1, length)).astype(np.float32)
    ker = 0.1 * rng.standard_normal((1, klen)).astype(np.float32)
    got = np.asarray(rfft_convolve_same(jnp.asarray(sig), jnp.asarray(ker), klen))
    want = np.convolve(sig[0], ker[0])[:length]
    assert snr(want, got[0]) > 55.0
    # training shape's plan is unchanged by the adaptive cap (k=2 at the
    # 2 s example length -- keeps BENCH train-step numbers comparable)
    assert _overlap_save_plan(88064, 44100) == 2


def test_ct_permuted_roundtrip_and_layout(snr):
    """Permuted-spectrum CT (round 5): forward matches numpy's FFT under
    the P[k1,k2] = X[k1 + n1*k2] permutation, and inverse(forward) is
    identity -- the no-transpose convolution fast path's foundations."""
    import jax.numpy as jnp

    from ddsp_tpu.ops.fft import (
        _ct_fwd_permuted,
        _ct_inv_permuted,
        _split_factors,
    )

    n = 6144
    n1, n2 = _split_factors(n)
    rng = np.random.default_rng(3)
    xr = rng.standard_normal((3, n)).astype(np.float32)
    xi = rng.standard_normal((3, n)).astype(np.float32)
    pr, pi = _ct_fwd_permuted(jnp.asarray(xr), jnp.asarray(xi), n)
    ref = np.fft.fft(xr + 1j * xi, axis=-1)
    perm = ref.reshape(3, n2, n1).swapaxes(-1, -2)  # X[k1+n1*k2] -> [k1,k2]
    got = np.asarray(pr) + 1j * np.asarray(pi)
    assert np.abs(got - perm).max() / np.abs(ref).max() < 1e-5
    yr, yi = _ct_inv_permuted(pr, pi, n)
    assert np.abs(np.asarray(yr) - xr).max() < 1e-4
    assert np.abs(np.asarray(yi) - xi).max() < 1e-4


def test_convolve_shared_kernel_odd_batch(snr):
    """Odd batches ride the shared-kernel packed path (zero-row pad)
    instead of falling back to hermitian extension; overlap-save chunking
    composes with it at the reverb shape class."""
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.ops.fft import rfft_convolve_same

    rng = np.random.default_rng(11)
    # odd batch, direct large-n path
    sig = rng.standard_normal((3, 9000)).astype(np.float32)
    ker = 0.1 * rng.standard_normal((1, 3000)).astype(np.float32)
    got = np.asarray(rfft_convolve_same(jnp.asarray(sig), jnp.asarray(ker), 3000))
    for i in range(3):
        want = np.convolve(sig[i], ker[0])[:9000]
        assert snr(want, got[i]) > 55.0
    # overlap-save regime (kernel long relative to chunks), with gradient
    sig2 = rng.standard_normal((2, 60000)).astype(np.float32)
    ker2 = (
        0.1 * rng.standard_normal((1, 20000)) * np.exp(-np.arange(20000) / 4000)
    ).astype(np.float32)
    got2 = np.asarray(
        rfft_convolve_same(jnp.asarray(sig2), jnp.asarray(ker2), 20000)
    )
    for i in range(2):
        want2 = np.convolve(sig2[i], ker2[0])[:60000]
        assert snr(want2, got2[i]) > 55.0
    gk = jax.grad(
        lambda k: jnp.sum(
            rfft_convolve_same(jnp.asarray(sig2), k, 20000) ** 2
        )
    )(jnp.asarray(ker2))
    assert np.isfinite(np.asarray(gk)).all()
