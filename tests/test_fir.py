"""FIR design + FFT convolution: golden tests vs reference + direct conv."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ddsp_tpu.ops.fir import (
    amp_to_impulse_response,
    fft_convolve,
    filtered_noise,
    frame_noise,
    hann_window,
)


def test_hann_matches_torch():
    for n in [8, 64, 388, 1024]:
        got = np.asarray(hann_window(n))
        want = torch.hann_window(n).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("n_filters,target", [(17, 64), (195, 512)])
def test_amp_to_ir_matches_reference(reference_path, n_filters, target):
    from model.ddsp.filtered_noise import amp_to_impulse_response as ref_fn

    rng = np.random.default_rng(0)
    amp = rng.uniform(0, 1, (2, 3, n_filters)).astype(np.float32)
    got = np.asarray(amp_to_impulse_response(amp, target))
    with torch.no_grad():
        want = ref_fn(torch.from_numpy(amp), target).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fft_convolve_matches_reference(reference_path):
    from model.ddsp.filtered_noise import fft_convolve as ref_fn

    rng = np.random.default_rng(1)
    sig = rng.standard_normal((2, 4, 128)).astype(np.float32)
    ker = rng.standard_normal((2, 4, 128)).astype(np.float32)
    got = np.asarray(fft_convolve(sig, ker))
    with torch.no_grad():
        want = ref_fn(torch.from_numpy(sig), torch.from_numpy(ker)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fft_convolve_is_causal_linear_convolution():
    rng = np.random.default_rng(2)
    length = 64
    sig = rng.standard_normal(length).astype(np.float32)
    ker = rng.standard_normal(length).astype(np.float32)
    got = np.asarray(fft_convolve(sig[None], ker[None]))[0]
    want = np.convolve(sig, ker)[:length]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_frame_noise_streaming_invariance():
    key = jax.random.PRNGKey(7)
    full = np.asarray(frame_noise(key, 1, 10, 16))
    first = np.asarray(frame_noise(key, 1, 6, 16, frame_offset=0))
    second = np.asarray(frame_noise(key, 1, 4, 16, frame_offset=6))
    np.testing.assert_array_equal(full, np.concatenate([first, second], axis=1))
    assert full.min() >= -1.0 and full.max() < 1.0


def test_filtered_noise_shape_and_spectrum():
    key = jax.random.PRNGKey(0)
    b, t, nf, block = 2, 12, 65, 128
    # Lowpass magnitude response: only low bins pass
    mags = np.zeros((b, t, nf), np.float32)
    mags[:, :, :8] = 1.0
    out = np.asarray(filtered_noise(jnp.asarray(mags), key, block))
    assert out.shape == (b, t * block)
    spec = np.abs(np.fft.rfft(out[0]))
    freqs = np.fft.rfftfreq(out.shape[-1])
    # Passband edge at bin 8/64 of Nyquist; far stopband must be well down
    # (the 128-tap Hann-windowed FIR has a wide transition band).
    far = spec[freqs > 0.35].mean()
    lo = spec[freqs < 0.04].mean()
    # Frame-truncation transients (reference semantics) leak broadband noise,
    # so the audible stopband floor is modest; the designed IR itself is much
    # steeper (checked below).
    assert far < 0.25 * lo
    # The designed FIR itself is steep: recenter the zero-phase split taps
    # (head at ir[:64], tail at ir[-64:]) into a contiguous 128-tap filter.
    ir = np.asarray(amp_to_impulse_response(jnp.asarray(mags[0, 0]), block))
    taps = np.roll(ir, 64)[:128]
    h_resp = np.abs(np.fft.rfft(taps, 1024))
    assert h_resp[int(0.7 * len(h_resp)) :].max() < 2e-2 * h_resp[:40].max()


@pytest.mark.parametrize("nf,block", [(65, 128), (195, 512)])
def test_filtered_noise_fused_equals_explicit_path(nf, block):
    """The fused spectral path (design+forward-DFT composite matrix,
    truncated inverse) must equal ir-then-convolve to float32 accuracy."""
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(4)
    b, t = 2, 7
    mags = jnp.asarray(rng.uniform(0, 1, (b, t, nf)).astype(np.float32))
    got = np.asarray(filtered_noise(mags, key, block))
    impulse = amp_to_impulse_response(mags, block)
    noise = frame_noise(key, b, t, block, 0, jnp.float32)
    want = np.asarray(fft_convolve(noise, impulse)).reshape(b, t * block)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_filtered_noise_rejects_short_block():
    key = jax.random.PRNGKey(0)
    mags = jnp.ones((1, 2, 65), jnp.float32)  # designed FIR = 128 taps
    with pytest.raises(ValueError):
        filtered_noise(mags, key, 64)


def test_irfft_out_len_matches_slice():
    from ddsp_tpu.ops.fft import irfft_pair, rfft_pair

    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 256)).astype(np.float32)
    re, im = rfft_pair(jnp.asarray(x), 256)
    full = np.asarray(irfft_pair(re, im, 256))
    trunc = np.asarray(irfft_pair(re, im, 256, out_len=100))
    np.testing.assert_allclose(trunc, full[..., :100], rtol=1e-5, atol=1e-6)


def test_frame_noise_counter_contract_large_offset():
    """Counter-based generator (round 4): values are a pure function of
    (key, row, absolute sample), so a far-future block must match the
    corresponding slice of a longer render, and rows must differ."""
    key = jax.random.PRNGKey(3)
    off = 100_000  # ~19 min into a stream at hop 512
    far = np.asarray(frame_noise(key, 2, 3, 32, frame_offset=off))
    wider = np.asarray(frame_noise(key, 2, 5, 32, frame_offset=off - 1))
    np.testing.assert_array_equal(far, wider[:, 1:4])
    assert far.min() >= -1.0 and far.max() < 1.0
    assert np.abs(far[0] - far[1]).max() > 0  # per-row keys differ
