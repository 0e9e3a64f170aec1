"""Frequency-sampling FIR design and FFT convolution.

Behavioral parity targets (reference: model/ddsp/filtered_noise.py:7-32):

* ``amp_to_impulse_response``: interpret decoder magnitudes as a zero-phase
  frequency response; irfft -> rotate to causal -> Hann window -> zero-pad to
  the target block size -> rotate back.
* ``fft_convolve``: circular-to-linear convolution with the reference's exact
  pad/crop alignment (signal padded right, kernel padded left, second half of
  the inverse FFT kept), i.e. causal linear convolution
  ``y[n] = sum_k kernel[k] * signal[n-k]`` truncated to the signal length.

Pure jnp; every FFT runs through the matmul-DFT layer (ddsp_tpu/ops/fft.py)
-- this TPU backend exposes NO XLA FFT.  Uniform noise generation is keyed by
absolute frame index so streaming block renders are bit-identical to offline
renders (the reference uses ``torch.rand`` and cannot reproduce this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops.fft import irfft_pair, rfft_convolve_same


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, matching ``torch.hann_window(n)`` semantics."""
    i = np.arange(n)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * i / n), dtype=dtype)


def amp_to_impulse_response(amp: jnp.ndarray, target_size: int) -> jnp.ndarray:
    """Zero-phase magnitude response -> windowed causal FIR of target_size.

    Args:
      amp: (..., n_filters) non-negative magnitudes over [0, Nyquist].
      target_size: output FIR length (>= 2*(n_filters-1)).

    Returns:
      (..., target_size) impulse response, matching reference
      filtered_noise.py:7-22 bit-for-bit in exact arithmetic.  The irfft is
      a single (n_filters, 2*(n_filters-1)) matmul on TPU (ops/fft.py).
    """
    ir = irfft_pair(amp, jnp.zeros_like(amp))
    filter_size = ir.shape[-1]  # 2 * (n_filters - 1)
    ir = jnp.roll(ir, filter_size // 2, axis=-1)
    ir = ir * hann_window(filter_size, ir.dtype)
    pad = [(0, 0)] * (ir.ndim - 1) + [(0, int(target_size) - int(filter_size))]
    ir = jnp.pad(ir, pad)
    return jnp.roll(ir, -(filter_size // 2), axis=-1)


def fft_convolve(
    signal: jnp.ndarray, kernel: jnp.ndarray, kernel_len: int = None
) -> jnp.ndarray:
    """Causal linear convolution via FFT, reference pad/crop alignment.

    Both inputs are (..., L); output is (..., L) with
    ``out[n] = sum_{k<=n} kernel[k] * signal[n-k]``
    (reference filtered_noise.py:25-32 pads signal right / kernel left and
    keeps the second half -- algebraically identical to this).

    ``kernel_len`` optionally declares the true (nonzero) kernel support so
    the FFT size can shrink (e.g. the reverb IR is 1 s but zero-padded to the
    signal length by the caller).
    """
    return rfft_convolve_same(
        signal, kernel, kernel_len or kernel.shape[-1]
    )


def frame_noise(
    key: jax.Array,
    batch: int,
    n_frames: int,
    block_size: int,
    frame_offset=0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(B, n_frames, block_size) uniform noise in [-1, 1).

    Each frame's noise derives from ``fold_in(key, absolute_frame_index)``,
    making block-based streaming renders reproduce offline renders exactly
    regardless of block boundaries.
    """
    frames = jnp.arange(n_frames) + frame_offset
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(frames)
    noise = jax.vmap(
        lambda k: jax.random.uniform(k, (batch, block_size), dtype, -1.0, 1.0)
    )(keys)
    return jnp.moveaxis(noise, 0, 1)


def filtered_noise(
    filter_mags: jnp.ndarray,
    key: jax.Array,
    block_size: int,
    frame_offset=0,
) -> jnp.ndarray:
    """Time-varying FIR-filtered uniform noise (reference filtered_noise.py:35-53).

    Args:
      filter_mags: (B, T, n_filters) per-frame magnitude responses.
      block_size: samples per frame (= hop length).

    Returns:
      (B, T*block_size) noise signal.
    """
    b, t, _ = filter_mags.shape
    impulse = amp_to_impulse_response(filter_mags, block_size)
    noise = frame_noise(key, b, t, block_size, frame_offset, impulse.dtype)
    out = fft_convolve(noise, impulse)
    return out.reshape(b, t * block_size)
