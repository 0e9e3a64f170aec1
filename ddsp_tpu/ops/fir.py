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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops.fft import (
    dft_matmul,
    irfft_pair,
    next_fft_size,
    rfft_convolve_same,
    rfft_pair,
)


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
    signal: jnp.ndarray,
    kernel: jnp.ndarray,
    kernel_len: int = None,
    grad_matmul_dtype: str = None,
) -> jnp.ndarray:
    """Causal linear convolution via FFT, reference pad/crop alignment.

    Both inputs are (..., L); output is (..., L) with
    ``out[n] = sum_{k<=n} kernel[k] * signal[n-k]``
    (reference filtered_noise.py:25-32 pads signal right / kernel left and
    keeps the second half -- algebraically identical to this).

    ``kernel_len`` optionally declares the true (nonzero) kernel support so
    the FFT size can shrink (e.g. the reverb IR is 1 s but zero-padded to the
    signal length by the caller).

    ``grad_matmul_dtype`` (e.g. 'bfloat16'): run the BACKWARD pass's DFT
    matmuls with inputs cast to that dtype (float32 accumulation) through a
    hand-written VJP, while the forward convolution keeps full precision.
    Gradients tolerate the ~1e-3 relative noise (the MSS loss STFTs already
    run bf16 end-to-end, and the reference trains under fp16 AMP,
    train/train.py:50); on the v5e this triples the MXU rate of the
    reverb-scale backward convolutions (docs/PERFORMANCE.md round-4).
    Requires 2-D (B, L) operands with a shared or per-row 1-D kernel
    batch; unsupported shapes fall back to autodiff at full precision.
    """
    kernel_len = kernel_len or kernel.shape[-1]
    if (
        grad_matmul_dtype is not None
        and grad_matmul_dtype != "float32"
        and signal.ndim == 2
        and kernel.ndim == 2
    ):
        return _fft_convolve_fastgrad(
            signal, kernel, kernel_len, grad_matmul_dtype
        )
    return rfft_convolve_same(signal, kernel, kernel_len)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fft_convolve_fastgrad(signal, kernel, kernel_len, grad_matmul_dtype):
    return rfft_convolve_same(signal, kernel, kernel_len)


def _fft_convolve_fastgrad_fwd(signal, kernel, kernel_len, grad_matmul_dtype):
    return rfft_convolve_same(signal, kernel, kernel_len), (signal, kernel)


def _fft_convolve_fastgrad_bwd(kernel_len, grad_matmul_dtype, res, g):
    """Reduced-precision backward of the causal truncated convolution.

    The convolution is bilinear, so each gradient is the TRANSPOSE of the
    forward map with the other operand held fixed -- taken of the
    ``matmul_dtype``-cast forward, so every transposed DFT matmul runs at
    the reduced-precision MXU rate while keeping the exact autodiff
    structure (the kernel branch stays a single FFT row; an explicit
    correlation form was measured 2x slower because its d/dkernel needs a
    2L-point convolution, docs/PERFORMANCE.md round-4).
    """
    dtype = jnp.dtype(grad_matmul_dtype)
    signal, kernel = res
    g = g.astype(jnp.float32)
    (dx,) = jax.linear_transpose(
        lambda s: rfft_convolve_same(s, kernel, kernel_len, matmul_dtype=dtype),
        signal,
    )(g)
    (dk,) = jax.linear_transpose(
        lambda k: rfft_convolve_same(signal, k, kernel_len, matmul_dtype=dtype),
        kernel,
    )(g)
    return dx, dk


_fft_convolve_fastgrad.defvjp(
    _fft_convolve_fastgrad_fwd, _fft_convolve_fastgrad_bwd
)


try:  # counter-based threefry core (private in jax; guarded)
    from jax._src.prng import threefry_2x32 as _threefry_2x32
except ImportError:  # pragma: no cover - older/newer jax layouts
    _threefry_2x32 = None


def frame_noise(
    key: jax.Array,
    batch: int,
    n_frames: int,
    block_size: int,
    frame_offset=0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(B, n_frames, block_size) uniform noise in [-1, 1).

    Every value is a pure function of (key, batch row, ABSOLUTE sample
    index): one per-row key (``fold_in(key, b)``) drives a counter-based
    threefry pass over ``frame_offset*block + [0, n*block)`` -- so
    block-based streaming renders reproduce offline renders exactly
    regardless of block boundaries, by counter slicing rather than by
    re-deriving one key per frame.  (The round-3 form folded the key per
    frame: 5168 key derivations + per-frame uniform draws cost 0.23 ms of
    the 60 s render, half the noise stage; one fused counter pass is
    ~10x cheaper.)  Counters are uint32: exact for the first 2^32 samples
    (~27 hours at 44.1 kHz) of a stream, wrapping (repeating noise, not
    corrupting) beyond.
    """
    if _threefry_2x32 is None:  # pragma: no cover - fallback, same contract
        frames = jnp.arange(n_frames) + frame_offset
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(frames)
        noise = jax.vmap(
            lambda k: jax.random.uniform(k, (batch, block_size), dtype, -1.0, 1.0)
        )(keys)
        return jnp.moveaxis(noise, 0, 1)
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        # New-style typed keys (jax.random.key): unwrap to the raw uint32
        # (2,) form the threefry core consumes.  fold_in below accepts raw
        # legacy keys, so the rest of the path is key-flavor agnostic.
        key = jax.random.key_data(key)
    row_keys = jax.vmap(lambda b: jax.random.fold_in(key, b))(
        jnp.arange(batch)
    )  # (B, 2) uint32
    n = n_frames * block_size
    counts = jnp.asarray(frame_offset, jnp.uint32) * jnp.uint32(
        block_size
    ) + jnp.arange(n, dtype=jnp.uint32)
    # threefry_2x32 splits its count array in half for the two cipher
    # lanes; pass (counter, 0) pairs explicitly so each output word is a
    # pure function of its ABSOLUTE counter (the streaming invariant),
    # independent of the call's array length.
    cc = jnp.concatenate([counts, jnp.zeros_like(counts)])
    bits = jax.vmap(lambda rk: _threefry_2x32(rk, cc)[:n])(row_keys)
    # 24 mantissa-safe bits -> exact float32 in [-1, 1).  (The naive
    # bits * 2^-31 - 1 form rounds counts >= 2^32 - 128 up to 2^32 and
    # emits exactly 1.0 ~ every 3e-8 samples, violating the half-open
    # contract; the top-24-bit ladder is exact and strictly < 1.0.)
    u = (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
        2.0**-23
    ) - 1.0
    return u.reshape(batch, n_frames, block_size).astype(dtype)


@functools.lru_cache(maxsize=None)
def _design_spectrum_mats(n_filters: int, block_size: int, n_fft: int):
    """(n_filters, n_fft//2+1) cos/sin pair: magnitudes -> kernel spectrum.

    The whole FIR design (irfft of a zero-phase magnitude response, roll to
    causal, Hann window, zero-pad to ``block_size``, roll back — reference
    filtered_noise.py:7-22) followed by the convolution's forward rDFT at
    ``n_fft`` is one linear map of the ``n_filters`` decoder outputs.  This
    composes it on the host (float64, cast to float32): the per-frame FIR
    stage then never materializes impulse responses and skips a full
    ``n_fft``-point forward transform in both the forward and backward pass.
    """
    fs = 2 * (n_filters - 1)
    if block_size < fs:
        raise ValueError(
            f"block_size {block_size} < designed FIR length {fs}"
        )
    # irfft of (mags, 0j): real part of the inverse-rDFT matrix only.
    k = np.arange(n_filters, dtype=np.float64)[:, None]
    t = np.arange(fs, dtype=np.float64)[None, :]
    scale = np.full((n_filters, 1), 2.0 / fs)
    scale[0, 0] = 1.0 / fs
    scale[-1, 0] = 1.0 / fs  # n_filters-1 == fs//2 by construction
    design = np.cos(2.0 * np.pi * k * t / fs) * scale
    design = np.roll(design, fs // 2, axis=1)
    design = design * (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(fs) / fs))
    design = np.pad(design, ((0, 0), (0, block_size - fs)))
    design = np.roll(design, -(fs // 2), axis=1)  # (n_filters, block_size)
    tt = np.arange(block_size, dtype=np.float64)[:, None]
    kk = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * tt * kk / n_fft
    wre = design @ np.cos(ang)
    wri = design @ np.sin(ang)
    return wre.astype(np.float32), wri.astype(np.float32)


def convolve_designed_fir(
    filter_mags: jnp.ndarray, frames: jnp.ndarray
) -> jnp.ndarray:
    """Convolve per-frame signals with the FIR designed from ``filter_mags``.

    Semantically identical to ``fft_convolve(frames, amp_to_impulse_response(
    filter_mags, block_size))`` but evaluated spectrally: the design chain and
    the kernel's forward transform collapse into one precomputed
    (n_filters, n_bins) matrix pair (``_design_spectrum_mats``), and the
    inverse transform keeps only the causal ``block_size`` samples by
    truncating the inverse-DFT matrix (``irfft_pair(out_len=...)``) — ~45%
    fewer MACs than the explicit ir-then-convolve path, same math.

    Args:
      filter_mags: (B, T, n_filters) per-frame magnitude responses.
      frames: (B, T, block_size) per-frame signals (noise blocks).

    Returns:
      (B, T*block_size) filtered signal, frames concatenated.
    """
    b, t, nf = filter_mags.shape
    block_size = frames.shape[-1]
    n = next_fft_size(2 * block_size - 1)
    wre, wri = _design_spectrum_mats(nf, block_size, n)
    kr = dft_matmul(filter_mags, jnp.asarray(wre))
    ki = dft_matmul(filter_mags, jnp.asarray(wri))
    sr, si = rfft_pair(frames, n)
    out = irfft_pair(sr * kr - si * ki, sr * ki + si * kr, n, out_len=block_size)
    return out.reshape(b, t * block_size)


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
    noise = frame_noise(key, b, t, block_size, frame_offset, filter_mags.dtype)
    return convolve_designed_fir(filter_mags, noise)
