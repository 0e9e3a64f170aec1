"""Polyphase windowed-sinc resampling.

Behavioral parity target: ``torchaudio.transforms.Resample(orig, new)`` with
its defaults (lowpass_filter_width=6, rolloff=0.99, Hann-windowed sinc),
used by the reference F0 encoder to get 44.1 kHz -> 16 kHz audio for CREPE
(reference: model/autoencoder/encoder.py:19,56).  The algorithm: reduce the
rate ratio by the gcd, build one windowed-sinc kernel per output phase, and
evaluate all phases as a single strided 1-D convolution -- which XLA maps
onto the TPU MXU as a batched matmul.

Pure function of static Python ints; kernels are precomputed with NumPy at
trace time and closed over as constants.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple:
    """Windowed-sinc polyphase kernel bank.

    Returns (kernels (new_freq, filt_len) float32, width int), where phase
    ``p``'s kernel is the lowpass sinc centered at output time ``p/new_freq``
    sampled on the input grid, Hann^2-windowed and clamped to the filter
    support, scaled by ``base_freq/orig_freq``.
    """
    assert math.gcd(orig_freq, new_freq) == 1
    base_freq = min(orig_freq, new_freq) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig_freq / base_freq))
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t)) * window
    kernels = kernels * (base_freq / orig_freq)
    return kernels.astype(np.float32), width


def resample_length(length: int, orig_freq: int, new_freq: int) -> int:
    gcd = math.gcd(orig_freq, new_freq)
    return int(math.ceil(new_freq // gcd * length / (orig_freq // gcd)))


def resample(
    x: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample (..., L) audio from orig_freq to new_freq.

    Matches torchaudio's sinc_interp_hann resampler to float32 accuracy.
    """
    if orig_freq == new_freq:
        return x
    gcd = math.gcd(orig_freq, new_freq)
    of, nf = orig_freq // gcd, new_freq // gcd
    kernels, width = _sinc_kernel(of, nf, lowpass_filter_width, rolloff)

    length = x.shape[-1]
    lead_shape = x.shape[:-1]
    xf = x.reshape(-1, 1, length)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + of)))
    # (nf, 1, filt_len) filters, stride of: one output sample per (phase, block)
    filt = jnp.asarray(kernels)[:, None, :]
    out = jax.lax.conv_general_dilated(
        xf,
        filt,
        window_strides=(of,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, nf, n_blocks)
    out = jnp.moveaxis(out, -2, -1).reshape(xf.shape[0], -1)
    target = resample_length(length, orig_freq, new_freq)
    return out[..., :target].reshape(*lead_shape, target)
