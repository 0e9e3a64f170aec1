"""STFT inversion: complex STFT, overlap-add iSTFT, Griffin-Lim.

Needed by the style-transfer experiment (the reference uses torchaudio's
``griffinlim`` with momentum, reference: style_transfer.py:145-156 and
helper.py:100-112).  Built on the matmul-FFT layer so it runs on the TPU
backend (which lacks XLA FFT); the iSTFT uses standard COLA normalization.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops.fft import irfft_pair, rfft_pair
from ddsp_tpu.ops.fir import hann_window
from ddsp_tpu.ops.spectral import frame_signal, reflect_pad


def stft_pair(
    x: jnp.ndarray, n_fft: int, hop: int, center: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Complex STFT as (re, im), shape (..., frames, n_fft//2+1)."""
    if center:
        x = reflect_pad(x, n_fft // 2)
    frames = frame_signal(x, n_fft, hop) * hann_window(n_fft, x.dtype)
    return rfft_pair(frames)


def istft(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int,
    hop: int,
    length: Optional[int] = None,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT by windowed overlap-add with COLA normalization."""
    frames = irfft_pair(re, im, n_fft)  # (..., T, n_fft)
    win = hann_window(n_fft, frames.dtype)
    frames = frames * win
    t = frames.shape[-2]
    out_len = n_fft + hop * (t - 1)
    lead = frames.shape[:-2]

    idx = (np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    flat = frames.reshape(*lead, t * n_fft)
    sig = jnp.zeros((*lead, out_len), frames.dtype).at[..., idx].add(flat)

    wsq = np.zeros(out_len, np.float64)
    # host-side copy of the periodic Hann window (win may be traced)
    w2 = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)) ** 2
    for i in range(t):
        wsq[i * hop : i * hop + n_fft] += w2
    sig = sig / jnp.asarray(np.maximum(wsq, 1e-11), frames.dtype)

    if center:
        sig = sig[..., n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        sig = sig[..., :length]
    return sig


def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int,
    hop: int,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: Optional[int] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Phase retrieval from magnitude spectrogram (torchaudio-style momentum).

    Args:
      magnitude: (..., frames, n_fft//2+1) linear magnitudes.

    Matches the algorithm behind the reference's ``torchaudio.functional
    .griffinlim(..., momentum=0.99)`` call (style_transfer.py:145-153).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    ang = jax.random.uniform(key, magnitude.shape, magnitude.dtype, 0.0, 2 * np.pi)
    re = magnitude * jnp.cos(ang)
    im = magnitude * jnp.sin(ang)

    def project(re, im):
        x = istft(re, im, n_fft, hop, length)
        return stft_pair(x, n_fft, hop)

    def body(carry, _):
        re, im, pre, pim = carry
        nre, nim = project(re, im)
        # momentum acceleration on the unnormalized rebuilt spectrum
        are = nre - (momentum / (1 + momentum)) * pre
        aim = nim - (momentum / (1 + momentum)) * pim
        mag = jnp.sqrt(are**2 + aim**2) + 1e-16
        re = magnitude * are / mag
        im = magnitude * aim / mag
        return (re, im, nre, nim), None

    init = (re, im, jnp.zeros_like(re), jnp.zeros_like(im))
    (re, im, _, _), _ = jax.lax.scan(body, init, None, length=n_iter)
    return istft(re, im, n_fft, hop, length)
