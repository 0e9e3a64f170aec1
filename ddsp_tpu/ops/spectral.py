"""STFT, spectrogram, and psychoacoustic weighting ops.

Behavioral parity targets:

* torchaudio ``Spectrogram(n_fft, hop)`` conventions used by the MSS loss
  (reference: loss/mss_loss.py:23): center=True with reflect padding,
  periodic Hann window, power-2 magnitudes, no normalization.
* ``torch.stft(center=False)`` with no window (rectangular) used by the
  loudness encoder (reference: model/autoencoder/encoder.py:141-148).
* librosa ``A_weighting`` curve (reference: encoder.py:137-139).

Framing is a strided gather; all spectra run through the matmul-DFT layer
(ddsp_tpu/ops/fft.py) -- this TPU backend exposes NO XLA FFT, never call
jnp.fft.* in device code.  All functions are pure and differentiable.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops.fft import DIRECT_MAX, _mm, rfft_pair
from ddsp_tpu.ops.fir import hann_window


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., L) -> (..., n_frames, frame_length) overlapping frames.

    When the hop divides both the frame length and the signal length the
    framing is a reshape plus ``frame_length/hop`` static slices -- whose
    backward is a handful of pads (cheap on TPU).  The general case falls
    back to a gather, whose backward is a scatter-add (slow on TPU; avoid
    in training loss paths).
    """
    length = x.shape[-1]
    n_frames = 1 + (length - frame_length) // hop
    if frame_length % hop == 0 and length % hop == 0:
        blocks = x.reshape(*x.shape[:-1], length // hop, hop)
        k = frame_length // hop
        parts = [blocks[..., i : i + n_frames, :] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the last axis (torch 'reflect' semantics, no edge repeat)."""
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg, mode="reflect")


@functools.lru_cache(maxsize=None)
def _hann_rdft_blocks(n_fft: int, hop: int):
    """Hann-windowed rDFT matrix split into n_fft//hop row blocks of
    (hop, n_fft//2+1) -- the STFT of a hop-divisible signal is then
    ``sum_j blocks_view_j @ (cos_j, sin_j)`` over shifted reshape views,
    with no framed (T, n_fft) tensor ever materialized."""
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    cos = (win[:, None] * np.cos(ang)).astype(np.float32)
    sin = (win[:, None] * np.sin(ang)).astype(np.float32)
    kb = n_fft // hop
    return (
        tuple(cos[j * hop : (j + 1) * hop] for j in range(kb)),
        tuple(sin[j * hop : (j + 1) * hop] for j in range(kb)),
    )


def _spectrogram_hopblocked(
    xp: jnp.ndarray, n_fft: int, hop: int, matmul_dtype=None
):
    """(..., Lp) padded signal -> (re, im) each (..., T, bins), computed as
    a sum of per-hop-block matmuls over shifted reshape views (no frame
    concat; its backward is pads+adds plus transposed matmuls)."""
    lp = xp.shape[-1]
    n_frames = 1 + (lp - n_fft) // hop
    blocks = xp.reshape(*xp.shape[:-1], lp // hop, hop)
    cos_b, sin_b = _hann_rdft_blocks(n_fft, hop)
    if matmul_dtype is not None:
        # explicit low-precision inputs, f32 accumulation
        acc = functools.partial(jnp.matmul, preferred_element_type=jnp.float32)
    else:
        # honor the FFT layer's precision contract (set_fft_precision):
        # default-precision bf16 MXU passes cost ~50 dB and would silently
        # break the 'float32 for exact evals' mode
        acc = _mm
    re = im = 0.0
    for j in range(n_fft // hop):
        part = blocks[..., j : j + n_frames, :]
        cj, sj = jnp.asarray(cos_b[j]), jnp.asarray(sin_b[j])
        if matmul_dtype is not None:
            part = part.astype(matmul_dtype)
            cj, sj = cj.astype(matmul_dtype), sj.astype(matmul_dtype)
        re = re + acc(part, cj)
        im = im + acc(part, sj)
    return re, im


@functools.lru_cache(maxsize=None)
def _hann_rdft_cat(n_fft: int):
    """Hann-windowed rDFT matrix with cos and sin column-concatenated:
    (n_fft, 2 * (n_fft//2 + 1))."""
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    cos = win[:, None] * np.cos(ang)
    sin = win[:, None] * np.sin(ang)
    return np.concatenate([cos, sin], axis=1).astype(np.float32)


def _spectrogram_phased(
    xp: jnp.ndarray, n_fft: int, hop: int, matmul_dtype=None
):
    """Phase-decimated STFT: (..., Lp) -> (re, im) each (..., T, bins).

    Frames at hop h with length n are the interleave of ``n/h`` phase
    groups, each internally NON-overlapping -- so each group is a pure
    reshape of a shifted signal and its transform is one full-depth
    (t_ph, n) @ (n, 2*bins) matmul.  vs the hop-blocked form (above),
    whose matmuls are only hop-deep: at the MSS loss's small scales
    (n=64..256, hop 16..64) a 16-deep x 33-wide matmul fills a sliver of
    the MXU while this form is 64-deep x 66-wide with identical MACs
    (measured 2.6x on the n=64 scale, scripts/profile_mss.py).  The
    phase outputs interleave back by a stack+reshape of the (small)
    spectra; backward is slices/pads plus the transposed matmuls.
    """
    lp = xp.shape[-1]
    n_frames = 1 + (lp - n_fft) // hop
    k_ph = n_fft // hop
    t_ph = -(-n_frames // k_ph)  # frames per phase group (padded)
    need = (k_ph - 1) * hop + t_ph * n_fft
    if need > lp:
        xp = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(0, need - lp)])
    w = jnp.asarray(_hann_rdft_cat(n_fft))
    if matmul_dtype is not None:
        acc = functools.partial(jnp.matmul, preferred_element_type=jnp.float32)
        w = w.astype(matmul_dtype)
    else:
        acc = _mm
    outs = []
    for p in range(k_ph):
        seg = xp[..., p * hop : p * hop + t_ph * n_fft]
        seg = seg.reshape(*seg.shape[:-1], t_ph, n_fft)
        if matmul_dtype is not None:
            seg = seg.astype(matmul_dtype)
        outs.append(acc(seg, w))
    cat = jnp.stack(outs, axis=-2)  # (..., t_ph, k_ph, 2*bins)
    cat = cat.reshape(*cat.shape[:-3], t_ph * k_ph, cat.shape[-1])
    cat = cat[..., :n_frames, :]
    bins = n_fft // 2 + 1
    return cat[..., :bins], cat[..., bins:]


# STFT implementation switch.  'auto' == 'xla': the fused Pallas STFT
# kernel (ops/pallas/stft.py) was built for the bf16 power-2 training
# configuration and measured SLOWER than this hop-blocked XLA path at
# EVERY MSS scale on the v5e (e.g. n=2048 fwd 0.322 vs 0.287 ms, n=64
# 0.458 vs 0.187; full loss fwd+bwd 3.4 vs 1.8 ms — docs/PERFORMANCE.md
# round 5): XLA pipelines the accumulation dots better than the hand
# kernel, whose lane padding also inflates small-scale MACs (bins 33->128,
# hop 16->128).  'pallas' keeps the kernel selectable for tests and
# future-hardware re-evaluation (interpret mode off-TPU).
_STFT_IMPL = "auto"


def set_stft_impl(impl: str) -> None:
    global _STFT_IMPL
    assert impl in ("auto", "xla", "pallas"), impl
    _STFT_IMPL = impl


def spectrogram(
    x: jnp.ndarray, n_fft: int, hop: int, power: float = 2.0, matmul_dtype=None
) -> jnp.ndarray:
    """torchaudio-convention spectrogram: (..., L) -> (..., n_fft//2+1, T).

    center=True reflect padding, periodic Hann, |rfft|^power, matching
    ``torchaudio.transforms.Spectrogram(n_fft, hop_length=hop)`` as used by
    the reference MSS loss (loss/mss_loss.py:23).  ``matmul_dtype`` casts
    the DFT matmul inputs (float32 accumulation) for loss-grade spectra.
    """
    import jax

    pallas_ok = (
        power == 2.0
        and matmul_dtype == jnp.bfloat16
        and n_fft % hop == 0
        and n_fft <= DIRECT_MAX
    )
    if pallas_ok and _STFT_IMPL == "pallas":
        from ddsp_tpu.ops.pallas.stft import spectrogram_power_pallas

        return spectrogram_power_pallas(
            x, n_fft, hop, interpret=jax.default_backend() != "tpu"
        )
    xp = reflect_pad(x, n_fft // 2)
    if n_fft % hop == 0 and xp.shape[-1] % hop == 0 and n_fft <= DIRECT_MAX:
        re, im = _spectrogram_hopblocked(xp, n_fft, hop, matmul_dtype)
    else:
        frames = frame_signal(xp, n_fft, hop) * hann_window(n_fft, x.dtype)
        # one (frames, n_fft)x(n_fft, bins) matmul pair
        re, im = rfft_pair(frames, matmul_dtype=matmul_dtype)
    if power == 2.0:
        mag = re * re + im * im
    else:
        mag = jnp.sqrt(re * re + im * im)
        if power != 1.0:
            mag = mag**power
    return jnp.moveaxis(mag, -2, -1)


def stft_magnitude_nocenter(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """|STFT| with center=False and a rectangular window, (..., T, n_fft//2+1).

    Matches ``torch.stft(x, n_fft, hop, center=False, window=None)`` used by
    the reference loudness encoder (encoder.py:141-148), which (implicitly)
    applies no window.
    """
    frames = frame_signal(x, n_fft, hop)
    re, im = rfft_pair(frames)
    return jnp.sqrt(re * re + im * im)


@functools.lru_cache(maxsize=None)
def a_weighting(n_fft: int, sample_rate: int, min_db: float = -80.0) -> np.ndarray:
    """A-weighting in dB for rfft bin frequencies, librosa formula.

    Matches ``librosa.A_weighting(np.linspace(0, sr/2, 1+n_fft//2))`` as
    precomputed by the reference loudness encoder (encoder.py:135-139).
    """
    freqs = np.linspace(0, sample_rate / 2, 1 + n_fft // 2, dtype=np.float64)
    f_sq = freqs**2
    const = np.array([12194.217, 20.598997, 107.65265, 737.86223]) ** 2
    with np.errstate(divide="ignore"):
        weights = 2.0 + 20.0 * (
            np.log10(const[0])
            + 2 * np.log10(np.where(f_sq > 0, f_sq, 1.0))
            - np.log10(f_sq + const[0])
            - np.log10(f_sq + const[1])
            - 0.5 * np.log10(f_sq + const[2])
            - 0.5 * np.log10(f_sq + const[3])
        )
        weights = np.where(f_sq > 0, weights, -np.inf)
    return np.maximum(min_db, weights).astype(np.float32)


def a_weighted_loudness(
    x: jnp.ndarray, n_fft: int, hop: int, sample_rate: int
) -> jnp.ndarray:
    """Per-frame A-weighted loudness in [~0, ~1], (..., T, 1).

    dB of rectangular-window STFT magnitudes + A-weighting, mapped by
    ``db/90 + 1`` (-90 dB floor -> 0), mean over frequency bins.  Matches the
    reference ``LoudnessEncoder.forward`` (encoder.py:141-156).
    """
    mag = stft_magnitude_nocenter(x, n_fft, hop)
    db = 20.0 * jnp.log10(mag + 1e-20)
    db = db + jnp.asarray(a_weighting(n_fft, sample_rate))
    mapped = db / 90.0 + 1.0
    return jnp.mean(mapped, axis=-1, keepdims=True)
