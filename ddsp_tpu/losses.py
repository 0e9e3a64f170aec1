"""Multi-scale spectral (MSS) reconstruction loss.

Behavioral parity target: reference loss/mss_loss.py:11-68 --
per-scale loss = L1(|S|^2) + alpha * L1(log2(|S|^2 + eps)) with
torchaudio-Spectrogram conventions (power-2 magnitudes, hop = n_fft * (1 -
overlap), centered reflect padding, periodic Hann), summed over FFT sizes.

Functional: ``mss_loss(pred, true, ffts=...)``; also returns per-scale terms
for metrics.  Differentiable end-to-end; all framing/FFT work runs on TPU.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

from ddsp_tpu.ops.spectral import spectrogram

DEFAULT_FFTS: Tuple[int, ...] = (2048, 1024, 512, 256, 128, 64)


def _as_audio(x, signal_key: str) -> jnp.ndarray:
    """Reference MSSLoss dict-input convention (loss/mss_loss.py:57-62):
    prediction dicts are read at ``signal_key`` ('audio_reverb' when
    use_reverb else 'audio_synth'), target dicts at 'audio'."""
    return x[signal_key] if isinstance(x, dict) else x


def sss_loss(
    pred: jnp.ndarray,
    true: jnp.ndarray,
    n_fft: int,
    alpha: float = 1.0,
    overlap: float = 0.75,
    eps: float = 1e-7,
    matmul_dtype=None,
) -> jnp.ndarray:
    """Single-scale spectral loss (reference loss/mss_loss.py:11-33).

    ``matmul_dtype=jnp.bfloat16`` runs the STFT matmuls at 2x MXU rate with
    float32 accumulation -- the training-path default (Config
    .loss_matmul_dtype), numerically in the spirit of the reference's fp16
    AMP training (train/train.py:50); leave None for exact-parity evals.
    """
    hop = int(n_fft * (1 - overlap))
    s_pred = spectrogram(pred, n_fft, hop, matmul_dtype=matmul_dtype)
    s_true = spectrogram(true, n_fft, hop, matmul_dtype=matmul_dtype)
    linear_term = jnp.mean(jnp.abs(s_pred - s_true))
    log_term = jnp.mean(
        jnp.abs(jnp.log2(s_true + eps) - jnp.log2(s_pred + eps))
    )
    return linear_term + alpha * log_term


def mss_loss(
    pred: jnp.ndarray,
    true: jnp.ndarray,
    ffts: Sequence[int] = DEFAULT_FFTS,
    alpha: float = 1.0,
    overlap: float = 0.75,
    eps: float = 1e-7,
    matmul_dtype=None,
    use_reverb: bool = True,
) -> jnp.ndarray:
    """Multi-scale spectral loss (reference loss/mss_loss.py:36-68).

    ``pred`` / ``true`` may be dicts (e.g. from ``decoder_synth_only``): the
    prediction is read at 'audio_reverb' (or 'audio_synth' when
    ``use_reverb=False``), the target at 'audio' -- the reference's
    MSSLoss dict convention.
    """
    pred = _as_audio(pred, "audio_reverb" if use_reverb else "audio_synth")
    true = _as_audio(true, "audio")
    return sum(
        sss_loss(pred, true, n, alpha, overlap, eps, matmul_dtype) for n in ffts
    )


def mss_loss_per_scale(
    pred: jnp.ndarray,
    true: jnp.ndarray,
    ffts: Sequence[int] = DEFAULT_FFTS,
    alpha: float = 1.0,
    overlap: float = 0.75,
    eps: float = 1e-7,
    matmul_dtype=None,
) -> Dict[str, jnp.ndarray]:
    """Per-scale loss terms, for structured training metrics."""
    return {
        f"mss_{n}": sss_loss(pred, true, n, alpha, overlap, eps, matmul_dtype)
        for n in ffts
    }


# --- cached-target variant ---------------------------------------------------
# The target audio of a training set is fixed, so its spectrograms are
# dataset constants; recomputing the 6 target-side STFTs every step wastes
# ~10% of the train step.  Precompute them once (target_spectrograms),
# gather rows per batch, and evaluate the loss against the cached mags.

def target_mag_key(n_fft: int) -> str:
    return f"mss_target_mag_{n_fft}"


def target_spectrograms(
    true: jnp.ndarray,
    ffts: Sequence[int] = DEFAULT_FFTS,
    overlap: float = 0.75,
    matmul_dtype=None,
) -> Dict[str, jnp.ndarray]:
    """Per-scale power spectrograms of the (fixed) target audio."""
    return {
        target_mag_key(n): spectrogram(
            true, n, int(n * (1 - overlap)), matmul_dtype=matmul_dtype
        )
        for n in ffts
    }


def mss_loss_per_scale_cached(
    pred: jnp.ndarray,
    target_mags: Dict[str, jnp.ndarray],
    ffts: Sequence[int] = DEFAULT_FFTS,
    alpha: float = 1.0,
    overlap: float = 0.75,
    eps: float = 1e-7,
    matmul_dtype=None,
) -> Dict[str, jnp.ndarray]:
    """Per-scale loss terms against precomputed target spectrograms.

    Identical math to :func:`mss_loss_per_scale` when ``target_mags`` was
    built by :func:`target_spectrograms` with the same fft/overlap/dtype
    settings (tested in tests/test_spectral.py).
    """
    out = {}
    for n in ffts:
        hop = int(n * (1 - overlap))
        s_pred = spectrogram(pred, n, hop, matmul_dtype=matmul_dtype)
        s_true = target_mags[target_mag_key(n)]
        linear_term = jnp.mean(jnp.abs(s_pred - s_true))
        log_term = jnp.mean(
            jnp.abs(jnp.log2(s_true + eps) - jnp.log2(s_pred + eps))
        )
        out[f"mss_{n}"] = linear_term + alpha * log_term
    return out
