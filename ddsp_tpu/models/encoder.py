"""Feature encoders: CREPE f0 + A-weighted loudness.

Parity target: reference model/autoencoder/encoder.py:13-177.

* F0 encoder: resample 44.1k -> 16k, per-example mean/std normalize
  (unbiased std like torch), derive the aligned CREPE hop
  ``int(hop * (resampled_len - 1024) / (orig_len - n_fft))`` so that the
  CREPE frame count matches the STFT frame count (the 172-frame contract),
  run frozen CREPE over unfolded 1024-sample windows, argmax pitch decode.
* Loudness encoder: rectangular-window STFT dB + A-weighting, -90 dB floor
  mapping, mean over bins.

All pure functions; CREPE weights are stop-gradiented by default (the
reference freezes them, encoder.py:35-37) with an opt-out for
analysis-by-synthesis finetuning.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models.crepe import (
    crepe_forward,
    pitch_argmax,
    pitch_centered_ref,
    pitch_weighted,
)
from ddsp_tpu.ops.resample import resample
from ddsp_tpu.ops.spectral import a_weighted_loudness, frame_signal


def crepe_frame_hop(orig_len: int, resampled_len: int, conf: Config) -> int:
    """Aligned hop at 16 kHz so CREPE frames == STFT frames (encoder.py:66-68).

    Guards the degenerate lengths the reference divides by unchecked:
    ``orig_len`` must exceed ``n_fft`` (else the aligned-hop formula divides
    by <= 0) and the resampled audio must hold at least one CREPE window.
    """
    if orig_len <= conf.n_fft:
        raise ValueError(
            f"audio too short for the f0 encoder: {orig_len} samples <= "
            f"n_fft={conf.n_fft} (the 172-frame contract needs > n_fft; "
            "pad inputs with models.autoencoder.feature_pad)"
        )
    if resampled_len < conf.crepe_window:
        raise ValueError(
            f"resampled audio ({resampled_len} samples) shorter than the "
            f"CREPE window ({conf.crepe_window})"
        )
    hop = int(
        conf.hop_length * (resampled_len - conf.crepe_window) / (orig_len - conf.n_fft)
    )
    if hop < 1:
        # e.g. resampled_len == crepe_window exactly: the formula floors to
        # 0 and downstream framing would divide by it.
        raise ValueError(
            f"audio too short for the f0 encoder: the aligned CREPE hop "
            f"is {hop} (< 1) at {orig_len} samples; pad inputs with "
            "models.autoencoder.feature_pad"
        )
    return hop


def f0_encoder_apply(
    crepe_params: Dict,
    audio: jnp.ndarray,
    conf: Config,
    freeze_crepe: bool = True,
) -> Dict[str, jnp.ndarray]:
    """(B, L) audio -> f0 features at the STFT frame rate.

    Returns {'f0', 'harmonicity', 'probabilities', 'normalized_cents'}.
    """
    if freeze_crepe:
        crepe_params = jax.lax.stop_gradient(crepe_params)
    orig_len = audio.shape[-1]
    x = resample(audio, conf.sample_rate, conf.crepe_sample_rate)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    std = jnp.std(x, axis=-1, keepdims=True, ddof=1)  # torch unbiased std
    # Epsilon keeps a digitally-silent example finite (the reference
    # divides by a raw std, encoder.py:59-60, and NaN-poisons training on
    # silence); matches the streaming path (runtime/streaming.py).
    x = (x - mean) / (std + 1e-8)

    hop = crepe_frame_hop(orig_len, x.shape[-1], conf)
    frames = frame_signal(x, conf.crepe_window, hop)  # (B, T, 1024)
    b, t, w = frames.shape
    cdtype = (
        None
        if conf.crepe_compute_dtype == "float32"
        else jnp.dtype(conf.crepe_compute_dtype)
    )
    probs = crepe_forward(
        crepe_params,
        frames.reshape(b * t, w),
        compute_dtype=cdtype,
        layout=getattr(conf, "crepe_layout", "nlc"),
    )
    probs = probs.reshape(b, t, -1)

    decoders = {
        "argmax": pitch_argmax,
        "weighted": pitch_weighted,
        "centered_ref": pitch_centered_ref,  # bug-compatible A/B variant
    }
    if conf.pitch_decode not in decoders:
        raise ValueError(
            f"unknown pitch_decode {conf.pitch_decode!r}: expected one of "
            f"{sorted(decoders)}"
        )
    decode = decoders[conf.pitch_decode]
    freq, harmonicity, normalized_cents = decode(probs)
    return {
        "f0": freq,
        "harmonicity": harmonicity,
        "probabilities": probs,
        "normalized_cents": normalized_cents,
    }


def loudness_encoder_apply(audio: jnp.ndarray, conf: Config) -> jnp.ndarray:
    """(B, L) audio -> (B, T, 1) A-weighted loudness (encoder.py:131-156)."""
    return a_weighted_loudness(audio, conf.n_fft, conf.hop_length, conf.sample_rate)


def encoder_apply(
    crepe_params: Dict, audio: jnp.ndarray, conf: Config, freeze_crepe: bool = True
) -> Dict[str, jnp.ndarray]:
    """Joint feature dict (reference Encoder.forward, encoder.py:159-177)."""
    result = f0_encoder_apply(crepe_params, audio, conf, freeze_crepe)
    result["loudness"] = loudness_encoder_apply(audio, conf)
    return result
