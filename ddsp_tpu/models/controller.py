"""Neural control network (decoder net) mapping (f0, loudness) -> synth controls.

Parity target: reference Controller/Decoder (model/autoencoder/decoder.py:
41-147): two input MLPs -> GRU -> post-MLP -> three dense heads through a
``modified_sigmoid``; the decoder wires the controls into the oscillator
bank + filtered noise + reverb.

Fixes inherited-by-design from SURVEY.md section 2:
* the streaming path returns the *advanced* GRU hidden state (the reference
  returns the stale input state, decoder.py:106-107);
* model code has no dependency on the trainer (the reference's autoencoder
  imports its decoder from train.train).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models import nn
from ddsp_tpu.models.synths import (
    noise_apply,
    oscillator_apply,
    reverb_apply,
    reverb_init,
)


def modified_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """2 * sigmoid(x)^log(10) + 1e-7 (reference decoder.py:110-116)."""
    return 2.0 * jax.nn.sigmoid(x) ** 2.3026 + 1e-7


def controller_init(key: jax.Array, conf: Config) -> Dict:
    k = jax.random.split(key, 7)
    units, layers = conf.decoder_mlp_units, conf.decoder_mlp_layers
    return {
        "mlp_f0": nn.mlp_init(k[0], 1, units, layers),
        "mlp_loudness": nn.mlp_init(k[1], 1, units, layers),
        "gru": nn.gru_init(
            k[2], 2 * units, conf.decoder_gru_units, conf.decoder_gru_layers
        ),
        "mlp_gru": nn.mlp_init(
            k[3], conf.decoder_gru_units + 2 * units, units, layers
        ),
        "dense_harmonic": nn.dense_init(k[4], units, conf.n_harmonics),
        "dense_loudness": nn.dense_init(k[5], units, 1),
        "dense_filter": nn.dense_init(k[6], units, conf.n_noise_filters),
    }


def controller_apply(
    params: Dict,
    batch: Dict[str, jnp.ndarray],
    hidden: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Map features to synthesis controls.

    Args:
      batch: {'normalized_cents': (B,T,1), 'loudness': (B,T,1), 'f0': (B,T,1)}.
      hidden: optional (n_layers, B, H) GRU state for streaming.

    Returns:
      (controls {f0, c, a, H}, new hidden state).
    """
    f0 = batch["normalized_cents"]
    loudness = batch["loudness"]

    latent_f0 = nn.mlp_apply(params["mlp_f0"], f0, dtype=compute_dtype)
    latent_loud = nn.mlp_apply(params["mlp_loudness"], loudness, dtype=compute_dtype)
    latent = jnp.concatenate([latent_f0, latent_loud], axis=-1)

    latent, new_hidden = nn.gru_apply(params["gru"], latent, hidden)

    latent = jnp.concatenate([latent, latent_f0, latent_loud], axis=-1)
    latent = nn.mlp_apply(params["mlp_gru"], latent, dtype=compute_dtype)

    harm_amps = modified_sigmoid(nn.dense_apply(params["dense_harmonic"], latent))
    total_amp = modified_sigmoid(nn.dense_apply(params["dense_loudness"], latent))
    noise_mags = modified_sigmoid(nn.dense_apply(params["dense_filter"], latent))

    controls = {
        "f0": batch["f0"],
        "c": harm_amps.astype(jnp.float32),
        "a": total_amp.astype(jnp.float32),
        "H": noise_mags.astype(jnp.float32),
    }
    return controls, new_hidden


def decoder_init(key: jax.Array, conf: Config) -> Dict:
    kc, kr = jax.random.split(key)
    return {
        "controller": controller_init(kc, conf),
        "reverb": reverb_init(kr, conf),
    }


def decoder_apply(
    params: Dict,
    batch: Dict[str, jnp.ndarray],
    conf: Config,
    noise_key: jax.Array,
    frame_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Full offline decode: controls -> harmonics + noise -> reverb.

    Matches reference Decoder.forward (decoder.py:127-135).  Returns
    (B, T*hop) audio.
    """
    dtype = jnp.dtype(conf.compute_dtype) if conf.compute_dtype != "float32" else None
    # named scopes label each synth stage in jax.profiler traces
    with jax.named_scope("controller"):
        controls, _ = controller_apply(
            params["controller"], batch, compute_dtype=dtype
        )
    with jax.named_scope("oscillator_bank"):
        harm, _ = oscillator_apply(controls, conf, frame_chunk=frame_chunk)
    with jax.named_scope("filtered_noise"):
        noise = noise_apply(controls, conf, noise_key)
    signal = harm + noise
    with jax.named_scope("reverb"):
        return reverb_apply(params["reverb"], signal, conf)


def decoder_synth_only(
    params: Dict,
    batch: Dict[str, jnp.ndarray],
    conf: Config,
    noise_key: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """Decode returning the pre- and post-reverb signals (for analysis)."""
    dtype = jnp.dtype(conf.compute_dtype) if conf.compute_dtype != "float32" else None
    controls, _ = controller_apply(params["controller"], batch, compute_dtype=dtype)
    harm, phase = oscillator_apply(controls, conf)
    noise = noise_apply(controls, conf, noise_key)
    dry = harm + noise
    return {
        "audio_harmonic": harm,
        "audio_noise": noise,
        "audio_synth": dry,
        "audio_reverb": reverb_apply(params["reverb"], dry, conf),
        "controls": controls,
    }
