"""Autoencoder facade: analysis (encoder) -> synthesis (decoder).

Parity target: reference model/autoencoder/autoencoder.py:9-32 -- pad the
input by ``n_fft - hop`` split half/half so encoder frames x hop equals the
example length (the 172-frame / 88,064-sample contract, SURVEY.md section
3.3), then decode.  Unlike the reference, model code has no trainer import
and no hardcoded device placement.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import decoder_apply, decoder_init
from ddsp_tpu.models.crepe import crepe_init, load_torch_checkpoint
from ddsp_tpu.models.encoder import encoder_apply


def feature_pad(audio: jnp.ndarray, conf: Config) -> jnp.ndarray:
    """Zero-pad (B, L) audio by (n_fft - hop)/2 on each side (autoencoder.py:17-18)."""
    padding = conf.n_fft - conf.hop_length
    cfg = [(0, 0)] * (audio.ndim - 1) + [(padding // 2, padding - padding // 2)]
    return jnp.pad(audio, cfg)


def autoencoder_init(
    key: jax.Array, conf: Config, crepe_checkpoint: Optional[str] = None
) -> Dict:
    """Init decoder params and load/init CREPE weights."""
    kd, kc = jax.random.split(key)
    crepe = (
        load_torch_checkpoint(crepe_checkpoint)
        if crepe_checkpoint
        else crepe_init(kc, conf.crepe_capacity)
    )
    return {"decoder": decoder_init(kd, conf), "crepe": crepe}


def encode(
    params: Dict, audio: jnp.ndarray, conf: Config, freeze_crepe: bool = True
) -> Dict[str, jnp.ndarray]:
    """(B, L) audio -> feature dict at frame rate (with the contract padding).

    ``freeze_crepe=False`` lets gradients flow into the CREPE weights
    (analysis-by-synthesis finetuning, training/trainer.make_finetune_step;
    the reference only comments on this option, encoder.py:32-34).
    """
    return encoder_apply(
        params["crepe"], feature_pad(audio, conf), conf, freeze_crepe
    )


def autoencoder_apply(
    params: Dict,
    audio: jnp.ndarray,
    conf: Config,
    noise_key: jax.Array,
    freeze_crepe: bool = True,
) -> jnp.ndarray:
    """Reconstruct audio: encode -> decode (autoencoder.py:17-22)."""
    features = encode(params, audio, conf, freeze_crepe)
    return decoder_apply(params["decoder"], features, conf, noise_key)
