"""Import reference PyTorch checkpoints into ddsp_tpu param pytrees.

Parity target: reference rt/utils.py:7-24, which globs
``lightning_logs/version_N/checkpoints/*.ckpt``, picks the newest by parsing
the epoch out of the filename, and strips the ``model.`` prefix so the bare
Decoder can load it.  Here: an explicit converter from that state-dict
layout (Decoder = Controller + OscillatorBank + FilteredNoise + Reverb,
reference model/autoencoder/decoder.py:119-135) to our
{'controller': ..., 'reverb': ...} pytree.  CREPE conversion lives in
models/crepe.py.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict

import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def decoder_params_from_state_dict(sd: Dict, conf) -> Dict:
    """Torch Decoder state dict -> ddsp_tpu decoder param pytree."""
    get = lambda k: jnp.asarray(_np(sd[k]))

    def mlp(prefix: str, n_layers: int):
        layers = []
        for i in range(1, n_layers + 1):
            layers.append(
                {
                    "dense": {
                        "weight": get(f"{prefix}.mlp_layer{i}.0.weight"),
                        "bias": get(f"{prefix}.mlp_layer{i}.0.bias"),
                    },
                    "norm": {
                        "weight": get(f"{prefix}.mlp_layer{i}.1.weight"),
                        "bias": get(f"{prefix}.mlp_layer{i}.1.bias"),
                    },
                }
            )
        return {"layers": layers}

    nl = conf.decoder_mlp_layers
    gru_layers = []
    li = 0
    while f"controller.gru.weight_ih_l{li}" in sd:
        gru_layers.append(
            {
                "w_ih": get(f"controller.gru.weight_ih_l{li}"),
                "w_hh": get(f"controller.gru.weight_hh_l{li}"),
                "b_ih": get(f"controller.gru.bias_ih_l{li}"),
                "b_hh": get(f"controller.gru.bias_hh_l{li}"),
            }
        )
        li += 1

    controller = {
        "mlp_f0": mlp("controller.mlp_f0", nl),
        "mlp_loudness": mlp("controller.mlp_loudness", nl),
        "gru": {"layers": gru_layers},
        "mlp_gru": mlp("controller.mlp_gru", nl),
        "dense_harmonic": {
            "weight": get("controller.dense_harmonic.weight"),
            "bias": get("controller.dense_harmonic.bias"),
        },
        "dense_loudness": {
            "weight": get("controller.dense_loudness.weight"),
            "bias": get("controller.dense_loudness.bias"),
        },
        "dense_filter": {
            "weight": get("controller.dense_filter.weight"),
            "bias": get("controller.dense_filter.bias"),
        },
    }
    reverb = {
        "noise": get("reverb.noise"),
        "decay": get("reverb.decay"),
        "wet": get("reverb.wet"),
    }
    return {"controller": controller, "reverb": reverb}


def load_lightning_decoder(path: str, conf) -> Dict:
    """Load a Lightning ``.ckpt`` (or bare Decoder state dict) file.

    Strips the training module's ``model.`` prefix like the reference
    (rt/utils.py:18-23).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    stripped = {}
    for k, v in sd.items():
        stripped[k[6:] if k.startswith("model.") else k] = v
    return decoder_params_from_state_dict(stripped, conf)


def find_latest_lightning_checkpoint(logs_dir: str, version: int) -> str:
    """Newest ``*.ckpt`` under lightning_logs/version_N/checkpoints, by the
    epoch number parsed from the filename (reference rt/utils.py:8-16)."""
    pattern = os.path.join(logs_dir, f"version_{version}", "checkpoints", "*.ckpt")
    files = glob.glob(pattern)
    if not files:
        raise FileNotFoundError(pattern)

    def epoch_of(f):
        m = re.search(r"epoch=(\d+)", os.path.basename(f))
        return int(m.group(1)) if m else -1

    return max(files, key=epoch_of)
