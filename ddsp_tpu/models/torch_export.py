"""Export ddsp_tpu decoder params back to the reference's torch layout.

Exact inverse of :mod:`ddsp_tpu.models.torch_import`: a decoder pytree
trained here becomes a state dict the reference's ``Decoder``
(reference model/autoencoder/decoder.py:119-135) loads with
``strict=True``, or a Lightning-style ``.ckpt`` blob that the reference's
``rt/utils.load_checkpoint`` (reference rt/utils.py:7-24) accepts (keys
under ``state_dict`` with the training module's ``model.`` prefix).

Because the framework keeps the torch parameterization everywhere
((out, in) weight layout, GRU r/z/n gate order, two bias vectors — see
CLAUDE.md conventions), the export is a pure re-keying: no transposes and
no numerical change, so import(export(p)) == p bit-for-bit (tested in
tests/test_torch_export.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _tensor(x):
    import torch

    return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())


def state_dict_from_decoder_params(params: Dict, conf) -> Dict:
    """ddsp_tpu decoder pytree -> reference Decoder ``state_dict``.

    Inverse of torch_import.decoder_params_from_state_dict: emits exactly
    the keys the reference Decoder registers (controller MLP stacks as
    ``mlp_layer{i}.{0,1}``, GRU ``weight_ih_l{k}``-style parameters, the
    three dense heads, and the reverb's noise/decay/wet leaves).
    """
    ctrl = params["controller"]
    sd: Dict = {}

    def put_mlp(prefix: str, mlp: Dict) -> None:
        for i, layer in enumerate(mlp["layers"], start=1):
            sd[f"{prefix}.mlp_layer{i}.0.weight"] = _tensor(layer["dense"]["weight"])
            sd[f"{prefix}.mlp_layer{i}.0.bias"] = _tensor(layer["dense"]["bias"])
            sd[f"{prefix}.mlp_layer{i}.1.weight"] = _tensor(layer["norm"]["weight"])
            sd[f"{prefix}.mlp_layer{i}.1.bias"] = _tensor(layer["norm"]["bias"])

    put_mlp("controller.mlp_f0", ctrl["mlp_f0"])
    put_mlp("controller.mlp_loudness", ctrl["mlp_loudness"])
    for li, layer in enumerate(ctrl["gru"]["layers"]):
        sd[f"controller.gru.weight_ih_l{li}"] = _tensor(layer["w_ih"])
        sd[f"controller.gru.weight_hh_l{li}"] = _tensor(layer["w_hh"])
        sd[f"controller.gru.bias_ih_l{li}"] = _tensor(layer["b_ih"])
        sd[f"controller.gru.bias_hh_l{li}"] = _tensor(layer["b_hh"])
    put_mlp("controller.mlp_gru", ctrl["mlp_gru"])
    for head in ("dense_harmonic", "dense_loudness", "dense_filter"):
        sd[f"controller.{head}.weight"] = _tensor(ctrl[head]["weight"])
        sd[f"controller.{head}.bias"] = _tensor(ctrl[head]["bias"])
    sd["reverb.noise"] = _tensor(params["reverb"]["noise"])
    sd["reverb.decay"] = _tensor(params["reverb"]["decay"])
    sd["reverb.wet"] = _tensor(params["reverb"]["wet"])

    # Non-learned parameters the reference Decoder registers (so
    # strict=True loads succeed): the oscillator's harmonic numbers and
    # streaming-phase state (reference harmonic_oscillator.py:15-21, int64)
    # and the reverb's time ramp + live ring buffer (reference
    # reverb.py:19-22).
    import torch

    n_h = int(conf.n_harmonics)
    sd["harmonics.harmonics"] = torch.arange(1, n_h + 1, step=1)
    sd["harmonics.last_phases"] = torch.zeros(n_h, dtype=torch.int64)
    length = int(np.asarray(params["reverb"]["noise"]).shape[-1])
    if length != int(conf.sample_rate):
        import warnings

        warnings.warn(
            f"reverb IR length {length} != sample_rate {conf.sample_rate}: "
            "the reference Reverb hardwires a 1 s (sample_rate-tap) IR "
            "(reference model/ddsp/reverb.py:10-22), so its Decoder will "
            "fail a strict=True load of this checkpoint",
            stacklevel=2,
        )
    sd["reverb.t"] = (torch.arange(length) / conf.sample_rate).reshape(1, -1)
    sd["reverb.buffer"] = torch.zeros(1, length)
    return sd


def save_torch_decoder(
    params: Dict, conf, path: str, lightning: bool = True, step: int = 0
) -> None:
    """Write decoder params as a torch checkpoint file.

    ``lightning=True`` wraps the state dict the way the reference's
    training module saves it (``{'state_dict': {'model.' + k: v}}``), so
    both the reference's ``rt/utils.load_checkpoint`` and our own
    ``torch_import.load_lightning_decoder`` read it; ``lightning=False``
    writes the bare Decoder state dict.
    """
    import torch

    sd = state_dict_from_decoder_params(params, conf)
    if lightning:
        blob = {
            "state_dict": {"model." + k: v for k, v in sd.items()},
            "epoch": int(step),
            "global_step": int(step),
        }
    else:
        blob = sd
    torch.save(blob, path)
