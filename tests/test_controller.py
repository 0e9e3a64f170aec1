"""Controller/decoder net: golden test vs reference torch modules.

Strategy: initialize the JAX params, copy them INTO a freshly-built reference
torch Controller, run both on the same features, compare outputs.  This
verifies the MLP/GRU/head wiring and modified_sigmoid bit-for-bit-ish, and
that reference checkpoints are losslessly importable (same parameterization).
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import (
    controller_apply,
    controller_init,
    modified_sigmoid,
)
from ddsp_tpu.models import nn

CONF = Config(
    decoder_mlp_units=32,
    decoder_mlp_layers=2,
    decoder_gru_units=32,
    n_harmonics=12,
    n_noise_filters=9,
)


def _torch_conf():
    return types.SimpleNamespace(
        decoder_mlp_units=CONF.decoder_mlp_units,
        decoder_mlp_layers=CONF.decoder_mlp_layers,
        decoder_gru_units=CONF.decoder_gru_units,
        decoder_gru_layers=CONF.decoder_gru_layers,
        n_harmonics=CONF.n_harmonics,
        n_noise_filters=CONF.n_noise_filters,
        sample_rate=CONF.sample_rate,
        hop_length=CONF.hop_length,
    )


def _copy_params_to_torch(params, t_ctrl):
    """Install JAX params into the reference torch Controller in-place."""

    def t(x):
        return torch.from_numpy(np.asarray(x))

    with torch.no_grad():
        for name in ["mlp_f0", "mlp_loudness", "mlp_gru"]:
            t_mlp = getattr(t_ctrl, name)
            for i, layer in enumerate(params[name]["layers"], start=1):
                seq = getattr(t_mlp, f"mlp_layer{i}")
                seq[0].weight.copy_(t(layer["dense"]["weight"]))
                seq[0].bias.copy_(t(layer["dense"]["bias"]))
                seq[1].weight.copy_(t(layer["norm"]["weight"]))
                seq[1].bias.copy_(t(layer["norm"]["bias"]))
        for li, lp in enumerate(params["gru"]["layers"]):
            getattr(t_ctrl.gru, f"weight_ih_l{li}").copy_(t(lp["w_ih"]))
            getattr(t_ctrl.gru, f"weight_hh_l{li}").copy_(t(lp["w_hh"]))
            getattr(t_ctrl.gru, f"bias_ih_l{li}").copy_(t(lp["b_ih"]))
            getattr(t_ctrl.gru, f"bias_hh_l{li}").copy_(t(lp["b_hh"]))
        for name in ["dense_harmonic", "dense_loudness", "dense_filter"]:
            getattr(t_ctrl, name).weight.copy_(t(params[name]["weight"]))
            getattr(t_ctrl, name).bias.copy_(t(params[name]["bias"]))


@pytest.fixture
def torch_controller(reference_path):
    from model.autoencoder.decoder import Controller

    return Controller(_torch_conf()).eval()


def _batch(b=2, t=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "f0": rng.uniform(100, 800, (b, t, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "loudness": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
    }


def test_controller_matches_reference(torch_controller):
    params = controller_init(jax.random.PRNGKey(0), CONF)
    _copy_params_to_torch(params, torch_controller)
    batch = _batch()
    controls, hidden = controller_apply(params, batch)
    with torch.no_grad():
        ref = torch_controller({k: torch.from_numpy(v) for k, v in batch.items()})
    np.testing.assert_allclose(np.asarray(controls["c"]), ref["c"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(controls["a"]), ref["a"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(controls["H"]), ref["H"].numpy(), atol=2e-5)
    # our hidden is (layers, B, H); torch returns (layers, B, H) too
    np.testing.assert_allclose(
        np.asarray(hidden), ref["hidden"].detach().numpy(), atol=2e-5
    )


def test_stateful_hidden_advances():
    """Two-block streaming must continue the GRU state (the reference's live
    path returns the stale hidden, SURVEY.md section 2 -- fixed here)."""
    params = controller_init(jax.random.PRNGKey(1), CONF)
    batch = _batch(b=1, t=8, seed=3)
    full_controls, full_h = controller_apply(params, batch)

    first = {k: v[:, :5] for k, v in batch.items()}
    second = {k: v[:, 5:] for k, v in batch.items()}
    c1, h1 = controller_apply(params, first)
    c2, h2 = controller_apply(params, second, hidden=h1)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(full_h), atol=1e-5)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(c1["c"]), np.asarray(c2["c"])], axis=1),
        np.asarray(full_controls["c"]),
        atol=1e-5,
    )


def test_modified_sigmoid_range():
    x = jnp.linspace(-20, 20, 100)
    y = np.asarray(modified_sigmoid(x))
    assert y.min() >= 1e-7
    assert y.max() <= 2.0 + 1e-6
    assert np.all(np.diff(y) >= 0)


def test_param_count_matches_reference(reference_path):
    """Full-scale controller must have exactly the reference's param count."""
    from model.autoencoder.decoder import Controller

    params = controller_init(jax.random.PRNGKey(0), Config())
    n = nn.count_params(params)
    t_conf = types.SimpleNamespace(
        decoder_mlp_units=512,
        decoder_mlp_layers=3,
        decoder_gru_units=512,
        decoder_gru_layers=1,
        n_harmonics=180,
        n_noise_filters=195,
    )
    want = sum(p.numel() for p in Controller(t_conf).parameters())
    assert n == want, (n, want)
