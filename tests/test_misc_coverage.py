"""Coverage for less-traveled configurations: stacked GRU, bf16 compute,
CREPE 'full' capacity, frame-chunked training memory path."""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models import nn
from ddsp_tpu.models.controller import decoder_apply, decoder_init
from ddsp_tpu.models.crepe import CAPACITIES, crepe_forward, crepe_init


def test_stacked_gru_matches_torch():
    """decoder_gru_layers=2: our stacked scan vs torch.nn.GRU(num_layers=2)."""
    torch.manual_seed(0)
    n_in, n_h, layers, b, t = 6, 10, 2, 3, 7
    params = nn.gru_init(jax.random.PRNGKey(0), n_in, n_h, layers)
    t_gru = torch.nn.GRU(n_in, n_h, num_layers=layers, batch_first=True)
    with torch.no_grad():
        for li, lp in enumerate(params["layers"]):
            getattr(t_gru, f"weight_ih_l{li}").copy_(torch.from_numpy(np.asarray(lp["w_ih"])))
            getattr(t_gru, f"weight_hh_l{li}").copy_(torch.from_numpy(np.asarray(lp["w_hh"])))
            getattr(t_gru, f"bias_ih_l{li}").copy_(torch.from_numpy(np.asarray(lp["b_ih"])))
            getattr(t_gru, f"bias_hh_l{li}").copy_(torch.from_numpy(np.asarray(lp["b_hh"])))
    x = np.random.default_rng(0).standard_normal((b, t, n_in)).astype(np.float32)
    h0 = np.random.default_rng(1).standard_normal((layers, b, n_h)).astype(np.float32)
    ys, hT = nn.gru_apply(params, jnp.asarray(x), jnp.asarray(h0))
    with torch.no_grad():
        t_ys, t_hT = t_gru(torch.from_numpy(x), torch.from_numpy(h0))
    np.testing.assert_allclose(np.asarray(ys), t_ys.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hT), t_hT.numpy(), atol=2e-5)


def test_bfloat16_compute_dtype():
    """compute_dtype='bfloat16': neural matmuls in bf16, synth stays f32."""
    conf = Config(
        sample_rate=4000,
        n_fft=256,
        hop_length=64,
        n_harmonics=8,
        n_noise_filters=9,
        decoder_mlp_units=16,
        decoder_mlp_layers=1,
        decoder_gru_units=16,
        reverb_length=128,
        compute_dtype="bfloat16",
    )
    params = decoder_init(jax.random.PRNGKey(0), conf)
    rng = np.random.default_rng(0)
    batch = {
        "f0": rng.uniform(100, 400, (1, 8, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (1, 8, 1)).astype(np.float32),
        "loudness": rng.uniform(0, 1, (1, 8, 1)).astype(np.float32),
    }
    out = decoder_apply(params, batch, conf, jax.random.PRNGKey(1))
    assert out.dtype == jnp.float32  # audio path stays f32
    assert np.isfinite(np.asarray(out)).all()
    # close to the f32 path (bf16 matmuls only)
    conf32 = conf.replace(compute_dtype="float32")
    out32 = decoder_apply(params, batch, conf32, jax.random.PRNGKey(1))
    rel = np.abs(np.asarray(out) - np.asarray(out32)).max() / (
        np.abs(np.asarray(out32)).max() + 1e-9
    )
    assert rel < 0.2, rel
    # and the bf16 path must actually engage: identical outputs would mean
    # compute_dtype was silently dropped
    assert rel > 0.0, "bfloat16 output identical to f32 - flag ignored?"


def test_crepe_full_capacity_architecture():
    """'full' capacity: correct feature width and output shape (weights for
    'full' are externally supplied; architecture must match crepe/crepe.py)."""
    params = crepe_init(jax.random.PRNGKey(0), "full")
    assert params["classifier"]["weight"].shape == (360, CAPACITIES["full"]["in_features"])
    frames = np.random.default_rng(0).standard_normal((2, 1024)).astype(np.float32)
    probs = crepe_forward(params, frames)
    assert probs.shape == (2, 360)
    assert np.isfinite(np.asarray(probs)).all()
    assert (np.asarray(probs) >= 0).all() and (np.asarray(probs) <= 1).all()


def test_frame_chunked_training_gradients():
    """frame_chunk rematerialization path is differentiable and matches."""
    from ddsp_tpu.ops.oscillator import oscillator_bank

    sr, hop = 4000, 32
    rng = np.random.default_rng(0)
    f0 = rng.uniform(80, 400, (1, 16, 1)).astype(np.float32)
    amps = rng.uniform(0.01, 1, (1, 16, 8)).astype(np.float32)
    loud = rng.uniform(0, 1, (1, 16, 1)).astype(np.float32)

    def loss(a, chunk):
        out, _ = oscillator_bank(
            f0, a, loud, sample_rate=sr, hop=hop, frame_chunk=chunk
        )
        return jnp.sum(out**2)

    g_full = jax.grad(lambda a: loss(a, None))(amps)
    g_chunk = jax.grad(lambda a: loss(a, 4))(amps)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_chunk), rtol=1e-3, atol=1e-4)


def test_train_step_bound_composition():
    """The composed whole-step speed-of-light bound (round-4 VERDICT #4
    machinery): every stage positive, stages sum to the total, the
    decoder param count matches a real init, and the reverb component
    responds to its precision knob (bf16 backward lowers the bound)."""
    import jax

    from ddsp_tpu.config import Config
    from ddsp_tpu.models.controller import decoder_init
    from ddsp_tpu.models.nn import count_params
    from ddsp_tpu.utils.roofline import decoder_param_count, train_step_bound_s

    conf = Config()
    total, breakdown = train_step_bound_s(conf, 16)
    assert all(v > 0 for v in breakdown.values()), breakdown
    assert abs(total - sum(breakdown.values())) < 1e-12
    assert 1e-3 < total < 20e-3  # milliseconds-scale at production shape

    params = decoder_init(jax.random.PRNGKey(0), conf)
    assert decoder_param_count(conf) == count_params(params)

    conf_f32 = conf.replace(reverb_grad_matmul_dtype="float32")
    conf_bf = conf.replace(reverb_grad_matmul_dtype="bfloat16")
    _, bd_f32 = train_step_bound_s(conf_f32, 16)
    _, bd_bf = train_step_bound_s(conf_bf, 16)
    assert bd_bf["reverb_fft_mxu"] < bd_f32["reverb_fft_mxu"]
