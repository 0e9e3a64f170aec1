"""Sharded render/train paths dispatching the fused Pallas oscillator.

Round-1 gap (VERDICT.md Weak #2): every sharded path rendered through the
XLA einsum even when ``conf.osc_impl='pallas'``, so multi-chip scale-out
would run ~4x below the single-chip per-chip rate.  These tests pin the
fix: with the kernel forced (and interpreted on CPU), the time-sharded,
tensor-parallel, time x TP, and sequence-parallel paths must all match the
single-device XLA oracle -- including the TP bank fill seeded at a traced
``h_start`` offset and the SP backward pass through the hand-written VJP.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import decoder_init
from ddsp_tpu.models.synths import reverb_impulse
from ddsp_tpu.ops.fir import fft_convolve, filtered_noise
from ddsp_tpu.ops.oscillator import oscillator_bank
from ddsp_tpu.parallel.mesh import make_mesh
from ddsp_tpu.parallel.render import render_controls_sharded
from ddsp_tpu.parallel.tp import (
    make_dp_tp_mesh,
    make_time_tp_mesh,
    render_controls_time_tp,
    render_controls_tp,
)

# hop must be a TPU lane multiple (128) for the kernel's block layout.
CONF = Config(
    sample_rate=8000,
    n_fft=256,
    hop_length=128,
    n_harmonics=16,
    n_noise_filters=17,
    decoder_mlp_units=32,
    decoder_mlp_layers=1,
    decoder_gru_units=32,
    reverb_length=512,
    mss_ffts=(256, 128),
    batch_size=4,
    osc_impl="pallas",
    # Sharded reverb backward is exact autodiff; keep the single-device
    # reference at f32 gradients for the equality checks.
    reverb_grad_matmul_dtype="float32",
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() == "cpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def _controls(b=1, t=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "f0": rng.uniform(80, 500, (b, t, 1)).astype(np.float32),
        "c": rng.uniform(0.01, 1, (b, t, CONF.n_harmonics)).astype(np.float32),
        "a": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "H": rng.uniform(0, 1, (b, t, CONF.n_noise_filters)).astype(np.float32),
    }


def _reverb(seed=1):
    return {
        "noise": jax.random.uniform(
            jax.random.PRNGKey(seed), (CONF.ir_length,), minval=-1.0
        ),
        "decay": jnp.asarray(4.0),
        "wet": jnp.asarray(0.5),
    }


def _single_device_render(reverb_params, controls, key):
    """Oracle: the plain XLA path, unsharded."""
    harm, _ = oscillator_bank(
        controls["f0"], controls["c"], controls["a"],
        sample_rate=CONF.sample_rate, hop=CONF.hop_length,
    )
    noise = filtered_noise(controls["H"], key, CONF.hop_length)
    imp = reverb_impulse(reverb_params, CONF)
    return fft_convolve(harm + noise, imp[None, :], kernel_len=imp.shape[-1])


def test_time_sharded_render_pallas(snr):
    mesh = make_mesh(n_time=4, devices=jax.devices()[:4])
    controls = _controls()
    key = jax.random.PRNGKey(3)
    rev = _reverb()
    want = np.asarray(_single_device_render(rev, controls, key))
    got = np.asarray(
        render_controls_sharded(rev, controls, CONF, mesh, key, impl="pallas")
    )
    assert got.shape == want.shape
    assert snr(want, got) > 70.0


@pytest.mark.parametrize("n_model", [2, 4])
def test_tp_render_pallas_h_start(snr, n_model):
    """Bank shards seeded at traced h_start offsets must reproduce the
    full-bank render (16 harmonics over n_model shards)."""
    mesh = make_dp_tp_mesh(n_data=1, n_model=n_model,
                           devices=jax.devices()[:n_model])
    controls = {k: jnp.asarray(v) for k, v in _controls(b=2).items()}
    key = jax.random.PRNGKey(3)
    rev = _reverb(9)
    want = np.asarray(_single_device_render(rev, controls, key))
    got = np.asarray(
        render_controls_tp(rev, controls, CONF, mesh, key, impl="pallas")
    )
    assert got.shape == want.shape
    assert snr(want, got) > 70.0


def test_time_tp_render_pallas(snr):
    mesh = make_time_tp_mesh(n_time=2, n_model=2, devices=jax.devices()[:4])
    controls = _controls()
    key = jax.random.PRNGKey(3)
    rev = _reverb()
    want = np.asarray(_single_device_render(rev, controls, key))
    got = np.asarray(
        render_controls_time_tp(rev, controls, CONF, mesh, key, impl="pallas")
    )
    assert got.shape == want.shape
    assert snr(want, got) > 70.0


def test_sp_train_step_pallas_matches_single():
    """DP x SP train step with the Pallas oscillator (forward AND the
    hand-written backward kernel under grad) == single-device XLA step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddsp_tpu.parallel.sp import make_sp_train_step
    from ddsp_tpu.parallel.train import shard_state
    from ddsp_tpu.training.trainer import init_state, make_train_step

    mesh = make_mesh(n_data=2, n_time=2)
    b, t = 2, 8  # local shard = 4 frames * 128 = 512 samples >= n_fft//2+1
    rng = np.random.default_rng(7)
    batch = {
        "f0": rng.uniform(100, 400, (b, t, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "loudness": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "audio": (0.1 * rng.standard_normal((b, t * CONF.hop_length))).astype(
            np.float32
        ),
    }
    xla_conf = CONF.replace(osc_impl="xla")
    state0 = init_state(jax.random.PRNGKey(0), xla_conf)
    local_state, local_metrics = jax.jit(make_train_step(xla_conf))(state0, batch)

    sp_step = make_sp_train_step(CONF, mesh)  # osc_impl='pallas'
    sp_state = shard_state(init_state(jax.random.PRNGKey(0), CONF), mesh)
    sp_batch = {
        k: jax.device_put(
            v,
            NamedSharding(mesh, P("data", "time") if k == "audio" else P("data")),
        )
        for k, v in batch.items()
    }
    sp_state, sp_metrics = sp_step(sp_state, sp_batch)

    assert abs(float(local_metrics["loss"]) - float(sp_metrics["loss"])) < 1e-2
    for a, c in zip(
        jax.tree_util.tree_leaves(local_state.params),
        jax.tree_util.tree_leaves(sp_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-3, atol=3e-4)
