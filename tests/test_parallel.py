"""Distributed correctness on an 8-device virtual CPU mesh:
time-sharded render == single-device render; DP train step == local step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.losses import mss_loss
from ddsp_tpu.models.controller import controller_apply, decoder_init
from ddsp_tpu.models.synths import reverb_impulse
from ddsp_tpu.ops.fir import fft_convolve, filtered_noise
from ddsp_tpu.ops.oscillator import oscillator_bank
from ddsp_tpu.parallel.mesh import make_mesh
from ddsp_tpu.parallel.render import render_controls_sharded, render_long_audio
from ddsp_tpu.parallel.train import (
    make_parallel_train_step,
    shard_batch,
    shard_state,
)
from ddsp_tpu.training.trainer import init_state, make_train_step

CONF = Config(
    sample_rate=4000,
    n_fft=256,
    hop_length=64,
    n_harmonics=16,
    n_noise_filters=17,
    decoder_mlp_units=32,
    decoder_mlp_layers=1,
    decoder_gru_units=32,
    reverb_length=512,
    mss_ffts=(256, 128),
    batch_size=8,
    # The sharded (halo-exchange) reverb keeps an exact-autodiff backward;
    # pin the single-device reference to f32 gradients (also the shipped
    # default -- pinned so the mesh-algebra equality checks stay exact if
    # the default ever changes).
    reverb_grad_matmul_dtype="float32",
)


def _controls(b=1, t=64, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "f0": rng.uniform(80, 500, (b, t, 1)).astype(np.float32),
        "c": rng.uniform(0.01, 1, (b, t, CONF.n_harmonics)).astype(np.float32),
        "a": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "H": rng.uniform(0, 1, (b, t, CONF.n_noise_filters)).astype(np.float32),
    }


def _single_device_render(reverb_params, controls, key):
    harm, _ = oscillator_bank(
        controls["f0"], controls["c"], controls["a"],
        sample_rate=CONF.sample_rate, hop=CONF.hop_length,
    )
    noise = filtered_noise(controls["H"], key, CONF.hop_length)
    dry = harm + noise
    imp = reverb_impulse(reverb_params, CONF)
    return fft_convolve(dry, imp[None, :], kernel_len=imp.shape[-1])


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.parametrize("n_time", [2, 4, 8])
def test_time_sharded_render_matches_single(snr, n_time):
    mesh = make_mesh(n_time=n_time, devices=jax.devices()[:n_time])
    controls = _controls()
    key = jax.random.PRNGKey(3)
    params = {
        "noise": jax.random.uniform(jax.random.PRNGKey(1), (CONF.ir_length,), minval=-1.0),
        "decay": jnp.asarray(4.0),
        "wet": jnp.asarray(0.5),
    }
    want = np.asarray(_single_device_render(params, controls, key))
    got = np.asarray(
        render_controls_sharded(params, controls, CONF, mesh, key)
    )
    assert got.shape == want.shape
    assert snr(want, got) > 70.0


def test_halo_spans_multiple_shards(snr):
    """ir_length (512) > local samples (e.g. 8 shards x 8 frames x 64 = 512
    per shard): halo must gather from more than one left neighbor."""
    conf = CONF
    mesh = make_mesh(n_time=8, devices=jax.devices())
    controls = _controls(t=64)  # 8 frames/shard -> 512 samples = ir length
    key = jax.random.PRNGKey(5)
    params = {
        "noise": jax.random.uniform(jax.random.PRNGKey(2), (conf.ir_length,), minval=-1.0),
        "decay": jnp.asarray(2.0),
        "wet": jnp.asarray(1.0),
    }
    want = np.asarray(_single_device_render(params, controls, key))
    got = np.asarray(render_controls_sharded(params, controls, conf, mesh, key))
    assert snr(want, got) > 70.0


def test_render_long_audio_full_decoder(snr):
    """Controller -> sharded synthesis vs single-device decoder synthesis."""
    from ddsp_tpu.models.controller import decoder_apply

    mesh = make_mesh(n_time=4, devices=jax.devices()[:4])
    params = decoder_init(jax.random.PRNGKey(0), CONF)
    t = 64
    batch = {
        "f0": np.random.default_rng(0).uniform(100, 400, (1, t, 1)).astype(np.float32),
        "normalized_cents": np.random.default_rng(1).uniform(0, 1, (1, t, 1)).astype(np.float32),
        "loudness": np.random.default_rng(2).uniform(0, 1, (1, t, 1)).astype(np.float32),
    }
    key = jax.random.PRNGKey(7)
    want = np.asarray(decoder_apply(params, batch, CONF, key))
    got = np.asarray(render_long_audio(params, batch, CONF, mesh, key))
    assert snr(want, got) > 70.0


def test_dp_train_step_matches_single():
    mesh = make_mesh(n_data=8)
    feats_rng = np.random.default_rng(0)
    t = CONF.frames_per_example
    batch = {
        "f0": feats_rng.uniform(100, 400, (8, t, 1)).astype(np.float32),
        "normalized_cents": feats_rng.uniform(0, 1, (8, t, 1)).astype(np.float32),
        "loudness": feats_rng.uniform(0, 1, (8, t, 1)).astype(np.float32),
        "audio": (0.1 * feats_rng.standard_normal((8, CONF.example_length))).astype(np.float32),
    }
    state0 = init_state(jax.random.PRNGKey(0), CONF)

    local_state, local_metrics = jax.jit(make_train_step(CONF))(state0, batch)

    pstep = make_parallel_train_step(CONF, mesh)
    pstate = shard_state(init_state(jax.random.PRNGKey(0), CONF), mesh)
    pbatch = shard_batch(batch, mesh)
    pstate, pmetrics = pstep(pstate, pbatch)

    assert abs(float(local_metrics["loss"]) - float(pmetrics["loss"])) < 1e-2
    leaves_l = jax.tree_util.tree_leaves(local_state.params)
    leaves_p = jax.tree_util.tree_leaves(pstate.params)
    for a, b in zip(leaves_l, leaves_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


# --- tensor parallelism over harmonics (parallel/tp.py) ----------------------
from ddsp_tpu.parallel.tp import (
    decoder_apply_tp,
    make_dp_tp_mesh,
    make_tp_train_step,
    render_controls_tp,
)


@pytest.mark.parametrize("n_model", [2, 4, 8])
def test_tp_render_matches_single(snr, n_model):
    """Harmonic-sharded synthesis == single-device synthesis.

    n_model=8 exercises the zero-pad path (16 harmonics over 8 shards = 2
    each; also run with a non-divisible count below)."""
    mesh = make_dp_tp_mesh(n_data=1, n_model=n_model,
                           devices=jax.devices()[:n_model])
    controls = {k: jnp.asarray(v) for k, v in _controls(b=2).items()}
    key = jax.random.PRNGKey(3)
    rev = {"noise": jax.random.normal(jax.random.PRNGKey(9), (CONF.ir_length,)),
           "decay": jnp.float32(2.0), "wet": jnp.float32(0.5)}
    want = np.asarray(_single_device_render(rev, controls, key))
    got = np.asarray(render_controls_tp(rev, controls, CONF, mesh, key))
    assert got.shape == want.shape
    assert snr(want, got) > 80.0


def test_tp_render_nondivisible_harmonics(snr):
    """17 harmonics over 4 shards: the bank is zero-padded to 20."""
    conf = CONF.replace(n_harmonics=17)
    mesh = make_dp_tp_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
    rng = np.random.default_rng(5)
    t = 32
    controls = {
        "f0": jnp.asarray(rng.uniform(80, 500, (1, t, 1)).astype(np.float32)),
        "c": jnp.asarray(rng.uniform(0.01, 1, (1, t, 17)).astype(np.float32)),
        "a": jnp.asarray(rng.uniform(0, 1, (1, t, 1)).astype(np.float32)),
        "H": jnp.asarray(rng.uniform(0, 1, (1, t, CONF.n_noise_filters)).astype(np.float32)),
    }
    key = jax.random.PRNGKey(4)
    rev = {"noise": jax.random.normal(jax.random.PRNGKey(9), (conf.ir_length,)),
           "decay": jnp.float32(2.0), "wet": jnp.float32(0.5)}

    def single(rev, controls, key):
        harm, _ = oscillator_bank(
            controls["f0"], controls["c"], controls["a"],
            sample_rate=conf.sample_rate, hop=conf.hop_length,
        )
        noise = filtered_noise(controls["H"], key, conf.hop_length)
        imp = reverb_impulse(rev, conf)
        return fft_convolve(harm + noise, imp[None, :], kernel_len=imp.shape[-1])

    want = np.asarray(single(rev, controls, key))
    got = np.asarray(render_controls_tp(rev, controls, conf, mesh, key))
    assert snr(want, got) > 80.0


def test_dp_tp_train_step_matches_single():
    """2-way data x 4-way harmonic tensor parallelism: one train step's loss
    and updated params match the single-device step."""
    mesh = make_dp_tp_mesh(n_data=2, n_model=4)
    rng = np.random.default_rng(0)
    t = CONF.frames_per_example
    batch = {
        "f0": rng.uniform(100, 400, (8, t, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (8, t, 1)).astype(np.float32),
        "loudness": rng.uniform(0, 1, (8, t, 1)).astype(np.float32),
        "audio": (0.1 * rng.standard_normal((8, CONF.example_length))).astype(np.float32),
    }
    state0 = init_state(jax.random.PRNGKey(0), CONF)
    local_state, local_metrics = jax.jit(make_train_step(CONF))(state0, batch)

    tstep = make_tp_train_step(CONF, mesh)
    tstate = shard_state(init_state(jax.random.PRNGKey(0), CONF), mesh)
    tbatch = {k: jax.device_put(jnp.asarray(v),
                                jax.NamedSharding(mesh, jax.P("data")))
              for k, v in batch.items()}
    tstate, tmetrics = tstep(tstate, tbatch)

    assert abs(float(local_metrics["loss"]) - float(tmetrics["loss"])) < 1e-2
    # Adam normalizes each grad by its magnitude, so psum reduction-order
    # noise on a near-zero grad can flip a whole update step of size ~lr
    # (1e-3); bound the disagreement by 3x that.
    for a, b in zip(jax.tree_util.tree_leaves(local_state.params),
                    jax.tree_util.tree_leaves(tstate.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=3e-3)


@pytest.mark.parametrize("n_time,n_model", [(2, 2), (4, 2), (2, 4)])
def test_time_tp_render_matches_single(snr, n_time, n_model):
    """Composed sharding: frames over 'time' AND harmonics over 'model'
    must still match the single-device render."""
    from ddsp_tpu.parallel.tp import make_time_tp_mesh, render_controls_time_tp

    mesh = make_time_tp_mesh(
        n_time=n_time, n_model=n_model, devices=jax.devices()[: n_time * n_model]
    )
    controls = _controls()
    key = jax.random.PRNGKey(3)
    params = {
        "noise": jax.random.uniform(jax.random.PRNGKey(1), (CONF.ir_length,), minval=-1.0),
        "decay": jnp.asarray(4.0),
        "wet": jnp.asarray(0.5),
    }
    want = np.asarray(_single_device_render(params, controls, key))
    got = np.asarray(
        render_controls_time_tp(params, controls, CONF, mesh, key)
    )
    assert got.shape == want.shape
    assert snr(want, got) > 70.0


# --- sequence parallelism: time-sharded training (parallel/sp.py) ------------
from ddsp_tpu.parallel.sp import make_sp_train_step


def test_sp_train_step_matches_single():
    """DP x SP (2 data x 4 time) train step == single-device step: loss,
    per-scale terms, and updated params all match -- the MSS loss's sharded
    frame ownership + STFT halos reproduce the offline reflect-pad framing
    exactly, and gradients flow through the phase carry / reverb halos."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=2, n_time=4)
    b, t = 4, 16  # local shard = 4 frames * 64 = 256 samples >= n_fft//2+1
    feats_rng = np.random.default_rng(7)
    batch = {
        "f0": feats_rng.uniform(100, 400, (b, t, 1)).astype(np.float32),
        "normalized_cents": feats_rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "loudness": feats_rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "audio": (0.1 * feats_rng.standard_normal((b, t * CONF.hop_length))).astype(
            np.float32
        ),
    }
    state0 = init_state(jax.random.PRNGKey(0), CONF)
    local_state, local_metrics = jax.jit(make_train_step(CONF))(state0, batch)

    sp_step = make_sp_train_step(CONF, mesh)
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
    for n_fft in CONF.mss_ffts:
        k = f"mss_{n_fft}"
        assert abs(float(local_metrics[k]) - float(sp_metrics[k])) < 1e-2
    leaves_l = jax.tree_util.tree_leaves(local_state.params)
    leaves_s = jax.tree_util.tree_leaves(sp_state.params)
    for a, c in zip(leaves_l, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-3, atol=2e-5)


def test_sp_tp_3axis_train_step_matches_single():
    """DP x SP x TP (2 data x 2 time x 2 model) train step == single-device
    step: the 3-axis compose -- batch rows over 'data', frames/samples over
    'time', the harmonic bank over 'model' -- must change nothing the
    optimizer sees (round-2 VERDICT next-step #10; previously only pairwise
    meshes were certified)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddsp_tpu.parallel.mesh import make_mesh3

    mesh = make_mesh3(n_data=2, n_time=2, n_model=2)
    b, t = 4, 16  # local time shard = 8 frames * 64 = 512 >= n_fft//2+1
    rng = np.random.default_rng(11)
    batch = {
        "f0": rng.uniform(100, 400, (b, t, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "loudness": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "audio": (0.1 * rng.standard_normal((b, t * CONF.hop_length))).astype(
            np.float32
        ),
    }
    state0 = init_state(jax.random.PRNGKey(0), CONF)
    local_state, local_metrics = jax.jit(make_train_step(CONF))(state0, batch)

    step3 = make_sp_train_step(CONF, mesh)
    st3 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
        init_state(jax.random.PRNGKey(0), CONF),
    )
    b3 = {
        k: jax.device_put(
            v,
            NamedSharding(mesh, P("data", "time") if k == "audio" else P("data")),
        )
        for k, v in batch.items()
    }
    st3, metrics3 = step3(st3, b3)

    assert abs(float(local_metrics["loss"]) - float(metrics3["loss"])) < 1e-2
    for n_fft in CONF.mss_ffts:
        k = f"mss_{n_fft}"
        assert abs(float(local_metrics[k]) - float(metrics3[k])) < 1e-2
    leaves_l = jax.tree_util.tree_leaves(local_state.params)
    leaves_3 = jax.tree_util.tree_leaves(st3.params)
    for a, c in zip(leaves_l, leaves_3):
        # atol matches the DP x TP test: the psum'd harmonic sum reorders
        # f32 additions and Adam normalizes grads, so near-zero-grad params
        # can move by up to ~lr on either side.
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-3, atol=3e-3)


def test_sp_loss_rejects_short_shards():
    """A time shard shorter than n_fft//2+1 samples cannot host the STFT
    halo; the loss must fail loudly, not silently mis-frame."""
    from ddsp_tpu.parallel.sp import make_sp_loss

    mesh = make_mesh(n_data=1, n_time=8)
    b, t = 2, 8  # local shard = 1 frame * 64 = 64 < 129
    rng = np.random.default_rng(0)
    batch = {
        "f0": rng.uniform(100, 400, (b, t, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "loudness": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "audio": np.zeros((b, t * CONF.hop_length), np.float32),
    }
    params = init_state(jax.random.PRNGKey(0), CONF).params
    with pytest.raises(ValueError):
        jax.jit(
            lambda p, bt: make_sp_loss(CONF, mesh)(p, bt, CONF, jax.random.PRNGKey(0))[0]
        )(params, batch)
