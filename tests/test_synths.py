"""Synth modules: reverb golden vs reference, streaming == offline tests."""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models.synths import (
    noise_apply,
    reverb_apply,
    reverb_impulse,
    reverb_init,
    reverb_live,
)

CONF = Config(sample_rate=4000)  # 4000-tap IR keeps the test fast


def _params(seed=0):
    return reverb_init(jax.random.PRNGKey(seed), CONF, initial_wet=0.3, initial_decay=3.0)


def test_reverb_matches_reference(reference_path, snr):
    from model.ddsp.reverb import Reverb

    params = _params()
    conf = types.SimpleNamespace(sample_rate=CONF.sample_rate)
    ref = Reverb(conf, initial_wet=0.3, initial_decay=3.0)
    with torch.no_grad():
        ref.noise.copy_(torch.from_numpy(np.asarray(params["noise"])))
        ref.decay.copy_(torch.tensor(float(params["decay"])))
        ref.wet.copy_(torch.tensor(float(params["wet"])))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    got = np.asarray(reverb_apply(params, x, CONF))
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    assert snr(want, got) > 55.0


def test_reverb_impulse_dry_path():
    params = _params()
    imp = np.asarray(reverb_impulse(params, CONF))
    assert imp[0] == 1.0
    assert np.abs(imp[1:]).max() < 1.0


def test_reverb_streaming_equals_offline(snr):
    """Block-partitioned (frequency-delay-line) streaming == offline conv."""
    from ddsp_tpu.models.synths import reverb_live_init

    params = _params(1)
    rng = np.random.default_rng(1)
    b, total, block = 1, 12000, 1000
    x = rng.standard_normal((b, total)).astype(np.float32)

    offline = np.asarray(reverb_apply(params, x, CONF))

    state = reverb_live_init(CONF, b, block)
    outs = []
    for i in range(0, total, block):
        wet, state = reverb_live(params, state, x[:, i : i + block], CONF)
        outs.append(np.asarray(wet))
    stitched = np.concatenate(outs, axis=1)
    assert snr(offline, stitched) > 80.0


def test_reverb_streaming_single_partition(snr):
    """IR shorter than one block (P=1): the delay line degenerates to plain
    overlap-save and must still match the offline convolution."""
    from ddsp_tpu.models.synths import reverb_live_init

    from ddsp_tpu.models.synths import reverb_init

    conf = CONF.replace(reverb_length=100)  # < block
    params = reverb_init(
        jax.random.PRNGKey(3), conf, initial_wet=0.3, initial_decay=3.0
    )
    rng = np.random.default_rng(5)
    b, total, block = 2, 2048, 256
    x = rng.standard_normal((b, total)).astype(np.float32)
    offline = np.asarray(reverb_apply(params, x, conf))
    state = reverb_live_init(conf, b, block)
    assert state.spec_re.shape[1] == 1  # P = 1
    outs = []
    for i in range(0, total, block):
        wet, state = reverb_live(params, state, x[:, i : i + block], conf)
        outs.append(np.asarray(wet))
    assert snr(offline, np.concatenate(outs, axis=1)) > 80.0


def test_reverb_streaming_rejects_block_mismatch():
    from ddsp_tpu.models.synths import reverb_live_init

    params = _params(1)
    state = reverb_live_init(CONF, 1, 256)
    with pytest.raises(ValueError, match="block"):
        reverb_live(params, state, jnp.zeros((1, 128)), CONF)


def test_noise_streaming_equals_offline():
    conf = Config()
    rng = np.random.default_rng(2)
    b, t = 1, 12
    mags = rng.uniform(0, 1, (b, t, conf.n_noise_filters)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    full = np.asarray(noise_apply({"H": mags}, conf, key))
    parts = [
        np.asarray(noise_apply({"H": mags[:, :5]}, conf, key, frame_offset=0)),
        np.asarray(noise_apply({"H": mags[:, 5:]}, conf, key, frame_offset=5)),
    ]
    np.testing.assert_allclose(
        full, np.concatenate(parts, axis=1), atol=1e-6
    )


def _fastgrad_setup(length=3000, klen=1200, b=2, seed=11):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, length)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((1, klen)).astype(np.float32) * 0.1)
    return x, h, klen


def test_fft_convolve_fastgrad_forward_identical():
    """The custom-VJP wrapper must not change the forward at all."""
    from ddsp_tpu.ops.fir import fft_convolve

    x, h, klen = _fastgrad_setup()
    base = np.asarray(fft_convolve(x, h, klen))
    fast = np.asarray(fft_convolve(x, h, klen, grad_matmul_dtype="bfloat16"))
    np.testing.assert_array_equal(base, fast)


def test_fft_convolve_custom_vjp_matches_autodiff():
    """Hand-written correlation backward == autodiff at equal precision.

    Runs the custom VJP with float32 grad matmuls so the only difference
    from autodiff is the algorithm (reversed-cotangent convolutions vs
    transposed DFT matmuls); they must agree to float32 rounding.
    """
    from ddsp_tpu.ops.fir import _fft_convolve_fastgrad, fft_convolve

    x, h, klen = _fastgrad_setup()

    def loss_ref(x, h):
        y = fft_convolve(x, h, klen)
        return jnp.sum(jnp.sin(3.0 * y) * y)

    def loss_fast(x, h):
        y = _fft_convolve_fastgrad(x, h, klen, "float32")
        return jnp.sum(jnp.sin(3.0 * y) * y)

    gx_ref, gh_ref = jax.grad(loss_ref, argnums=(0, 1))(x, h)
    gx, gh = jax.grad(loss_fast, argnums=(0, 1))(x, h)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref), rtol=2e-4, atol=2e-4)


def test_reverb_bf16_backward_close_to_f32():
    """Opt-in bf16 reverb backward (shipped default is f32 exact autodiff):
    loss-grade gradients, aligned with the exact-autodiff direction
    (cos > 0.999, rel error ~1e-2)."""
    from ddsp_tpu.models.synths import reverb_apply, reverb_init

    conf32 = CONF.replace(reverb_grad_matmul_dtype="float32")
    confbf = CONF.replace(reverb_grad_matmul_dtype="bfloat16")

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32) * 0.3)
    params = reverb_init(jax.random.PRNGKey(0), CONF)

    def make_loss(conf):
        def loss(p, x):
            y = reverb_apply(p, x, conf)
            return jnp.mean(y * y)

        return loss

    gp32, gx32 = jax.grad(make_loss(conf32), argnums=(0, 1))(params, x)
    gpbf, gxbf = jax.grad(make_loss(confbf), argnums=(0, 1))(params, x)

    def check(a, b, name):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        nb = np.linalg.norm(b)
        assert nb > 0, name
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * nb))
        rel = float(np.linalg.norm(a - b) / nb)
        assert cos > 0.999, (name, cos)
        assert rel < 5e-2, (name, rel)

    check(gxbf, gx32, "d/dsignal")
    check(gpbf["noise"], gp32["noise"], "d/dnoise")
    check(gpbf["decay"], gp32["decay"], "d/ddecay")
    check(gpbf["wet"], gp32["wet"], "d/dwet")
