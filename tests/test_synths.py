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
