"""Encoder: frame-count contract, pitch tracking accuracy on synthetic tones."""

import os

import numpy as np
import pytest

import jax

from ddsp_tpu.config import Config
from ddsp_tpu.models.autoencoder import feature_pad
from ddsp_tpu.models.crepe import load_torch_checkpoint
from ddsp_tpu.models.encoder import (
    crepe_frame_hop,
    encoder_apply,
    loudness_encoder_apply,
)

TINY = "/root/reference/crepe/pretrained/tiny.pth"
CONF = Config()


@pytest.fixture(scope="module")
def tiny_params():
    if not os.path.exists(TINY):
        pytest.skip("tiny.pth not available")
    return load_torch_checkpoint(TINY)


def test_frame_contract():
    """Padded 88064-sample example -> exactly 172 frames on both branches."""
    conf = CONF
    assert conf.example_length == 88064
    assert conf.frames_per_example == 172
    padded_len = conf.example_length + conf.n_fft - conf.hop_length  # 89600
    from ddsp_tpu.ops.resample import resample_length

    rs_len = resample_length(padded_len, conf.sample_rate, conf.crepe_sample_rate)
    hop = crepe_frame_hop(padded_len, rs_len, conf)
    crepe_frames = (rs_len - conf.crepe_window) // hop + 1
    stft_frames = (padded_len - conf.n_fft) // conf.hop_length + 1
    assert crepe_frames == stft_frames == 172


def test_encoder_on_tone(tiny_params):
    """440 Hz tone: f0 within a quartertone, loudness high, finite outputs."""
    conf = CONF
    sr = conf.sample_rate
    t = np.arange(conf.example_length) / sr
    audio = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)[None]
    feats = encoder_apply(tiny_params, feature_pad(audio, conf), conf)
    assert feats["f0"].shape == (1, 172, 1)
    assert feats["loudness"].shape == (1, 172, 1)
    assert feats["probabilities"].shape == (1, 172, 360)
    # interior frames (edges see zero padding)
    f0 = np.asarray(feats["f0"])[0, 20:-20, 0]
    assert np.median(np.abs(1200 * np.log2(f0 / 440.0))) < 50.0  # < 50 cents
    harm = np.asarray(feats["harmonicity"])[0, 20:-20, 0]
    assert harm.mean() > 0.3
    loud = np.asarray(feats["loudness"])[0, 20:-20, 0]
    assert loud.mean() > 0.4


def test_loudness_silence_vs_tone():
    conf = CONF
    silence = np.zeros((1, conf.example_length), np.float32)
    loud = np.asarray(loudness_encoder_apply(feature_pad(silence, conf), conf))
    assert loud.shape == (1, 172, 1)
    assert loud.max() < 0.05


def test_silent_example_features_and_train_step_finite():
    """Digitally-silent audio must produce finite features and a finite
    train step.  The reference normalizes by a raw std
    (encoder.py:59-60) and NaN-poisons training on silence; our offline
    path carries the same epsilon as the streaming path."""
    from ddsp_tpu.data.dataset import extract_features
    from ddsp_tpu.models.crepe import crepe_init
    from ddsp_tpu.training.trainer import init_state, make_train_step

    conf = Config(
        sample_rate=4000,
        n_fft=256,
        hop_length=64,
        example_duration=0.5,
        n_harmonics=16,
        n_noise_filters=17,
        decoder_mlp_units=32,
        decoder_mlp_layers=1,
        decoder_gru_units=32,
        batch_size=4,
        mss_ffts=(256, 128),
    )
    crepe = crepe_init(jax.random.PRNGKey(0), capacity="tiny")
    silent = np.zeros((4, conf.example_length), np.float32)
    feats = extract_features(crepe, conf, examples=silent)
    for k, v in feats.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite {k}"

    import jax.numpy as jnp

    state = init_state(jax.random.PRNGKey(1), conf)
    batch = {
        k: jnp.asarray(feats[k])
        for k in ("f0", "normalized_cents", "loudness", "audio")
    }
    state, metrics = jax.jit(make_train_step(conf))(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_crepe_frame_hop_rejects_degenerate_lengths():
    """orig_len <= n_fft divided by zero/negative in the reference
    (encoder.py:66-68); here it must raise a clear error."""
    conf = CONF
    with pytest.raises(ValueError, match="too short"):
        crepe_frame_hop(conf.n_fft, 1024, conf)
    with pytest.raises(ValueError, match="CREPE window"):
        crepe_frame_hop(conf.n_fft + 1000, conf.crepe_window - 1, conf)
    # resampled length == window: the aligned-hop formula floors to 0 and
    # downstream framing would divide by it
    with pytest.raises(ValueError, match="hop"):
        crepe_frame_hop(conf.n_fft + 1000, conf.crepe_window, conf)


def test_crepe_bf16_compute_keeps_pitch_decode(tiny_params):
    """crepe_compute_dtype='bfloat16' (the encode-throughput lever,
    roofline: the f32 convs cap MFU at 1/3 of the MXU peak) must leave the
    pitch decode intact: argmax bins ~identical on a real tone, f0 within
    a few cents of the f32 path, probabilities within bf16 noise."""
    conf = CONF
    t = np.arange(conf.example_length) / conf.sample_rate
    audio = (
        0.5 * np.sin(2 * np.pi * 440.0 * t) * (0.3 + 0.7 * np.abs(np.sin(3 * t)))
    ).astype(np.float32)[None]
    f32 = encoder_apply(tiny_params, feature_pad(audio, conf), conf)
    bf16 = encoder_apply(
        tiny_params,
        feature_pad(audio, conf),
        conf.replace(crepe_compute_dtype="bfloat16"),
    )
    bins32 = np.argmax(np.asarray(f32["probabilities"]), -1)
    bins16 = np.argmax(np.asarray(bf16["probabilities"]), -1)
    assert (bins32 == bins16).mean() > 0.95  # stray +-1-bin flips only
    f0a = np.asarray(f32["f0"])[0, 20:-20, 0]
    f0b = np.asarray(bf16["f0"])[0, 20:-20, 0]
    assert np.median(np.abs(1200 * np.log2(f0b / f0a))) < 21.0  # <= 1 bin
    dp = np.abs(
        np.asarray(f32["probabilities"]) - np.asarray(bf16["probabilities"])
    )
    assert dp.max() < 0.1  # bf16-noise scale, not a broken path


def test_unknown_pitch_decode_raises_clearly():
    """A typo'd conf.pitch_decode must name the valid choices, not KeyError
    inside a jit trace."""
    from ddsp_tpu.models.crepe import crepe_init
    from ddsp_tpu.models.encoder import f0_encoder_apply

    conf = CONF.replace(pitch_decode="weigthed")
    crepe = crepe_init(jax.random.PRNGKey(0), "tiny")
    audio = np.zeros((1, conf.example_length + conf.n_fft - conf.hop_length),
                     np.float32)
    with pytest.raises(ValueError, match="argmax"):
        f0_encoder_apply(crepe, audio, conf)
