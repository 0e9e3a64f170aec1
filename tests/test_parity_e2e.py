"""System-level golden: full decoder render vs the reference torch decoder.

Same weights on both sides (ours exported into the reference modules), the
stochastic noise branch silenced via a large negative filter-head bias
(modified_sigmoid -> ~1e-7 amplitude), deterministic harmonic + reverb
chain compared end to end.  This is the BASELINE.md 'render fidelity vs
reference' acceptance bound.
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import decoder_apply, decoder_init

CONF = Config(
    sample_rate=16000,
    n_fft=512,
    hop_length=128,
    n_harmonics=64,
    n_noise_filters=33,
    decoder_mlp_units=64,
    decoder_mlp_layers=2,
    decoder_gru_units=64,
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


def _install(params, dec):
    """Copy our decoder params into the reference torch Decoder."""
    t = lambda x: torch.from_numpy(np.asarray(x))
    ctrl = params["controller"]
    with torch.no_grad():
        for name in ["mlp_f0", "mlp_loudness", "mlp_gru"]:
            t_mlp = getattr(dec.controller, name)
            for i, layer in enumerate(ctrl[name]["layers"], start=1):
                seq = getattr(t_mlp, f"mlp_layer{i}")
                seq[0].weight.copy_(t(layer["dense"]["weight"]))
                seq[0].bias.copy_(t(layer["dense"]["bias"]))
                seq[1].weight.copy_(t(layer["norm"]["weight"]))
                seq[1].bias.copy_(t(layer["norm"]["bias"]))
        for li, lp in enumerate(ctrl["gru"]["layers"]):
            getattr(dec.controller.gru, f"weight_ih_l{li}").copy_(t(lp["w_ih"]))
            getattr(dec.controller.gru, f"weight_hh_l{li}").copy_(t(lp["w_hh"]))
            getattr(dec.controller.gru, f"bias_ih_l{li}").copy_(t(lp["b_ih"]))
            getattr(dec.controller.gru, f"bias_hh_l{li}").copy_(t(lp["b_hh"]))
        for name in ["dense_harmonic", "dense_loudness", "dense_filter"]:
            getattr(dec.controller, name).weight.copy_(t(ctrl[name]["weight"]))
            getattr(dec.controller, name).bias.copy_(t(ctrl[name]["bias"]))
        dec.reverb.noise.copy_(t(params["reverb"]["noise"]))
        dec.reverb.decay.copy_(t(params["reverb"]["decay"]).reshape(()))
        dec.reverb.wet.copy_(t(params["reverb"]["wet"]).reshape(()))


def test_full_decoder_matches_reference(reference_path, snr):
    from model.autoencoder.decoder import Decoder

    params = decoder_init(jax.random.PRNGKey(0), CONF)
    # silence the noise branch on both sides
    params["controller"]["dense_filter"]["bias"] = (
        params["controller"]["dense_filter"]["bias"] * 0.0 - 40.0
    )
    params["controller"]["dense_filter"]["weight"] = (
        params["controller"]["dense_filter"]["weight"] * 0.0
    )

    dec = Decoder(_torch_conf()).eval()
    _install(params, dec)

    rng = np.random.default_rng(0)
    t = 40
    batch = {
        "f0": rng.uniform(100, 500, (2, t, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (2, t, 1)).astype(np.float32),
        "loudness": rng.uniform(0, 1, (2, t, 1)).astype(np.float32),
    }

    ours = np.asarray(decoder_apply(params, batch, CONF, jax.random.PRNGKey(1)))
    with torch.no_grad():
        ref = dec({k: torch.from_numpy(v) for k, v in batch.items()}).numpy()
    assert ours.shape == ref.shape
    assert snr(ref, ours) > 40.0  # deterministic chain parity bound


def test_reconstruction_snr_after_training():
    """Analysis-by-synthesis smoke: after a short fit on one harmonic tone,
    the reconstruction must land within a few dB of the target's envelope
    (loss decreasing is necessary but not sufficient; this checks audio)."""
    from ddsp_tpu.losses import mss_loss
    from ddsp_tpu.training.trainer import init_state, make_train_step

    conf = CONF.replace(example_duration=0.256, mss_ffts=(512, 256, 128))
    t_frames = conf.frames_per_example
    sr = conf.sample_rate
    ts = np.arange(conf.example_length) / sr
    audio = sum(
        (0.4 / k) * np.sin(2 * np.pi * 220.0 * k * ts) for k in range(1, 5)
    ).astype(np.float32)[None]
    batch = {
        "f0": np.full((1, t_frames, 1), 220.0, np.float32),
        "normalized_cents": np.full((1, t_frames, 1), 0.35, np.float32),
        "loudness": np.full((1, t_frames, 1), 0.8, np.float32),
        "audio": audio,
    }
    state = init_state(jax.random.PRNGKey(0), conf)
    step = jax.jit(make_train_step(conf))
    first = None
    for i in range(60):
        state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        if first is None:
            first = float(m["loss"])
    final = float(m["loss"])
    assert final < 0.5 * first, (first, final)

    pred = decoder_apply(state.params, batch, conf, jax.random.PRNGKey(5))
    final_mss = float(mss_loss(pred, jnp.asarray(audio), conf.mss_ffts))
    assert np.isfinite(final_mss)
    # The rendered audio itself must be close to the target: far below an
    # untrained decoder's distance (loss decreasing alone could be the
    # noise branch fitting; this pins the actual waveform quality).
    untrained = init_state(jax.random.PRNGKey(9), conf).params
    pred0 = decoder_apply(untrained, batch, conf, jax.random.PRNGKey(5))
    untrained_mss = float(mss_loss(pred0, jnp.asarray(audio), conf.mss_ffts))
    assert final_mss < 0.2 * untrained_mss, (final_mss, untrained_mss)
