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
    # The goldens here pin the exact-autodiff MATH against torch.  f32 is
    # also the shipped default (bf16 gradients were measured not to win,
    # docs/PERFORMANCE.md round 4); pinning it explicitly keeps the goldens
    # meaningful if that default ever changes (bf16-vs-f32 closeness is
    # asserted in tests/test_synths.py).
    reverb_grad_matmul_dtype="float32",
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


def _grad_pairs(grads, dec):
    """(name, jax grad leaf, torch parameter) triples, mirroring _install.

    ``dense_filter`` is excluded: the noise head is silenced on both sides
    (bias -40 -> ~1e-7 amplitude), so its gradients are degenerate noise.
    """
    ctrl = grads["controller"]
    pairs = []
    for name in ["mlp_f0", "mlp_loudness", "mlp_gru"]:
        t_mlp = getattr(dec.controller, name)
        for i, layer in enumerate(ctrl[name]["layers"], start=1):
            seq = getattr(t_mlp, f"mlp_layer{i}")
            pairs += [
                (f"{name}.{i}.dense.w", layer["dense"]["weight"], seq[0].weight),
                (f"{name}.{i}.dense.b", layer["dense"]["bias"], seq[0].bias),
                (f"{name}.{i}.norm.w", layer["norm"]["weight"], seq[1].weight),
                (f"{name}.{i}.norm.b", layer["norm"]["bias"], seq[1].bias),
            ]
    for li, lp in enumerate(ctrl["gru"]["layers"]):
        gru = dec.controller.gru
        pairs += [
            (f"gru.w_ih_l{li}", lp["w_ih"], getattr(gru, f"weight_ih_l{li}")),
            (f"gru.w_hh_l{li}", lp["w_hh"], getattr(gru, f"weight_hh_l{li}")),
            (f"gru.b_ih_l{li}", lp["b_ih"], getattr(gru, f"bias_ih_l{li}")),
            (f"gru.b_hh_l{li}", lp["b_hh"], getattr(gru, f"bias_hh_l{li}")),
        ]
    for name in ["dense_harmonic", "dense_loudness"]:
        head = getattr(dec.controller, name)
        pairs += [
            (f"{name}.w", ctrl[name]["weight"], head.weight),
            (f"{name}.b", ctrl[name]["bias"], head.bias),
        ]
    pairs += [
        ("reverb.noise", grads["reverb"]["noise"], dec.reverb.noise),
        ("reverb.decay", grads["reverb"]["decay"], dec.reverb.decay),
        ("reverb.wet", grads["reverb"]["wet"], dec.reverb.wet),
    ]
    return pairs


def test_full_decoder_gradients_match_torch_autograd(reference_path, snr):
    """d(MSS)/d(params) of the whole decoder chain vs torch autograd.

    Round-2 VERDICT Weak #3: forward parity (>40 dB) and Pallas-VJP-vs-XLA
    equivalence are both self-consistency checks; a shared wrong backward
    convention (interp edges, Nyquist renorm, phase accumulation) would
    pass both while training toward a different optimum than the reference
    (train/train.py:32-37).  Here: identical weights (via _install), same
    batch, noise branch silenced, and the torch side runs the reference
    Decoder + an autograd-traced replica of the reference MSSLoss
    (loss/mss_loss.py:11-33 -- torchaudio is not installed here, so its
    Spectrogram is expressed via torch.stft with the validated-identical
    convention, tests/test_spectral.py).  Every parameter's gradient must
    agree in direction (cosine) and magnitude (relative L2).

    On CPU this exercises the XLA oscillator path; combined with the
    Pallas-vs-XLA gradient equivalence in tests/test_pallas_oscillator.py
    the chain Pallas VJP == XLA autodiff == torch autograd pins the
    hand-written kernels to the reference's training math transitively.
    """
    from model.autoencoder.decoder import Decoder

    from ddsp_tpu.losses import mss_loss

    ffts = (512, 256, 128)
    params = decoder_init(jax.random.PRNGKey(3), CONF)
    params["controller"]["dense_filter"]["bias"] = (
        params["controller"]["dense_filter"]["bias"] * 0.0 - 40.0
    )
    params["controller"]["dense_filter"]["weight"] = (
        params["controller"]["dense_filter"]["weight"] * 0.0
    )
    dec = Decoder(_torch_conf()).train()
    _install(params, dec)

    rng = np.random.default_rng(7)
    t = 40
    batch = {
        "f0": rng.uniform(100, 500, (2, t, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (2, t, 1)).astype(np.float32),
        "loudness": rng.uniform(0, 1, (2, t, 1)).astype(np.float32),
    }
    target = (
        0.1 * rng.standard_normal((2, t * CONF.hop_length))
    ).astype(np.float32)

    def loss_fn(p):
        pred = decoder_apply(p, batch, CONF, jax.random.PRNGKey(1))
        return mss_loss(pred, jnp.asarray(target), ffts)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)

    def torch_sss(pred_t, true_t, n_fft):
        # reference SSSLoss via torch.stft (torchaudio Spectrogram
        # convention: power-2 magnitude, centered reflect pad, Hann)
        hop = int(n_fft * (1 - 0.75))
        win = torch.hann_window(n_fft)

        def spec(x):
            return (
                torch.stft(
                    x, n_fft=n_fft, hop_length=hop, window=win, center=True,
                    pad_mode="reflect", return_complex=True,
                )
                .abs()
                .pow(2)
            )

        s_pred, s_true = spec(pred_t), spec(true_t)
        linear = (s_pred - s_true).abs().mean()
        log = ((s_true + 1e-7).log2() - (s_pred + 1e-7).log2()).abs().mean()
        return linear + log

    pred_t = dec({k: torch.from_numpy(v) for k, v in batch.items()})
    true_t = torch.from_numpy(target)
    loss_t = sum(torch_sss(pred_t, true_t, n) for n in ffts)
    dec.zero_grad()
    loss_t.backward()

    assert abs(float(loss_j) - float(loss_t)) / float(loss_t) < 2e-3

    pairs = _grad_pairs(grads, dec)
    scale = max(
        float(np.linalg.norm(p.grad.detach().numpy())) for _, _, p in pairs
    )
    report = []
    for name, gj, p in pairs:
        gj = np.asarray(gj, np.float64).ravel()
        gt = p.grad.detach().numpy().astype(np.float64).ravel()
        assert gj.shape == gt.shape, name
        nt = np.linalg.norm(gt)
        if nt < 1e-7 * scale:  # degenerate leaf: just require ours tiny too
            assert np.linalg.norm(gj) < 1e-6 * scale, name
            continue
        cos = float(np.dot(gj, gt) / (np.linalg.norm(gj) * nt))
        rel = float(np.linalg.norm(gj - gt) / nt)
        report.append((name, cos, rel))
    worst_cos = min(r[1] for r in report)
    worst_rel = max(r[2] for r in report)
    bad = [r for r in report if r[1] < 0.999 or r[2] > 0.05]
    assert not bad, (worst_cos, worst_rel, bad)


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
