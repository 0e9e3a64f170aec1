"""Trainer: loss decreases on a tiny problem, checkpoint round trip,
reference torch checkpoint import."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import controller_apply, decoder_apply
from ddsp_tpu.models.torch_import import load_lightning_decoder
from ddsp_tpu.training.trainer import (
    fit,
    init_state,
    latest_checkpoint,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)

# Small config: short examples, tiny net, few harmonics -> fast CPU test
CONF = Config(
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
    mss_ffts=(256, 128, 64),
    checkpoint_every=0,
    log_every=5,
)


def _synthetic_features(conf, n=8, seed=0):
    """Harmonic-ish targets the decoder can actually fit."""
    rng = np.random.default_rng(seed)
    t_frames = conf.frames_per_example
    f0 = np.full((n, t_frames, 1), 200.0, np.float32)
    cents = np.full((n, t_frames, 1), 0.4, np.float32)
    loud = np.full((n, t_frames, 1), 0.7, np.float32)
    ts = np.arange(conf.example_length) / conf.sample_rate
    audio = np.stack(
        [
            sum(
                (0.5 / k) * np.sin(2 * np.pi * 200.0 * k * ts + rng.uniform(0, 6))
                for k in range(1, 4)
            )
            for _ in range(n)
        ]
    ).astype(np.float32)
    return {
        "f0": f0,
        "normalized_cents": cents,
        "loudness": loud,
        "audio": audio,
    }


def test_train_step_decreases_loss():
    feats = _synthetic_features(CONF)
    state = init_state(jax.random.PRNGKey(0), CONF)
    step = jax.jit(make_train_step(CONF))
    batch = {k: jnp.asarray(v[:4]) for k, v in feats.items()}
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["grad_norm"]))
    assert losses[-1] < losses[0] * 0.9, losses[::10]


def test_fit_and_checkpoint_roundtrip(tmp_path):
    conf = CONF.replace(checkpoint_dir=str(tmp_path / "ckpt"))
    feats = _synthetic_features(conf)
    state, metrics = fit(
        conf,
        feats,
        num_steps=6,
        log_path=str(tmp_path / "metrics.jsonl"),
        dump_audio_dir=str(tmp_path / "audio"),
    )
    assert int(state.step) == 6
    assert "loss" in metrics and np.isfinite(metrics["loss"])
    assert (tmp_path / "metrics.jsonl").exists()
    assert list((tmp_path / "audio").glob("*.wav"))

    path = save_checkpoint(conf.checkpoint_dir, state, conf)
    from ddsp_tpu.training.trainer import wait_for_checkpoints

    wait_for_checkpoints()  # async save: visible once committed
    assert latest_checkpoint(conf.checkpoint_dir) == path
    template = init_state(jax.random.PRNGKey(99), conf)
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params,
        state.params,
    )


def test_fit_device_steps_scan(tmp_path):
    """Device-resident scan trainer: loss decreases, step count advances,
    metrics/dumps written — same observable contract as the host loop."""
    conf = CONF.replace(checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=10)
    feats = _synthetic_features(conf)
    state, metrics = fit(
        conf,
        feats,
        num_steps=22,  # not a multiple of device_steps: remainder scan
        log_path=str(tmp_path / "metrics.jsonl"),
        dump_audio_dir=str(tmp_path / "audio"),
        device_steps=5,
        dump_every=4,
    )
    assert int(state.step) == 22
    assert np.isfinite(metrics["loss"])
    # the scan path reports the window mean too; training this long on a
    # constant-pitch target must improve on the initial loss
    state0 = init_state(jax.random.PRNGKey(0), CONF)
    from ddsp_tpu.training.trainer import loss_fn

    l0, _ = loss_fn(
        state0.params,
        {k: jnp.asarray(v[:4]) for k, v in feats.items()},
        CONF,
        jax.random.PRNGKey(1),
    )
    assert metrics["loss_mean"] < float(l0)
    assert latest_checkpoint(conf.checkpoint_dir)
    assert list((tmp_path / "audio").glob("*.wav"))


@pytest.mark.slow
def test_kill_and_resume_fault_injection(tmp_path):
    """Fault injection (SURVEY §5, failure detection/elastic recovery):
    SIGKILL a training process mid-run, then restart and resume from its
    latest Orbax checkpoint — the fail-stop SPMD recovery model."""
    import os
    import signal
    import subprocess
    import sys
    import time

    conf = CONF.replace(
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=4
    )
    feats = _synthetic_features(conf)
    np.savez(tmp_path / "feats.npz", **feats)

    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import numpy as np
from ddsp_tpu.config import Config
from ddsp_tpu.training.trainer import fit
conf = Config.from_json(open({repr(str(tmp_path / "conf.json"))}).read())
feats = dict(np.load({repr(str(tmp_path / "feats.npz"))}))
fit(conf, feats, num_steps=100000)
"""
    (tmp_path / "conf.json").write_text(conf.to_json())
    env = dict(os.environ)
    proc = subprocess.Popen([sys.executable, "-c", script], env=env)
    try:
        deadline = time.time() + 300
        while latest_checkpoint(conf.checkpoint_dir) is None:
            assert proc.poll() is None, "trainer died before checkpointing"
            assert time.time() < deadline, "no checkpoint within deadline"
            time.sleep(1.0)
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait()

    ckpt = latest_checkpoint(conf.checkpoint_dir)
    template = init_state(jax.random.PRNGKey(123), conf)
    state = restore_checkpoint(ckpt, template)
    killed_at = int(state.step)
    assert killed_at >= 4
    state, metrics = fit(conf, feats, num_steps=4, state=state)
    assert int(state.step) == killed_at + 4
    assert np.isfinite(metrics["loss"])


def test_torch_decoder_import(reference_path, tmp_path):
    """Round-trip: build the reference torch Decoder, save a Lightning-style
    ckpt, import it, and check the imported controller matches torch."""
    import types

    from model.autoencoder.decoder import Decoder

    conf = Config(
        n_harmonics=12,
        n_noise_filters=9,
        decoder_mlp_units=16,
        decoder_mlp_layers=2,
        decoder_gru_units=16,
        sample_rate=4000,
        hop_length=32,
    )
    t_conf = types.SimpleNamespace(
        decoder_mlp_units=16,
        decoder_mlp_layers=2,
        decoder_gru_units=16,
        decoder_gru_layers=1,
        n_harmonics=12,
        n_noise_filters=9,
        sample_rate=4000,
        hop_length=32,
    )
    torch.manual_seed(0)
    dec = Decoder(t_conf).eval()
    ckpt = {"state_dict": {f"model.{k}": v for k, v in dec.state_dict().items()}}
    path = str(tmp_path / "epoch=3-step=100.ckpt")
    torch.save(ckpt, path)

    params = load_lightning_decoder(path, conf)
    batch_np = {
        "f0": np.random.default_rng(0).uniform(100, 400, (1, 6, 1)).astype(np.float32),
        "normalized_cents": np.random.default_rng(1).uniform(0, 1, (1, 6, 1)).astype(np.float32),
        "loudness": np.random.default_rng(2).uniform(0, 1, (1, 6, 1)).astype(np.float32),
    }
    controls, _ = controller_apply(params["controller"], batch_np)
    with torch.no_grad():
        ref = dec.controller({k: torch.from_numpy(v) for k, v in batch_np.items()})
    np.testing.assert_allclose(np.asarray(controls["c"]), ref["c"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(controls["H"]), ref["H"].numpy(), atol=2e-5)
    # reverb params imported
    np.testing.assert_allclose(
        np.asarray(params["reverb"]["noise"]), dec.reverb.noise.detach().numpy(), atol=1e-7
    )
    # imported decoder renders finite audio end to end
    audio = decoder_apply(params, batch_np, conf, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(audio)))


def test_find_latest_lightning_checkpoint(tmp_path):
    """Newest .ckpt by parsed epoch (reference rt/utils.py:8-16)."""
    import pytest

    from ddsp_tpu.models.torch_import import find_latest_lightning_checkpoint

    ckpts = tmp_path / "version_7" / "checkpoints"
    ckpts.mkdir(parents=True)
    for name in ["epoch=3-step=100.ckpt", "epoch=12-step=400.ckpt", "last.ckpt"]:
        (ckpts / name).touch()
    best = find_latest_lightning_checkpoint(str(tmp_path), 7)
    assert best.endswith("epoch=12-step=400.ckpt")
    with pytest.raises(FileNotFoundError):
        find_latest_lightning_checkpoint(str(tmp_path), 8)


def test_train_cli_help(capsys):
    """--help prints usage instead of crashing on an unknown config key."""
    from ddsp_tpu.training.train import main

    main(["--help"])
    out = capsys.readouterr().out
    assert "--num_steps" in out and "--data_dir" in out


def test_fit_logs_eval_loss(tmp_path):
    """Held-out eval loss is a first-class logged metric (the reference's
    validation pass, train/train.py:39-43 + limit_val_batches)."""
    import json

    import jax

    from ddsp_tpu.training.trainer import fit

    conf = CONF.replace(log_every=2, checkpoint_every=0)
    rng = np.random.default_rng(0)
    t = conf.frames_per_example

    def rows(n):
        return {
            "f0": rng.uniform(100, 400, (n, t, 1)).astype(np.float32),
            "normalized_cents": rng.uniform(0, 1, (n, t, 1)).astype(np.float32),
            "loudness": rng.uniform(0, 1, (n, t, 1)).astype(np.float32),
            "audio": (0.1 * rng.standard_normal((n, conf.example_length))).astype(
                np.float32
            ),
        }

    log = str(tmp_path / "m.jsonl")
    for device_steps in (0, 2):  # classic loop and scan trainer
        _, metrics = fit(
            conf,
            rows(2 * conf.batch_size),
            num_steps=4,
            log_path=log,
            device_steps=device_steps,
            eval_features=rows(conf.batch_size // 2),  # < one batch: tiled
        )
        assert np.isfinite(metrics["eval_loss"]), metrics
    logged = [json.loads(line) for line in open(log)]
    assert any("eval_loss" in row for row in logged)


def test_async_checkpoint_retention_and_resume(tmp_path):
    """Async saves commit in the background, old checkpoints are pruned to
    conf.checkpoint_keep, and the newest restores bit-exactly (VERDICT
    round-1 Weak #5: saves were synchronous and unbounded)."""
    import os

    from ddsp_tpu.training.trainer import wait_for_checkpoints

    conf = CONF.replace(
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_keep=2,
        checkpoint_async=True,
    )
    state = init_state(jax.random.PRNGKey(0), conf)
    for step in (1, 2, 3, 4, 5):
        s = state._replace(step=jnp.asarray(step, jnp.int32))
        save_checkpoint(conf.checkpoint_dir, s, conf)
    wait_for_checkpoints()
    dirs = sorted(
        d for d in os.listdir(conf.checkpoint_dir) if d.startswith("step_")
        and "tmp" not in d
    )
    assert dirs == ["step_00000004", "step_00000005"], dirs

    newest = latest_checkpoint(conf.checkpoint_dir)
    template = init_state(jax.random.PRNGKey(99), conf)
    restored = restore_checkpoint(newest, template)
    assert int(restored.step) == 5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params,
        state.params,
    )


def test_checkpoint_resave_same_step_overwrites(tmp_path):
    """Saving a DIFFERENT state at an existing step_N path must overwrite
    it, not silently skip (silent skip = data loss for a re-run landing on
    the same step count, e.g. two --finetune_crepe runs)."""
    from ddsp_tpu.training.trainer import wait_for_checkpoints

    conf = CONF.replace(checkpoint_dir=str(tmp_path / "ckpt"))
    s1 = init_state(jax.random.PRNGKey(0), conf)
    s2 = init_state(jax.random.PRNGKey(7), conf)  # different params, same step
    save_checkpoint(conf.checkpoint_dir, s1, conf)
    path = save_checkpoint(conf.checkpoint_dir, s2, conf)
    wait_for_checkpoints()
    restored = restore_checkpoint(path, init_state(jax.random.PRNGKey(3), conf))
    l_want = jax.tree_util.tree_leaves(s2.params)
    l_got = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(l_want, l_got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plateau_schedule_drops_lr():
    """A plateaued loss must actually decay the LR scale by
    lr_plateau_factor after lr_plateau_patience windows
    (reference ReduceLROnPlateau semantics, train/train.py:21-30;
    window size now configurable, VERDICT round-1 Weak #6)."""
    from ddsp_tpu.training.trainer import make_optimizer

    conf = CONF.replace(
        lr_plateau_accumulation=1,  # per-step monitoring like torch
        lr_plateau_patience=2,
        lr_plateau_factor=0.1,
    )
    tx = make_optimizer(conf)
    params = {"w": jnp.zeros(3)}
    st = tx.init(params)
    grads = {"w": jnp.full((3,), 1e-12)}

    def scale_of(st):
        leaves = [
            s for s in jax.tree_util.tree_leaves(st, is_leaf=lambda x: hasattr(x, "scale"))
            if hasattr(s, "scale")
        ]
        return float(leaves[0].scale)

    assert scale_of(st) == 1.0
    for _ in range(10):  # constant loss = plateau from the first window
        _, st = tx.update(grads, st, params, value=jnp.float32(1.0))
    assert scale_of(st) <= conf.lr_plateau_factor + 1e-6


def test_plateau_accumulation_is_configurable():
    """With a large accumulation window the same 10 plateaued steps must
    NOT decay yet (only a fraction of one window has accumulated)."""
    from ddsp_tpu.training.trainer import make_optimizer

    conf = CONF.replace(
        lr_plateau_accumulation=100, lr_plateau_patience=2
    )
    tx = make_optimizer(conf)
    params = {"w": jnp.zeros(3)}
    st = tx.init(params)
    grads = {"w": jnp.full((3,), 1e-12)}
    for _ in range(10):
        _, st = tx.update(grads, st, params, value=jnp.float32(1.0))
    leaves = [
        s for s in jax.tree_util.tree_leaves(st, is_leaf=lambda x: hasattr(x, "scale"))
        if hasattr(s, "scale")
    ]
    assert float(leaves[0].scale) == 1.0


def test_finetune_gradients_flow_into_crepe():
    """Analysis-by-synthesis finetuning (reference only comments on it,
    encoder.py:32-34): with a differentiable pitch decode the CREPE weights
    receive nonzero gradients; with freeze_crepe (the loss_fn regime) they
    receive exactly zero.  One finetune step must stay finite."""
    import optax

    from ddsp_tpu.models.autoencoder import autoencoder_apply
    from ddsp_tpu.training.trainer import (
        init_finetune_state,
        loss_fn_e2e,
        make_finetune_step,
    )

    conf = CONF.replace(pitch_decode="weighted", mss_ffts=(256, 128))
    key = jax.random.PRNGKey(0)
    state = init_finetune_state(key, conf)
    feats = _synthetic_features(conf, n=4)
    batch = {"audio": jnp.asarray(feats["audio"])}

    grads = jax.grad(
        lambda p: loss_fn_e2e(p, batch, conf, jax.random.PRNGKey(1))[0]
    )(state.params)
    crepe_norm = float(optax.global_norm(grads["crepe"]))
    dec_norm = float(optax.global_norm(grads["decoder"]))
    assert np.isfinite(crepe_norm) and crepe_norm > 0.0
    assert np.isfinite(dec_norm) and dec_norm > 0.0

    # frozen-encoder contrast: zero gradient into CREPE
    def frozen_loss(p):
        pred = autoencoder_apply(
            p, batch["audio"], conf, jax.random.PRNGKey(1), freeze_crepe=True
        )
        return jnp.sum(pred**2)

    frozen = jax.grad(frozen_loss)(state.params)
    assert float(optax.global_norm(frozen["crepe"])) == 0.0

    step = jax.jit(make_finetune_step(conf))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_finetune_requires_differentiable_decode():
    from ddsp_tpu.training.trainer import make_finetune_step

    with pytest.raises(ValueError, match="differentiable"):
        make_finetune_step(CONF.replace(pitch_decode="argmax"))
