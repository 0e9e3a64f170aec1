"""Drive the analysis-by-synthesis CREPE finetune on the real chip.

Round-2 VERDICT next-step #9: the finetune path (training/trainer.finetune,
the working version of the reference's encoder.py:32-34 comment) was
CPU-tested only.  This runs a short finetune at production-adjacent config
on the TPU: synthetic melodic corpus, pitch_decode='weighted' (argmax has
zero gradient into CREPE), loss trajectory + steps/s streamed to JSONL,
and an f0-drift readout (how far finetuning moved CREPE's pitch estimates
on a held tone, in cents).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/finetune_drive.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import decoder_init
from ddsp_tpu.models.crepe import crepe_init, load_torch_checkpoint
from ddsp_tpu.models.encoder import encoder_apply
from ddsp_tpu.models.autoencoder import feature_pad
from ddsp_tpu.training.trainer import finetune

STEPS = int(os.environ.get("FINETUNE_STEPS", "60"))
LOG = os.environ.get("FINETUNE_LOG", "/tmp/finetune_chip.jsonl")


def synth_corpus(conf, n=24, seed=0):
    """Melodic tones with vibrato + harmonics (the convergence-demo recipe)."""
    rng = np.random.default_rng(seed)
    t = np.arange(conf.example_length) / conf.sample_rate
    exs = []
    for i in range(n):
        f0 = rng.uniform(150, 450)
        vib = rng.uniform(2, 6)
        f = f0 * (1 + 0.01 * np.sin(2 * np.pi * vib * t))
        phase = 2 * np.pi * np.cumsum(f) / conf.sample_rate
        x = sum((0.5 / k) * np.sin(k * phase) for k in range(1, 6))
        env = 0.2 + 0.6 * np.abs(np.sin(2 * np.pi * rng.uniform(0.3, 1.0) * t))
        exs.append((x * env).astype(np.float32))
    return np.stack(exs)


def mean_f0_cents(crepe_params, conf, tone_hz=440.0):
    t = np.arange(conf.example_length) / conf.sample_rate
    audio = (0.4 * np.sin(2 * np.pi * tone_hz * t)).astype(np.float32)[None]
    feats = jax.jit(
        lambda cp, a: encoder_apply(cp, feature_pad(a, conf), conf)
    )(crepe_params, jnp.asarray(audio))
    f0 = np.asarray(feats["f0"])[0, 20:-20, 0]
    return float(np.mean(1200 * np.log2(f0 / tone_hz)))


def main():
    conf = Config(pitch_decode="weighted", batch_size=8, log_every=5)
    tiny = "/root/reference/crepe/pretrained/tiny.pth"
    crepe = (
        load_torch_checkpoint(tiny)
        if os.path.exists(tiny)
        else crepe_init(jax.random.PRNGKey(1), conf.crepe_capacity)
    )
    decoder = decoder_init(jax.random.PRNGKey(0), conf)
    audio = synth_corpus(conf)

    before_cents = mean_f0_cents(crepe, conf)
    print(f"f0 bias before finetune: {before_cents:+.2f} cents @440", flush=True)

    state, last = finetune(
        conf, audio, STEPS, decoder, crepe, log_path=LOG, seed=0
    )
    after_cents = mean_f0_cents(state.params["crepe"], conf)

    rows = [json.loads(l) for l in open(LOG)]
    first_loss = rows[0]["loss"]
    print(
        json.dumps(
            {
                "steps": STEPS,
                "first_logged_loss": first_loss,
                "final_loss": last["loss"],
                "steps_per_s": last["steps_per_s"],
                "f0_cents_before": round(before_cents, 2),
                "f0_cents_after": round(after_cents, 2),
                "f0_drift_cents": round(after_cents - before_cents, 2),
                "log": LOG,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
