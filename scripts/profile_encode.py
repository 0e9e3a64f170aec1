"""Measure offline feature-extraction throughput on the real chip.

The reference's dataset build runs the frozen encoder (CREPE pitch CNN +
A-weighted loudness) over every 2 s example on GPU (reference:
dataset/audio_dataset.py:84-90); SURVEY.md ranks the CREPE conv stack as
hot loop #5.  This times the same jitted batched encode --
(B, 88064) audio -> {f0, harmonicity, loudness, normalized_cents,
probabilities} -- and reports audio-seconds processed per second per chip.

Tunnel-safe method (CLAUDE.md): N encodes chained inside one jit via
lax.scan with an output->input dependency; params as jit arguments;
median of varied-input trials after a warm-up.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.config import Config
    from ddsp_tpu.models.autoencoder import feature_pad
    from ddsp_tpu.models.crepe import crepe_init, load_torch_checkpoint
    from ddsp_tpu.models.encoder import encoder_apply

    conf = Config()
    tiny = "/root/reference/crepe/pretrained/tiny.pth"
    crepe_params = (
        load_torch_checkpoint(tiny)
        if os.path.exists(tiny)
        else crepe_init(jax.random.PRNGKey(2), capacity=conf.crepe_capacity)
    )
    batch = 16
    iters = 20

    @jax.jit
    def many(crepe_params, audio):
        def body(carry, i):
            feats = encoder_apply(crepe_params, feature_pad(carry, conf), conf)
            # output->input dependency: nudge the audio by a feature-derived
            # epsilon so the chain cannot be collapsed or reordered
            eps = 1e-12 * jnp.mean(feats["loudness"])
            return carry + eps, feats["f0"][:, 0, 0]

        final, f0s = jax.lax.scan(body, audio, jnp.arange(iters))
        return jnp.sum(f0s) + jnp.sum(final * 1e-20)

    rng = np.random.default_rng(0)
    t = np.arange(conf.example_length) / conf.sample_rate
    audio = jnp.asarray(
        0.3 * np.sin(2 * np.pi * 220 * t)[None] * np.ones((batch, 1)),
        jnp.float32,
    )
    r = many(crepe_params, audio)
    jax.block_until_ready(r)  # compile + warm up
    times = []
    for trial in range(4):
        a = audio + 0.01 * jnp.asarray(
            rng.standard_normal(audio.shape), jnp.float32
        )
        t0 = time.perf_counter()
        r = many(crepe_params, a)
        jax.block_until_ready(r)
        times.append((time.perf_counter() - t0) / iters)
        assert np.isfinite(float(r))
    dt = float(np.median(times))
    audio_s = batch * conf.example_length / conf.sample_rate
    print(
        f"offline encode (CREPE-{conf.crepe_capacity} + loudness, batch {batch}"
        f" x 2 s): {1e3 * dt:.2f} ms/batch = {audio_s / dt:.0f}x realtime"
        f" = {batch * conf.frames_per_example / dt:.0f} frames/s/chip"
    )


if __name__ == "__main__":
    main()
