"""Train-step throughput vs batch size on the real chip.

The reference trains at batch 16 (config/default.py:24) on one GPU; this
measures how the jitted train step (decoder -> synth -> 6-scale MSS loss ->
Adam) amortizes with batch on one TPU chip, reporting steps/s and
audio-seconds learned per second.

Tunnel-safe method (CLAUDE.md): N optimizer steps chained inside one jit
via lax.scan (the TrainState carry is the output->input dependency);
params/batch as jit arguments; median of varied-input trials.
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
    from ddsp_tpu.training.trainer import init_state, make_train_step

    conf = Config()
    iters = 30
    step = make_train_step(conf)

    for batch_size in (8, 16, 32, 64):
        rng = np.random.default_rng(0)
        t = conf.frames_per_example
        batch = {
            "f0": jnp.asarray(
                rng.uniform(100, 600, (batch_size, t, 1)).astype(np.float32)
            ),
            "normalized_cents": jnp.asarray(
                rng.uniform(0, 1, (batch_size, t, 1)).astype(np.float32)
            ),
            "loudness": jnp.asarray(
                rng.uniform(0, 1, (batch_size, t, 1)).astype(np.float32)
            ),
            "audio": jnp.asarray(
                (0.1 * rng.standard_normal((batch_size, conf.example_length))).astype(
                    np.float32
                )
            ),
        }

        @jax.jit
        def many(state, batch, eps):
            def body(carry, i):
                b = dict(batch, loudness=batch["loudness"] + eps * 1e-12)
                st, metrics = step(carry, b)
                return st, metrics["loss"]

            st, losses = jax.lax.scan(body, state, jnp.arange(iters))
            return losses[-1]

        state = init_state(jax.random.PRNGKey(0), conf)
        r = many(state, batch, jnp.float32(0))
        jax.block_until_ready(r)  # compile + warm up
        times = []
        for trial in range(3):
            t0 = time.perf_counter()
            r = many(state, batch, jnp.float32(trial + 1))
            jax.block_until_ready(r)
            times.append((time.perf_counter() - t0) / iters)
            assert np.isfinite(float(r)), float(r)
        dt = float(np.median(times))
        audio_s = batch_size * conf.example_length / conf.sample_rate
        print(
            f"batch {batch_size:3d}: {1e3 * dt:6.2f} ms/step = {1 / dt:6.1f} steps/s"
            f" = {audio_s / dt:7.0f} s of audio learned / s"
        )


if __name__ == "__main__":
    main()
