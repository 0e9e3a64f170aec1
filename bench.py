"""Benchmark: synth forward render throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: audio samples/s/chip through the full decoder forward (controller
-> oscillator bank + filtered noise -> learned reverb) at the reference's
production shape (batch 16 x 2 s examples, 172 frames, 180 harmonics,
44.1 kHz).  Baseline: the BASELINE.md target of 100x realtime per chip
(4.41 M samples/s) -- the reference publishes no numbers (SURVEY.md §6),
so vs_baseline > 1.0 means the >100x-realtime north star is beaten.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from ddsp_tpu.config import Config
    from ddsp_tpu.models.controller import decoder_apply, decoder_init

    conf = Config()
    batch_size = 16
    rng = np.random.default_rng(0)
    t = conf.frames_per_example
    batch = {
        "f0": rng.uniform(100, 600, (batch_size, t, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (batch_size, t, 1)).astype(np.float32),
        "loudness": rng.uniform(0, 1, (batch_size, t, 1)).astype(np.float32),
    }
    params = decoder_init(jax.random.PRNGKey(0), conf)
    key = jax.random.PRNGKey(1)

    fwd = jax.jit(lambda p, b, k: decoder_apply(p, b, conf, k))
    out = fwd(params, batch, key)
    jax.block_until_ready(out)  # compile + warm up

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(params, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    samples_per_s = batch_size * conf.example_length / dt
    baseline = 100 * conf.sample_rate  # 100x realtime per chip target
    print(
        json.dumps(
            {
                "metric": "synth_forward_samples_per_s_per_chip",
                "value": round(samples_per_s, 1),
                "unit": "audio samples/s",
                "vs_baseline": round(samples_per_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
