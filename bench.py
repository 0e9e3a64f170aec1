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
    import jax.numpy as jnp

    from ddsp_tpu.config import Config
    from ddsp_tpu.models.controller import decoder_apply, decoder_init

    conf = Config()
    batch_size = 16
    rng = np.random.default_rng(0)
    t = conf.frames_per_example
    batch = {
        "f0": jnp.asarray(rng.uniform(100, 600, (batch_size, t, 1)).astype(np.float32)),
        "normalized_cents": jnp.asarray(
            rng.uniform(0, 1, (batch_size, t, 1)).astype(np.float32)
        ),
        "loudness": jnp.asarray(
            rng.uniform(0, 1, (batch_size, t, 1)).astype(np.float32)
        ),
    }
    params = decoder_init(jax.random.PRNGKey(0), conf)
    key = jax.random.PRNGKey(1)

    # Measure pure device time: N forwards inside one jit, serialized by an
    # output->input dependency, so remote-dispatch latency and any host-side
    # effects cannot distort the number; per-iteration time is the marginal
    # (T_HI - T_LO) / (HI - LO) between two chain lengths, which subtracts
    # the tunnel's fixed per-call round trip (~100-400 ms on this harness —
    # a link property, not device time; same method as scripts/profile_*).
    lo, hi = 50, 200

    def make_many(iters):
        @jax.jit
        def many(params, batch, key):
            def body(carry, i):
                b2 = dict(batch, loudness=batch["loudness"] + carry * 1e-12)
                out = decoder_apply(params, b2, conf, jax.random.fold_in(key, i))
                return jnp.sum(out * out), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc
        return many

    runs = {n: make_many(n) for n in (lo, hi)}
    for n in (lo, hi):  # compile + warm up
        jax.block_until_ready(runs[n](params, batch, key))
    times = []
    for trial in range(4):  # fresh key per trial; first trial can report a
        k = jax.random.fold_in(key, 1000 + trial)  # spuriously-early ready
        ts = {}
        for n in (lo, hi):
            t0 = time.perf_counter()
            r = runs[n](params, batch, k)
            jax.block_until_ready(r)
            ts[n] = time.perf_counter() - t0
            assert np.isfinite(float(r)), float(r)
        times.append((ts[hi] - ts[lo]) / (hi - lo))
    dt = float(np.median(times[1:]))

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
