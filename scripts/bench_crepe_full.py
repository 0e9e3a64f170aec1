"""CREPE 'full' capacity on-chip bench (round-3 VERDICT #8).

The reference defaults to crepe_capacity='full' (config/default.py:16) but
ships only 'tiny' (487k params; full.pth is a stripped blob,
.MISSING_LARGE_BLOBS).  The converter supports full-capacity checkpoints;
this measures what serving/dataset-build capacity actually looks like at
the 22 M-param 'full' stack: encode throughput at f32 and bf16 conv
dtypes, A/B'd against 'tiny' in the same run, plus the 256-slot
multistream hop with a full-capacity feature stage (the slot-count impact
on the serving frontier).

Weights are randomly initialized -- throughput does not depend on values.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_crepe_full.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.config import Config
    from ddsp_tpu.models.autoencoder import feature_pad
    from ddsp_tpu.models.controller import decoder_init
    from ddsp_tpu.models.crepe import crepe_init
    from ddsp_tpu.models.encoder import encoder_apply
    from ddsp_tpu.models.nn import count_params
    from ddsp_tpu.runtime.multistream import (
        make_multistream_step,
        multistream_init,
    )
    from ddsp_tpu.utils.profiling import marginal_chain_time
    from ddsp_tpu.utils.roofline import MXU_BF16, encode_flops

    batch = 16
    rng = np.random.default_rng(0)
    params = {
        cap: crepe_init(jax.random.PRNGKey(2), capacity=cap)
        for cap in ("tiny", "full")
    }
    for cap, p in params.items():
        print(f"[{cap}] {count_params(p):,} params", file=sys.stderr, flush=True)

    def encode_time(conf, crepe_params):
        def make_many(iters):
            @jax.jit
            def many(crepe_params, audio):
                def body(carry, i):
                    feats = encoder_apply(
                        crepe_params, feature_pad(carry, conf), conf
                    )
                    eps = 1e-12 * jnp.mean(feats["loudness"])
                    return carry + eps, feats["f0"][:, 0, 0]

                final, f0s = jax.lax.scan(body, audio, jnp.arange(iters))
                return jnp.sum(f0s) + jnp.sum(final * 1e-20)

            return many

        t = np.arange(conf.example_length) / conf.sample_rate
        audio = jnp.asarray(
            0.3 * np.sin(2 * np.pi * 220 * t)[None] * np.ones((batch, 1)),
            jnp.float32,
        )

        def trial_args(trial):
            noisy = audio + 0.01 * jnp.asarray(
                rng.standard_normal(audio.shape), jnp.float32
            )
            return (crepe_params, noisy)

        return marginal_chain_time(make_many, trial_args)

    results = {}
    for cap in ("tiny", "full"):
        for dtype in ("float32", "bfloat16"):
            conf = Config(crepe_capacity=cap, crepe_compute_dtype=dtype)
            dt = encode_time(conf, params[cap])
            sps = batch * conf.example_length / dt
            flops = encode_flops(batch, conf.frames_per_example, conf)
            key = f"encode_{cap}_{dtype}"
            results[key] = {
                "ms_per_batch": round(1e3 * dt, 3),
                "samples_per_s": round(sps, 1),
                "x_realtime": round(sps / conf.sample_rate, 1),
                "mfu_vs_bf16_peak": round(flops / dt / MXU_BF16, 4),
            }
            print(json.dumps({"metric": key, **results[key]}), flush=True)

    # Serving impact: 256-slot multistream hop, tiny vs full feature stage.
    deadline = 512 / 44100
    for cap in ("tiny", "full"):
        conf = Config(crepe_capacity=cap)
        dec = decoder_init(jax.random.PRNGKey(0), conf)
        step = make_multistream_step(
            dec, params[cap], conf, jax.random.PRNGKey(2)
        )
        n = 256
        state0 = multistream_init(conf, n)

        def make_many(iters, step=step):
            @jax.jit
            def many(state, seed_blocks):
                def body(carry, i):
                    st, blocks = carry
                    out, st = step(st, blocks)
                    return (st, jnp.tanh(out)), None

                (st, last), _ = jax.lax.scan(
                    body, (state, seed_blocks), jnp.arange(iters)
                )
                return jnp.sum(last)

            return many

        dt = marginal_chain_time(
            make_many,
            lambda trial: (
                state0,
                jnp.asarray(
                    0.1 * rng.standard_normal((n, conf.hop_length)), jnp.float32
                ),
            ),
        )
        key = f"multistream_256_hop_ms_crepe_{cap}"
        results[key] = round(1e3 * dt, 4)
        print(
            json.dumps(
                {
                    "metric": key,
                    "value": results[key],
                    "headroom": round(deadline / dt, 2),
                }
            ),
            flush=True,
        )

    print(json.dumps({"metric": "crepe_full_bench", "results": results}), flush=True)


if __name__ == "__main__":
    main()
