"""Serving-capacity frontier sweep: per-hop device time vs slot count.

Round-3 measured 0.965 ms @ 256 slots and 5.08 ms @ 1024 (BENCH_r03.json)
against the reference's 11.6 ms real-time deadline (reference
rt/synth.py:53-55, one JACK client).  This sweep measures the fused
multi-stream step (runtime/multistream.py: CREPE features + controller +
oscillator/noise/FDL-reverb for every slot in one jit) at slot counts
bracketing the deadline, all interleaved within ONE run (CLAUDE.md: chip
timings drift ~40% across hours; never compare across sessions).

Prints one JSON line per (slot count, hop ms) plus a final frontier line:
the largest swept slot count whose hop fits the deadline with the given
safety margin.

Usage: python scripts/multistream_frontier.py [n1 n2 ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.config import Config
    from ddsp_tpu.models.controller import decoder_init
    from ddsp_tpu.models.crepe import crepe_init, load_torch_checkpoint
    from ddsp_tpu.runtime.multistream import (
        make_multistream_step,
        multistream_init,
    )
    from ddsp_tpu.utils.profiling import marginal_chain_time

    ns = [int(a) for a in sys.argv[1:]] or [1024, 1536, 2048, 2560, 3072]
    conf = Config()
    tiny = "/root/reference/crepe/pretrained/tiny.pth"
    crepe_params = (
        load_torch_checkpoint(tiny)
        if os.path.exists(tiny)
        else crepe_init(jax.random.PRNGKey(2), capacity="tiny")
    )
    params = decoder_init(jax.random.PRNGKey(0), conf)
    rng = np.random.default_rng(0)
    deadline = conf.hop_length / conf.sample_rate  # 11.61 ms

    def measure(n):
        step = make_multistream_step(
            params, crepe_params, conf, jax.random.PRNGKey(2)
        )
        state0 = multistream_init(conf, n)

        def make_many(iters):
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

        return marginal_chain_time(
            make_many,
            lambda trial: (
                state0,
                jnp.asarray(
                    0.1 * rng.standard_normal((n, conf.hop_length)), jnp.float32
                ),
            ),
            target_s=4.0,
        )

    # Two interleaved passes over the sweep; keep the per-n minimum so a
    # transient ambient excursion in one pass cannot fake a frontier edge.
    results = {}
    for rep in range(2):
        for n in ns:
            t0 = time.time()
            dt = measure(n)
            results[n] = min(results.get(n, np.inf), dt)
            print(
                json.dumps(
                    {
                        "slots": n,
                        "rep": rep,
                        "hop_ms": round(1e3 * dt, 4),
                        "per_stream_us": round(1e6 * dt / n, 3),
                        "headroom": round(deadline / dt, 3),
                        "wall_s": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )

    fit = [n for n in ns if results[n] < deadline]
    frontier = max(fit) if fit else 0
    print(
        json.dumps(
            {
                "metric": "multistream_frontier_slots",
                "value": frontier,
                "unit": "concurrent real-time streams/chip (swept)",
                "deadline_ms": round(1e3 * deadline, 3),
                "hops_ms": {str(n): round(1e3 * results[n], 4) for n in ns},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
