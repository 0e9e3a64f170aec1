"""Measure multi-stream serving capacity on the real chip.

Per-hop device time of the fused N-slot step (CREPE features + controller
+ osc/noise/reverb for N concurrent streams) vs N, and the implied
serving capacity: the largest N whose hop time stays inside the real-time
deadline (hop/sample_rate = 11.6 ms at the default config).

The single-stream hop is latency-bound (GRU + dispatch), so N slots cost
far less than N x one slot -- the TPU-native serving win the reference's
one-client design (reference rt/synth.py:16-27) cannot express.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_multistream.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import decoder_init
from ddsp_tpu.models.crepe import crepe_init, load_torch_checkpoint
from ddsp_tpu.runtime.multistream import make_multistream_step, multistream_init
from ddsp_tpu.utils.profiling import marginal_chain_time


def hop_time(conf, params, crepe, n_streams):
    step = make_multistream_step(params, crepe, conf, jax.random.PRNGKey(2))
    state0 = multistream_init(conf, n_streams)
    rng = np.random.default_rng(0)

    def make_many(iters):
        @jax.jit
        def many(state, seed_blocks):
            def body(carry, i):
                st, blocks = carry
                out, st = step(st, blocks)  # nested jit inlines
                return (st, jnp.tanh(out)), None  # feedback dependency

            (st, last), _ = jax.lax.scan(
                body, (state, seed_blocks), jnp.arange(iters)
            )
            return jnp.sum(last)

        return many

    def args(trial):
        return (
            state0,
            jnp.asarray(
                0.1 * rng.standard_normal((n_streams, conf.hop_length)),
                jnp.float32,
            ),
        )

    return marginal_chain_time(make_many, args)


def main():
    conf = Config()
    if jax.default_backend() != "tpu":
        print("needs the real chip", file=sys.stderr)
        sys.exit(1)
    tiny = "/root/reference/crepe/pretrained/tiny.pth"
    crepe = (
        load_torch_checkpoint(tiny)
        if os.path.exists(tiny)
        else crepe_init(jax.random.PRNGKey(1), conf.crepe_capacity)
    )
    params = decoder_init(jax.random.PRNGKey(0), conf)
    deadline = conf.hop_length / conf.sample_rate
    print(f"deadline {1e3*deadline:.2f} ms/hop")
    for n in (1, 4, 16, 64, 256):
        dt = hop_time(conf, params, crepe, n)
        ok = "OK " if dt < deadline else "MISS"
        print(
            f"N={n:4d}  {1e3*dt:7.3f} ms/hop  {1e3*dt/n:7.4f} ms/stream  "
            f"headroom {deadline/dt:6.1f}x  [{ok}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
