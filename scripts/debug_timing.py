"""Sanity-check device timing through the tunnel: ITERS=1 vs ITERS=60."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.ops.oscillator import (
    _fundamental_phase_cycles,
    nyquist_normalized_amps,
)
from ddsp_tpu.ops.pallas.oscillator import _pallas_forward


def make_run(iters):
    @jax.jit
    def run(phase1, amps, loud):
        def body(c, _):
            p, a, l = c
            out = _pallas_forward(p, a, l, 4)
            eps = 1e-30 * jnp.sum(out)
            return (p + eps, a + eps, l + eps), jnp.sum(out)

        (_, _, _), sums = jax.lax.scan(body, (phase1, amps, loud), None, length=iters)
        return jnp.sum(sums)

    return run


def main():
    conf = Config()
    b, t, hop, h = 16, conf.frames_per_example, conf.hop_length, conf.n_harmonics
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.uniform(100, 600, (b, t + 2, 1)).astype(np.float32))
    amps = jnp.asarray(rng.uniform(0, 1, (b, t + 2, h)).astype(np.float32))
    loud = jnp.asarray(rng.uniform(0, 1, (b, t + 2)).astype(np.float32))
    amps = nyquist_normalized_amps(f0, amps, conf.sample_rate)
    phase1 = _fundamental_phase_cycles(
        f0[..., 0], hop, conf.sample_rate, jnp.zeros((b,), jnp.float32)
    )
    phase1, amps, loud = jax.block_until_ready((phase1, amps, loud))

    for iters in (1, 10, 60):
        run = make_run(iters)
        print(f"iters={iters} compile+first: ", end="", flush=True)
        t0 = time.perf_counter()
        v = float(run(phase1, amps, loud))
        print(f"{time.perf_counter() - t0:.3f} s (sum={v:.3f})")
        for trial in range(3):
            a2 = amps.at[0, 0, 0].set(0.25 + 0.125 * trial)
            jax.block_until_ready(a2)
            t0 = time.perf_counter()
            v = float(run(phase1, a2, loud))
            dt = time.perf_counter() - t0
            print(f"  trial {trial}: total {dt*1e3:8.2f} ms  per-iter {dt/iters*1e3:7.3f} ms (sum={v:.3f})")


if __name__ == "__main__":
    main()
