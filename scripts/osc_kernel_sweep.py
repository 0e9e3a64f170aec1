"""Ablation sweep of the Pallas oscillator forward kernel on the real chip.

Marginal device time per call = (T_hi - T_lo) / (hi - lo) with hi/lo chained
iterations inside one jit, each iteration's checksum accumulated into the
returned scalar (so no iteration can be elided or cached away).
"""

import functools
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
    _render_from_phase,
    nyquist_normalized_amps,
)
from ddsp_tpu.ops.pallas.oscillator import _pallas_forward

# Chain lengths sized so HI-LO is ~1-2 s of device work: the tunnel's
# per-call jitter is 10s of ms, so a 50-iteration marginal (~100 ms of
# work, the original sweep) cannot resolve ~2 ms kernels reliably.
LO, HI = 250, 1000
TRIALS = 5


def marginal_time(fn, phase1, amps, loud):
    def make_run(iters):
        @jax.jit
        def run(p, a, l):
            def body(c, _):
                p, a, l = c
                out = fn(p, a, l)
                eps = 1e-30 * jnp.sum(out)
                return (p + eps, a + eps, l + eps), jnp.sum(out)

            _, sums = jax.lax.scan(body, (p, a, l), None, length=iters)
            return jnp.sum(sums)

        return run

    runs = {n: make_run(n) for n in (LO, HI)}
    for n in (LO, HI):
        float(runs[n](phase1, amps, loud))  # compile + warm
    per_iter = []
    for trial in range(TRIALS):
        a2 = amps.at[0, 0, 0].set(0.25 + 0.125 * trial)
        jax.block_until_ready(a2)
        ts = {}
        for n in (LO, HI):
            t0 = time.perf_counter()
            float(runs[n](phase1, a2, loud))
            ts[n] = time.perf_counter() - t0
        per_iter.append((ts[HI] - ts[LO]) / (HI - LO))
    return float(np.median(per_iter[1:]))


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

    xla = lambda p, a, l: _render_from_phase(p, a, l, a.shape[-1])
    print(f"xla                   {marginal_time(xla, phase1, amps, loud)*1e3:7.3f} ms", flush=True)
    for fpb in (4, 8, 16):
        for resync in (16, 32, 64, 180):
            fn = functools.partial(_pallas_forward, frames_per_block=fpb, resync=resync)
            dt = marginal_time(fn, phase1, amps, loud)
            print(f"fpb={fpb:3d} resync={resync:3d}  {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
