"""Latency of the frame-rate sequential scans vs their unroll factor.

The two sequential-in-time components (SURVEY 'GRU in a pjit world') are
the controller GRU and the fundamental-phase Kahan accumulation
(ops/oscillator._fundamental_phase_cycles).  Both run as lax.scan whose
per-iteration cost at small batch is loop/dispatch latency, not compute --
so the unroll factor is a pure latency lever with bit-identical numerics
(the adds happen in the same order).  Sweeps B=16/T=172 (training shape)
and B=1/T=5168 (60 s serving render, the round-2 VERDICT Weak #7 shape).
"""

import sys

sys.path.insert(0, "/root/repo")

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ddsp_tpu.utils.profiling import marginal_chain_time

HOP, SR = 512, 44100


def time_phase(b, t, unroll):
    from ddsp_tpu.ops.interp import hop_weight_cumsum

    rng = np.random.default_rng(0)
    f0_pad = jnp.asarray(rng.uniform(100, 600, (b, t + 2)).astype(np.float32))

    def phase_fn(f0_pad, initial):
        # _fundamental_phase_cycles with a parameterized unroll
        w = f0_pad / SR
        left, mid, right = w[:, :-2], w[:, 1:-1], w[:, 2:]
        csum = jnp.asarray(hop_weight_cumsum(HOP))
        partial = (
            left[:, :, None] * csum[None, None, :, 0]
            + mid[:, :, None] * csum[None, None, :, 1]
            + right[:, :, None] * csum[None, None, :, 2]
        )
        delta = partial[:, :, -1]
        delta = delta - jnp.floor(delta)

        def step(carry, d):
            s, c = carry
            boundary = s
            y = d - c
            tt = s + y
            c = (tt - s) - y
            s = tt - jnp.floor(tt)
            return (s, c), boundary

        s0 = initial - jnp.floor(initial)
        (_, _), boundary = jax.lax.scan(
            step, (s0, jnp.zeros_like(s0)), jnp.moveaxis(delta, 0, 1),
            unroll=unroll,
        )
        boundary = jnp.moveaxis(boundary, 0, 1)
        phi = boundary[:, :, None] + partial
        return phi - jnp.floor(phi)

    def make_many(iters):
        @jax.jit
        def many(f0_pad, init):
            def body(carry, i):
                phi = phase_fn(f0_pad, carry)
                return phi[:, -1, -1], None

            final, _ = jax.lax.scan(body, init, jnp.arange(iters))
            return jnp.sum(final)

        return many

    return marginal_chain_time(
        make_many,
        lambda trial: (f0_pad, jnp.full((b,), 0.1 * trial, jnp.float32)),
    )


def time_gru(b, t, unroll):
    import ddsp_tpu.models.nn as nn

    rng = np.random.default_rng(0)
    h = 512
    p = {
        "layers": [
            {
                "w_ih": jnp.asarray(rng.standard_normal((3 * h, 2 * h)).astype(np.float32) * 0.02),
                "w_hh": jnp.asarray(rng.standard_normal((3 * h, h)).astype(np.float32) * 0.02),
                "b_ih": jnp.zeros((3 * h,), jnp.float32),
                "b_hh": jnp.zeros((3 * h,), jnp.float32),
            }
        ]
    }
    x = jnp.asarray(rng.standard_normal((b, t, 2 * h)).astype(np.float32) * 0.1)

    def gru_fn(p, x, h0):
        lp = p["layers"][0]
        gi = x @ lp["w_ih"].T + lp["b_ih"]

        def step(hh, gi_t):
            hn = nn._gru_recurrence(lp, hh, gi_t)
            return hn, hn

        hT, ys = jax.lax.scan(step, h0, jnp.moveaxis(gi, 0, 1), unroll=unroll)
        return jnp.moveaxis(ys, 0, 1), hT

    def make_many(iters):
        @jax.jit
        def many(p, x, h0):
            def body(carry, i):
                ys, hT = gru_fn(p, x, carry)
                return jnp.tanh(hT), None

            final, _ = jax.lax.scan(body, h0, jnp.arange(iters))
            return jnp.sum(final)

        return many

    return marginal_chain_time(
        make_many,
        lambda trial: (p, x, jnp.full((b, h), 0.01 * trial, jnp.float32)),
    )


def main():
    shapes = [(16, 172), (1, 5168)]
    which = sys.argv[1:] or ["phase", "gru"]
    for b, t in shapes:
        if "phase" in which:
            for unroll in (8, 32, 128):
                dt = time_phase(b, t, unroll)
                print(
                    f"phase  B={b:3d} T={t:5d} unroll={unroll:4d}  "
                    f"{1e3 * dt:7.3f} ms",
                    flush=True,
                )
        if "gru" in which:
            for unroll in (4, 16):
                dt = time_gru(b, t, unroll)
                print(
                    f"gru    B={b:3d} T={t:5d} unroll={unroll:4d}  "
                    f"{1e3 * dt:7.3f} ms",
                    flush=True,
                )


if __name__ == "__main__":
    main()
