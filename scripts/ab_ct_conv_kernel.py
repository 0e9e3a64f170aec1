"""A/B prototype: fused Pallas permuted-CT convolution vs the XLA pipeline.

The round-5 permuted-spectrum rework left the bf16 BACKWARD convolutions
~3.3x over their MAC bound (0.554 ms vs ~0.17 at training shape) on
inter-matmul HBM traffic + casts.  Precision permits a Pallas kernel
there (the backward already runs single-pass bf16; the FORWARD cannot --
Mosaic has no tensorfloat32-grade dot).  This prototypes the whole
per-row pipeline fwd-CT -> spectrum multiply -> inv-CT inside one kernel
(intermediates never leave VMEM) and races it against the XLA permuted
pipeline at the same bf16 precision and shapes, BEFORE any VJP wiring.

MEASURED OUTCOME (2026-08-22, adaptive value-forced harness): XLA
0.096-0.097 ms vs Pallas 0.101 ms at 16 rows x 98304 -- a tie, with the
XLA pipeline at ~0.85 MFU of the bf16 peak.  Nothing to fuse; rejected
(docs/PERFORMANCE.md round 5).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_ct_conv_kernel.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddsp_tpu.utils.profiling import marginal_chain_time

from ddsp_tpu.ops.fft import (
    _ct_fwd_permuted,
    _ct_inv_permuted,
    _dft_mats,
    _split_factors,
    _twiddle,
)


def _kernel(n1, n2, zr_ref, zi_ref, kr_ref, ki_ref, d1r_ref, d1i_ref,
            d2r_ref, d2i_ref, tr_ref, ti_ref, yr_ref, yi_ref):
    f32 = jnp.float32
    bf = jnp.bfloat16

    def mm(a, b):
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    ar = zr_ref[0]
    ai = zi_ref[0]
    d1r, d1i = d1r_ref[...], d1i_ref[...]
    d2r, d2i = d2r_ref[...], d2i_ref[...]
    tr, ti = tr_ref[...], ti_ref[...]
    # fwd stage 1 (contract n1; D symmetric)
    br = mm(d1r, ar) - mm(d1i, ai)
    bi = mm(d1r, ai) + mm(d1i, ar)
    # twiddle
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    # fwd stage 2 (contract n2)
    pr = mm(cr, d2r) - mm(ci, d2i)
    pi = mm(cr, d2i) + mm(ci, d2r)
    # spectrum multiply
    kr, ki = kr_ref[0], ki_ref[0]
    wr = pr * kr - pi * ki
    wi = pr * ki + pi * kr
    # inverse stage 1
    qr = mm(wr, d2r) + mm(wi, d2i)
    qi = mm(wi, d2r) - mm(wr, d2i)
    # conj twiddle
    rr = qr * tr + qi * ti
    ri = qi * tr - qr * ti
    # inverse stage 2
    yr = mm(d1r, rr) + mm(d1i, ri)
    yi = mm(d1r, ri) - mm(d1i, rr)
    scale = 1.0 / (n1 * n2)
    yr_ref[0] = yr * scale
    yi_ref[0] = yi * scale


def ct_conv_pallas(zr, zi, kr, ki, n):
    n1, n2 = _split_factors(n)
    rows = zr.shape[0]
    d1r, d1i = (jnp.asarray(m, jnp.bfloat16) for m in _dft_mats(n1))
    d2r, d2i = (jnp.asarray(m, jnp.bfloat16) for m in _dft_mats(n2))
    tr, ti = (jnp.asarray(m) for m in _twiddle(n1, n2))
    row_spec = pl.BlockSpec((1, n1, n2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    const2 = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, n1, n2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_kernel, n1, n2),
        out_shape=(
            jax.ShapeDtypeStruct((rows, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((rows, n1, n2), jnp.float32),
        ),
        grid=(rows,),
        in_specs=[row_spec, row_spec, kspec, kspec,
                  const2(n1, n1), const2(n1, n1),
                  const2(n2, n2), const2(n2, n2),
                  const2(n1, n2), const2(n1, n2)],
        out_specs=(row_spec, row_spec),
        cost_estimate=pl.CostEstimate(
            flops=rows * 16 * n1 * n2 * (n1 + n2) // 2,
            bytes_accessed=rows * n1 * n2 * 4 * 4,
            transcendentals=0,
        ),
    )(zr.reshape(rows, n1, n2), zi.reshape(rows, n1, n2),
      kr.reshape(1, n1, n2), ki.reshape(1, n1, n2),
      d1r, d1i, d2r, d2i, tr, ti)
    return yr.reshape(rows, n), yi.reshape(rows, n)


def ct_conv_xla(zr, zi, kr, ki, n):
    pr, pi = _ct_fwd_permuted(zr, zi, n, jnp.bfloat16)
    krm = kr.reshape(1, *pr.shape[1:])
    kim = ki.reshape(1, *pr.shape[1:])
    wr = pr * krm - pi * kim
    wi = pr * kim + pi * krm
    return _ct_inv_permuted(wr, wi, n, jnp.bfloat16)


def main():
    n = 98304
    rows = 16  # the training-shape backward's packed row count
    rng = np.random.default_rng(0)
    zr = jnp.asarray(rng.standard_normal((rows, n)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((rows, n)).astype(np.float32))
    n1, n2 = _split_factors(n)
    # a fixed kernel permuted spectrum
    kr_, ki_ = _ct_fwd_permuted(
        jnp.asarray(rng.standard_normal((1, n)).astype(np.float32) * 0.1),
        jnp.zeros((1, n), jnp.float32), n, None,
    )
    kr_ = kr_.reshape(1, n)
    ki_ = ki_.reshape(1, n)

    # correctness first
    yr_p, yi_p = ct_conv_pallas(zr, zi, kr_, ki_, n)
    yr_x, yi_x = ct_conv_xla(zr, zi, kr_, ki_, n)
    da = np.abs(np.asarray(yr_p) - np.asarray(yr_x)).max()
    sc = np.abs(np.asarray(yr_x)).max()
    print(f"pallas vs xla rel {da / sc:.2e}", flush=True)

    for name, fn in (("xla", ct_conv_xla), ("pallas", ct_conv_pallas)) * 2:
        def make_many(iters, fn=fn):
            @jax.jit
            def many(zr, zi):
                def body(carry, i):
                    cr, ci = carry
                    yr, yi = fn(cr, ci, kr_, ki_, n)
                    s = jnp.sum(yr) + jnp.sum(yi)
                    return (cr + 1e-30 * s, ci + 1e-30 * s), s
                (_, _), ss = jax.lax.scan(body, (zr, zi), jnp.arange(iters))
                return ss[-1]
            return many

        def args_for_trial(trial):
            return (
                zr * (1.0 + 1e-6 * trial),
                zi * (1.0 + 1e-6 * trial),
            )
        dt = marginal_chain_time(make_many, args_for_trial)
        print(f"{name:7s} {dt * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
