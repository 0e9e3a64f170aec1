"""Roofline / MFU accounting for the two hot kernels (VERDICT round-1 #7).

Turns "speed-of-light per chip" from an adjective into numbers: for the
fused Pallas oscillator (fwd and fwd+bwd) and the MSS-loss DFT matmuls,
measure device time at production shape, count the exact implementation
MACs / VPU ops, and report achieved FLOP/s against the v5e ceilings.

Op accounting (kept in sync with ops/pallas/oscillator.py and
ops/spectral.py -- every count cites the code it models):

* Oscillator forward (_kernel_banked): per (ft=4)-frame block,
  - bank fill: HB x ft*hop sine elements via the rotation chain,
    ~6 VPU ops/element (ops/pallas/oscillator.py:_fill_sine_banks_cat);
  - ONE MXU contraction (3ft, HB) x (HB, ft*hop) at Precision.HIGHEST
    (true-f32 passes ~= 1/6 of bf16 peak: each f32 operand splits into
    bf16 hi+lo and the product takes 6 MXU passes).
* Oscillator backward: sin+cos fill (~8 ops/element) plus THREE
  contractions of the (ft+2, HB) x (HB, ft*hop) class at Mosaic DEFAULT
  precision -- measured round 5 to be a SINGLE bf16 MXU pass (not
  bf16x3; scripts/ab_osc_bwd_contract.py), so the bound charges the
  full bf16 rate.
* MSS-loss STFTs (_spectrogram_hopblocked): per scale n, frames
  T_n = 1 + L/hop with hop = n/4; MACs = T_n * n * (n/2+1) * 2 (cos+sin
  Hann-rDFT matmuls), per signal; the loss does pred + target, backward
  adds ~the pred-side transpose.  Runs in bf16 (full MXU rate) by default
  (Config.loss_matmul_dtype).

v5e ceilings (public spec / scaling-book numbers): MXU 197e12 bf16
FLOP/s; VPU 8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85e12 ops/s.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py
Prints one JSON line per kernel with achieved vs speed-of-light, then a
summary table to stderr.  Measurement is tunnel-safe (scan-chained,
median of varied-input trials; CLAUDE.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ddsp_tpu.utils.roofline import (  # noqa: E402 (path insert above)
    MXU_BF16,
    MXU_F32_DEFAULT,
    osc_counts,
    osc_speed_of_light_s,
    stft_macs,
)


def _median_chain(make_many, args_for_trial):
    """Adaptive marginal-chain device time (ddsp_tpu.utils.profiling)."""
    from ddsp_tpu.utils.profiling import marginal_chain_time

    return marginal_chain_time(make_many, args_for_trial, verbose=True)


def _emit(name, dt, sol, parts):
    frac = sol / dt
    rec = {
        "kernel": name,
        "measured_ms": round(1e3 * dt, 4),
        "speed_of_light_ms": round(1e3 * sol, 4),
        "fraction_of_sol": round(frac, 4),
        **{k: round(v, 4) for k, v in parts.items()},
    }
    print(json.dumps(rec), flush=True)
    return rec


def bench_oscillator(conf):
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.ops.pallas.oscillator import pallas_render_from_phase

    b, t, hop, h = 16, conf.frames_per_example, conf.hop_length, conf.n_harmonics
    rng = np.random.default_rng(0)
    phase = jnp.asarray(rng.uniform(0, 1, (b, t, hop)).astype(np.float32))
    amps = jnp.asarray(rng.uniform(0, 1, (b, t + 2, h)).astype(np.float32) / h)
    loud = jnp.asarray(rng.uniform(0, 1, (b, t + 2)).astype(np.float32))
    def fwd_many(iters):
        @jax.jit
        def many(phase, amps, loud):
            def body(carry, i):
                out = pallas_render_from_phase(carry, amps, loud)
                p = carry + 1e-12 * jnp.mean(out)
                return p - jnp.floor(p), None

            final, _ = jax.lax.scan(body, phase, jnp.arange(iters))
            return jnp.sum(final)

        return many

    def fwdbwd_many(iters):
        @jax.jit
        def many(phase, amps, loud):
            def loss(p, a, l):
                out = pallas_render_from_phase(p, a, l)
                return jnp.sum(out * out)

            def body(carry, i):
                dp, da, dl = jax.grad(loss, argnums=(0, 1, 2))(
                    carry, amps, loud
                )
                p = carry + 1e-12 * (
                    jnp.mean(dp) + jnp.mean(da) + jnp.mean(dl)
                )
                return p - jnp.floor(p), None

            final, _ = jax.lax.scan(body, phase, jnp.arange(iters))
            return jnp.sum(final)

        return many

    def args(trial):
        return (
            jnp.asarray(rng.uniform(0, 1, (b, t, hop)).astype(np.float32)),
            amps,
            loud,
        )

    _, fwd_macs, bwd_macs = osc_counts(b, t, hop, h)
    elements = b * t * hop * h  # algorithmic sine-bank elements

    dt_f = _median_chain(fwd_many, args)
    sol_f = osc_speed_of_light_s(b, t, hop, h)
    fwd = _emit(
        "osc_forward",
        dt_f,
        sol_f,
        {
            "achieved_mxu_tflops": 2 * fwd_macs / dt_f / 1e12,
            "bank_gelements_per_s": elements / dt_f / 1e9,
        },
    )

    dt_fb = _median_chain(fwdbwd_many, args)
    sol_fb = osc_speed_of_light_s(b, t, hop, h, backward=True)
    fb = _emit(
        "osc_forward_backward",
        dt_fb,
        sol_fb,
        {
            "achieved_mxu_tflops": 2 * (fwd_macs * 2 + bwd_macs) / dt_fb / 1e12,
            "bank_gelements_per_s": 2 * elements / dt_fb / 1e9,
        },
    )
    return fwd, fb


def bench_mss(conf):
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.losses import mss_loss

    b, length = 16, conf.example_length
    dtype = jnp.bfloat16 if conf.loss_matmul_dtype == "bfloat16" else None
    rng = np.random.default_rng(0)
    pred = jnp.asarray(0.1 * rng.standard_normal((b, length)), jnp.float32)
    true = jnp.asarray(0.1 * rng.standard_normal((b, length)), jnp.float32)

    def fwd_many(iters):
        @jax.jit
        def many(pred, true):
            def body(carry, i):
                l = mss_loss(
                    carry, true, conf.mss_ffts, conf.mss_alpha,
                    conf.mss_overlap, matmul_dtype=dtype,
                )
                return carry + 1e-12 * l, None

            final, _ = jax.lax.scan(body, pred, jnp.arange(iters))
            return jnp.sum(final)

        return many

    def fwdbwd_many(iters):
        @jax.jit
        def many(pred, true):
            def loss(p):
                return mss_loss(
                    p, true, conf.mss_ffts, conf.mss_alpha,
                    conf.mss_overlap, matmul_dtype=dtype,
                )

            def body(carry, i):
                g = jax.grad(loss)(carry)
                return carry + 1e-12 * g, None

            final, _ = jax.lax.scan(body, pred, jnp.arange(iters))
            return jnp.sum(final)

        return many

    def args(trial):
        return (
            jnp.asarray(0.1 * rng.standard_normal((b, length)), jnp.float32),
            true,
        )

    per_signal = stft_macs(length, conf.mss_ffts, conf.mss_overlap)
    peak = MXU_BF16 if dtype is not None else MXU_F32_DEFAULT

    macs_f = 2 * b * per_signal  # pred + target STFTs
    dt_f = _median_chain(fwd_many, args)
    fwd = _emit(
        "mss_loss_forward",
        dt_f,
        2 * macs_f / peak,
        {"achieved_mxu_tflops": 2 * macs_f / dt_f / 1e12,
         "mfu_vs_bf16_peak": 2 * macs_f / dt_f / MXU_BF16},
    )

    # backward re-runs the pred STFT transpose (target side has no grad)
    macs_fb = macs_f + b * per_signal
    dt_fb = _median_chain(fwdbwd_many, args)
    fb = _emit(
        "mss_loss_forward_backward",
        dt_fb,
        2 * macs_fb / peak,
        {"achieved_mxu_tflops": 2 * macs_fb / dt_fb / 1e12,
         "mfu_vs_bf16_peak": 2 * macs_fb / dt_fb / MXU_BF16},
    )
    return fwd, fb


def main():
    import jax

    from ddsp_tpu.config import Config

    if jax.default_backend() != "tpu":
        print("roofline numbers need the real chip", file=sys.stderr)
        sys.exit(1)
    conf = Config()
    rows = []
    rows += list(bench_oscillator(conf))
    rows += list(bench_mss(conf))
    print(
        f"\n{'kernel':28s} {'ms':>8s} {'SoL ms':>8s} {'frac':>6s} "
        f"{'TFLOP/s':>8s}",
        file=sys.stderr,
    )
    for r in rows:
        print(
            f"{r['kernel']:28s} {r['measured_ms']:8.3f} "
            f"{r['speed_of_light_ms']:8.3f} {r['fraction_of_sol']:6.2f} "
            f"{r['achieved_mxu_tflops']:8.2f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
