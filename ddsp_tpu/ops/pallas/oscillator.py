"""Pallas TPU kernel: fused harmonic render (sines + amp interp + reduce).

The oscillator's arithmetic core evaluates ``sum_h amp_h(i) sin(2 pi h
phi(i))`` over (B, T*hop, H) points.  The XLA path (ops/oscillator.py)
expresses it as einsums that may materialize the (B, T, hop, H) sine tensor
in HBM (~1 GB at production shape).  This kernel keeps the whole
harmonic-resolved tensor in VMEM: each grid step loads a few frames of
phase (hop values each) and the neighboring frames' amplitude vectors,
builds the sine block, contracts over harmonics in-register, and writes only
the (frames, hop) audio block -- HBM traffic drops from O(T*hop*H) to
O(T*hop + T*H).

Both directions are hand-written kernels: the forward accumulates the
harmonic sum with a Chebyshev sine recurrence; the backward regenerates
sin AND cos with dual recurrences in one pass and emits d(phase),
d(amp windows), d(loudness windows) directly -- no harmonic-resolved
tensor ever touches HBM in either direction.

Split-precision phase trick shared with ops/oscillator.harmonic_sines:
phi = hi + lo with hi on a 1/4096 grid -> h*hi exact in f32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddsp_tpu.ops.interp import hop_weights

LANE = 128
QUANT = 4096.0
TWO_PI = 2.0 * np.pi


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _fill_sine_bank(sin_ref, cos_ref, phase, ft, hop, hp, n_h, resync):
    """Fill VMEM scratch bank(s) with sin(2 pi h phi) (and, if ``cos_ref``
    is not None, 2 pi h cos(2 pi h phi)) for h = 1..n_h, h on the sublane
    axis.

    Chebyshev three-term recurrences generate each harmonic from the
    previous two with ~2 FMAs instead of a transcendental; the rolled loop
    over resync groups keeps the Mosaic program small (a fully unrolled
    variant compiles pathologically slowly) and each group re-seeds with an
    exact split-precision evaluation so float32 drift cannot accumulate.
    """
    ang = TWO_PI * phase
    two_c = 2.0 * jnp.cos(ang)
    hi_p = jnp.floor(phase * QUANT) * (1.0 / QUANT)
    lo_p = phase - hi_p
    groups = -(-n_h // resync)

    def exact_sincos(h_f):
        coarse = hi_p * h_f
        coarse = coarse - jnp.floor(coarse)
        frac = coarse + lo_p * h_f
        frac = frac - jnp.floor(frac)
        a = TWO_PI * frac
        return jnp.sin(a), jnp.cos(a)

    def group_body(gi, _):
        base = gi * resync
        base_f = base.astype(jnp.float32)
        s_cur, c_cur = exact_sincos(base_f + 1.0)
        s_prev, c_prev = exact_sincos(base_f)
        for k in range(resync):
            h_f = base_f + float(k + 1)
            sin_ref[:, pl.ds(base + k, 1), :] = s_cur[:, None, :]
            if cos_ref is not None:
                cos_ref[:, pl.ds(base + k, 1), :] = ((h_f * TWO_PI) * c_cur)[
                    :, None, :
                ]
            s_prev, s_cur = s_cur, two_c * s_cur - s_prev
            c_prev, c_cur = c_cur, two_c * c_cur - c_prev
        return _

    jax.lax.fori_loop(0, groups, group_body, 0)

    def zero_body(h, _):
        sin_ref[:, pl.ds(h, 1), :] = jnp.zeros((ft, 1, hop), jnp.float32)
        if cos_ref is not None:
            cos_ref[:, pl.ds(h, 1), :] = jnp.zeros((ft, 1, hop), jnp.float32)
        return _

    jax.lax.fori_loop(groups * resync, hp, zero_body, 0)


def _kernel_cheb(
    phase_ref,  # (1, FT, hop)
    amps_l_ref,  # (1, FT, HP)
    amps_m_ref,  # (1, FT, HP)
    amps_r_ref,  # (1, FT, HP)
    loud_ref,  # (1, FT, 3*LANE)
    w_ref,  # (hop, 4)
    out_ref,  # (1, FT, hop)
    *,
    ft: int,
    hop: int,
    hp: int,
    n_h: int,
    resync: int,
):
    """Chebyshev-recurrence harmonic accumulation.

    sin((h+1)x) = 2 cos(x) sin(hx) - sin((h-1)x) turns the 180
    sines-per-sample into 2 transcendentals + ~4 FMAs per harmonic (the
    VPU's sweet spot).  Float32 drift of the three-term recurrence is
    killed by re-seeding with an exact split-precision sine every
    ``resync`` harmonics.

    Accumulator layout exploits the interpolation-weight structure
    (ops/interp.hop_weights): samples j < hop/2 mix only frames (t-1, t)
    and samples j >= hop/2 only (t, t+1), so each half-hop needs two
    accumulators, not three -- 4 FMAs on half-width tiles instead of 3 on
    full width (-1/3 of the accumulation work).  Requires hop/2 to be a
    lane multiple; callers fall back to three accumulators otherwise.
    """
    split = hop % (2 * LANE) == 0
    half = hop // 2
    phase = phase_ref[0]  # (ft, hop) fractional cycles
    ang = TWO_PI * phase
    c1 = jnp.cos(ang)
    s1 = jnp.sin(ang)
    two_c = 2.0 * c1

    hi = jnp.floor(phase * QUANT) * (1.0 / QUANT)
    lo = phase - hi

    def exact_sincos(h_int):
        """Exact sin/cos of 2 pi h phase via the split-precision product."""
        coarse = hi * float(h_int)
        coarse = coarse - jnp.floor(coarse)
        frac = coarse + lo * float(h_int)
        frac = frac - jnp.floor(frac)
        a = TWO_PI * frac
        return jnp.sin(a), jnp.cos(a)

    if split:
        acc_ll = jnp.zeros((ft, half), jnp.float32)  # frame t-1, lo lanes
        acc_ml = jnp.zeros((ft, half), jnp.float32)  # frame t,   lo lanes
        acc_mh = jnp.zeros((ft, half), jnp.float32)  # frame t,   hi lanes
        acc_rh = jnp.zeros((ft, half), jnp.float32)  # frame t+1, hi lanes
    else:
        acc_l = jnp.zeros((ft, hop), jnp.float32)
        acc_m = jnp.zeros((ft, hop), jnp.float32)
        acc_r = jnp.zeros((ft, hop), jnp.float32)
    s_prev = jnp.zeros((ft, hop), jnp.float32)  # sin(0 * x)
    s_cur = s1
    for h in range(1, n_h + 1):
        if h > 1 and (h - 1) % resync == 0:
            s_cur, _ = exact_sincos(h)
            s_prev, _ = exact_sincos(h - 1)
        a_l = amps_l_ref[0, :, h - 1].reshape(ft, 1)
        a_m = amps_m_ref[0, :, h - 1].reshape(ft, 1)
        a_r = amps_r_ref[0, :, h - 1].reshape(ft, 1)
        if split:
            s_lo = s_cur[:, :half]
            s_hi = s_cur[:, half:]
            acc_ll = acc_ll + a_l * s_lo
            acc_ml = acc_ml + a_m * s_lo
            acc_mh = acc_mh + a_m * s_hi
            acc_rh = acc_rh + a_r * s_hi
        else:
            acc_l = acc_l + a_l * s_cur
            acc_m = acc_m + a_m * s_cur
            acc_r = acc_r + a_r * s_cur
        s_prev, s_cur = s_cur, two_c * s_cur - s_prev

    w = w_ref[:, :3]  # (hop, 3)
    if split:
        w0_lo = w[:half, 0].reshape(1, half)
        w1_lo = w[:half, 1].reshape(1, half)
        w1_hi = w[half:, 1].reshape(1, half)
        w2_hi = w[half:, 2].reshape(1, half)
        harm = jnp.concatenate(
            [acc_ll * w0_lo + acc_ml * w1_lo, acc_mh * w1_hi + acc_rh * w2_hi],
            axis=-1,
        )
    else:
        harm = (
            acc_l * w[:, 0].reshape(1, hop)
            + acc_m * w[:, 1].reshape(1, hop)
            + acc_r * w[:, 2].reshape(1, hop)
        )
    loud = (
        w[:, 0].reshape(1, hop) * loud_ref[0, :, 0].reshape(ft, 1)
        + w[:, 1].reshape(1, hop) * loud_ref[0, :, LANE].reshape(ft, 1)
        + w[:, 2].reshape(1, hop) * loud_ref[0, :, 2 * LANE].reshape(ft, 1)
    )
    out_ref[0] = harm * loud


def _xla_reference(phase1, amps_pad, loud_pad):
    """Pure-XLA equivalent (kept for interpret-mode cross-checks)."""
    from ddsp_tpu.ops.oscillator import _render_from_phase

    return _render_from_phase(phase1, amps_pad, loud_pad, amps_pad.shape[-1])


def _pallas_forward(
    phase1: jnp.ndarray,  # (B, T, hop)
    amps_pad: jnp.ndarray,  # (B, T+2, H)
    loud_pad: jnp.ndarray,  # (B, T+2)
    frames_per_block: int,
    resync: int = 32,
) -> jnp.ndarray:
    b, t, hop = phase1.shape
    h = amps_pad.shape[-1]
    hp = _round_up(h, LANE)
    # TPU tiling: the block's sublane dim (frames) must be a multiple of 8.
    ft = max(8, _round_up(frames_per_block, 8))
    t_pad = _round_up(t, ft)
    if t_pad != t:
        grow = lambda x: jnp.pad(x, ((0, 0), (0, t_pad - t)) + ((0, 0),) * (x.ndim - 2))
        phase1 = grow(phase1)
        amps_pad = jnp.pad(amps_pad, ((0, 0), (0, t_pad - t), (0, 0)))
        loud_pad = jnp.pad(loud_pad, ((0, 0), (0, t_pad - t)))
    t_out = t

    amps_p = jnp.pad(amps_pad, ((0, 0), (0, 0), (0, hp - h)))
    amps_l, amps_m, amps_r = amps_p[:, :-2], amps_p[:, 1:-1], amps_p[:, 2:]
    # loudness (t-1, t, t+1) packed into three LANE-wide groups
    loud_trip = jnp.stack([loud_pad[:, :-2], loud_pad[:, 1:-1], loud_pad[:, 2:]], -1)
    loud_p = jnp.repeat(loud_trip, LANE, axis=-1)  # (B, T, 3*LANE)
    w = jnp.pad(jnp.asarray(hop_weights(hop)), ((0, 0), (0, 1)))  # (hop, 4)

    t = t_pad
    grid = (b, t // ft)
    amp_spec = pl.BlockSpec(
        (1, ft, hp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _kernel_cheb, ft=ft, hop=hop, hp=hp, n_h=h, resync=resync
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, hop), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ft, hop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            amp_spec,
            amp_spec,
            amp_spec,
            pl.BlockSpec(
                (1, ft, 3 * LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((hop, 4), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ft, hop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * hop * hp * 4,
            bytes_accessed=4 * (b * t * hop * 2 + 3 * b * t * hp),
            transcendentals=b * t * hop * hp,
        ),
    )(phase1, amps_l, amps_m, amps_r, loud_p, w)
    return out[:, :t_out].reshape(b, t_out * hop)


def _kernel_cheb_bwd(
    g_ref,  # (1, FT, hop) dL/daudio
    phase_ref,  # (1, FT, hop)
    amps_l_ref,  # (1, FT, HP)
    amps_m_ref,  # (1, FT, HP)
    amps_r_ref,  # (1, FT, HP)
    loud_ref,  # (1, FT, 3*LANE)
    w_ref,  # (hop, 4)
    dphase_ref,  # out (1, FT, hop)
    da_l_ref,  # out (1, FT, HP)
    da_m_ref,  # out (1, FT, HP)
    da_r_ref,  # out (1, FT, HP)
    dloud_ref,  # out (1, FT, 3) per-window loudness grads
    sin_ref,  # VMEM scratch (FT, HP, hop)
    cos_ref,  # VMEM scratch (FT, HP, hop)
    *,
    ft: int,
    hop: int,
    hp: int,
    n_h: int,
    resync: int,
):
    """One-pass backward: dual sin/cos Chebyshev recurrences fill VMEM
    scratch with harmonics on the SUBLANE axis (cheap per-h stores), then
    every gradient is a batched MXU contraction -- nothing harmonic-resolved
    touches HBM.

    out(j) = loud(j) * sum_h a_mix_h(j) sin(2 pi h phi(j)),
    a_mix_h(j) = sum_k w_k(j) a_k[h]:
      d a_k[h]   = sum_j g loud w_k sin(2 pi h phi)
      d phi(j)   = g loud 2 pi sum_h h a_mix_h cos(2 pi h phi)
      d loud_k   = sum_j g w_k harm(j)
    """
    phase = phase_ref[0]
    # 1. shared sine/cosine bank generation (h on the sublane axis)
    _fill_sine_bank(sin_ref, cos_ref, phase, ft, hop, hp, n_h, resync)

    # 2. contractions on the MXU
    w = w_ref[:, :3]
    wl = w[:, 0].reshape(1, hop)
    wm = w[:, 1].reshape(1, hop)
    wr = w[:, 2].reshape(1, hop)
    loud_up = (
        wl * loud_ref[0, :, 0].reshape(ft, 1)
        + wm * loud_ref[0, :, LANE].reshape(ft, 1)
        + wr * loud_ref[0, :, 2 * LANE].reshape(ft, 1)
    )
    g = g_ref[0]
    ql = g * loud_up  # (ft, hop)

    # Mosaic dot_general handles plain 2-D matmuls; loop the small static
    # frame dim and batch the three windows into one operand instead.
    dloud_rows = []
    for f in range(ft):
        sines_f = sin_ref[f, :, :]  # (hp, hop)
        coses_f = cos_ref[f, :, :]
        qw3 = jnp.concatenate(
            [
                (ql[f] * wl[0]).reshape(1, hop),
                (ql[f] * wm[0]).reshape(1, hop),
                (ql[f] * wr[0]).reshape(1, hop),
            ],
            axis=0,
        )  # (3, hop)
        da3 = jax.lax.dot_general(
            qw3, sines_f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3, hp)
        da_l_ref[0, f, :] = da3[0]
        da_m_ref[0, f, :] = da3[1]
        da_r_ref[0, f, :] = da3[2]

        a3 = jnp.concatenate(
            [
                amps_l_ref[0, f, :].reshape(1, hp),
                amps_m_ref[0, f, :].reshape(1, hp),
                amps_r_ref[0, f, :].reshape(1, hp),
            ],
            axis=0,
        )  # (3, hp)
        harm3 = jax.lax.dot_general(
            a3, sines_f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3, hop): per-window harmonic sums
        dphi3 = jax.lax.dot_general(
            a3, coses_f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        harm = wl[0] * harm3[0] + wm[0] * harm3[1] + wr[0] * harm3[2]
        dphi = wl[0] * dphi3[0] + wm[0] * dphi3[1] + wr[0] * dphi3[2]
        dphase_ref[0, f, :] = ql[f] * dphi
        gh = g[f] * harm  # (hop,)
        dloud_rows.append(
            jnp.concatenate(
                [
                    jnp.sum(gh * wl[0]).reshape(1, 1),
                    jnp.sum(gh * wm[0]).reshape(1, 1),
                    jnp.sum(gh * wr[0]).reshape(1, 1),
                ],
                axis=1,
            )
        )
    dloud_ref[0] = jnp.concatenate(dloud_rows, axis=0)  # (ft, 3)


def _pallas_backward(
    phase1: jnp.ndarray,
    amps_pad: jnp.ndarray,
    loud_pad: jnp.ndarray,
    g: jnp.ndarray,  # (B, T*hop)
    frames_per_block: int,
    resync: int = 32,
):
    b, t, hop = phase1.shape
    h = amps_pad.shape[-1]
    hp = _round_up(h, LANE)
    ft = max(8, _round_up(frames_per_block, 8))
    t_pad = _round_up(t, ft)
    g3 = g.reshape(b, t, hop)
    if t_pad != t:
        grow = lambda x: jnp.pad(x, ((0, 0), (0, t_pad - t)) + ((0, 0),) * (x.ndim - 2))
        phase1, g3 = grow(phase1), grow(g3)
        amps_pad = jnp.pad(amps_pad, ((0, 0), (0, t_pad - t), (0, 0)))
        loud_pad = jnp.pad(loud_pad, ((0, 0), (0, t_pad - t)))
    t_out = t

    amps_p = jnp.pad(amps_pad, ((0, 0), (0, 0), (0, hp - h)))
    amps_l, amps_m, amps_r = amps_p[:, :-2], amps_p[:, 1:-1], amps_p[:, 2:]
    loud_trip = jnp.stack([loud_pad[:, :-2], loud_pad[:, 1:-1], loud_pad[:, 2:]], -1)
    loud_p = jnp.repeat(loud_trip, LANE, axis=-1)
    w = jnp.pad(jnp.asarray(hop_weights(hop)), ((0, 0), (0, 1)))

    t = t_pad
    grid = (b, t // ft)
    spec_hop = pl.BlockSpec((1, ft, hop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    spec_amp = pl.BlockSpec((1, ft, hp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel_cheb_bwd, ft=ft, hop=hop, hp=hp, n_h=h, resync=resync
    )
    dphase, da_l, da_m, da_r, dloud = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, t, hop), jnp.float32),
            jax.ShapeDtypeStruct((b, t, hp), jnp.float32),
            jax.ShapeDtypeStruct((b, t, hp), jnp.float32),
            jax.ShapeDtypeStruct((b, t, hp), jnp.float32),
            jax.ShapeDtypeStruct((b, t, 3), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            spec_hop,  # g
            spec_hop,  # phase
            spec_amp,
            spec_amp,
            spec_amp,
            pl.BlockSpec((1, ft, 3 * LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, 4), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            spec_hop,
            spec_amp,
            spec_amp,
            spec_amp,
            pl.BlockSpec((1, ft, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((ft, hp, hop), jnp.float32),  # sine bank
            pltpu.VMEM((ft, hp, hop), jnp.float32),  # 2*pi*h*cos bank
        ],
    )(g3, phase1, amps_l, amps_m, amps_r, loud_p, w)

    dphase = dphase[:, :t_out]
    da_l = da_l[:, :t_out, :h]
    da_m = da_m[:, :t_out, :h]
    da_r = da_r[:, :t_out, :h]
    dloud = dloud[:, :t_out]

    # reassemble grads of the edge-padded (T+2) frame arrays: view k of frame
    # window (t-1, t, t+1) contributes to padded index t + k.
    zpad = lambda x, lo, hi: jnp.pad(x, ((0, 0), (lo, hi)) + ((0, 0),) * (x.ndim - 2))
    d_amps_pad = zpad(da_l, 0, 2) + zpad(da_m, 1, 1) + zpad(da_r, 2, 0)
    d_loud_pad = (
        zpad(dloud[..., 0], 0, 2) + zpad(dloud[..., 1], 1, 1) + zpad(dloud[..., 2], 2, 0)
    )
    return dphase, d_amps_pad, d_loud_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_render_from_phase(
    phase1: jnp.ndarray,
    amps_pad: jnp.ndarray,
    loud_pad: jnp.ndarray,
    frames_per_block: int = 4,
) -> jnp.ndarray:
    """(B,T,hop) phase + (B,T+2,H) amps + (B,T+2) loudness -> (B,T*hop) audio."""
    return _pallas_forward(phase1, amps_pad, loud_pad, frames_per_block)


def _fwd(phase1, amps_pad, loud_pad, frames_per_block):
    out = _pallas_forward(phase1, amps_pad, loud_pad, frames_per_block)
    return out, (phase1, amps_pad, loud_pad)


def _bwd(frames_per_block, residuals, g):
    phase1, amps_pad, loud_pad = residuals
    return _pallas_backward(phase1, amps_pad, loud_pad, g, frames_per_block)


pallas_render_from_phase.defvjp(_fwd, _bwd)


def oscillator_bank_pallas(
    f0: jnp.ndarray,
    harm_amps: jnp.ndarray,
    loudness: jnp.ndarray,
    *,
    sample_rate: int,
    hop: int,
    initial_phase=None,
    frames_per_block: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.oscillator.oscillator_bank using the
    fused kernel for the audio-rate stage (phases stay in XLA: frame-rate
    scan, negligible)."""
    from ddsp_tpu.ops.oscillator import (
        _fundamental_phase_cycles,
        nyquist_normalized_amps,
    )

    pad = lambda x: jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    f0_pad, amps_pad, loud_pad = pad(f0), pad(harm_amps), pad(loudness)
    b = f0.shape[0]
    if initial_phase is None:
        initial_phase = jnp.zeros((b,), f0.dtype)
    amps_pad = nyquist_normalized_amps(f0_pad, amps_pad, sample_rate)
    phase1 = _fundamental_phase_cycles(
        f0_pad[..., 0], hop, sample_rate, initial_phase
    )
    audio = pallas_render_from_phase(
        phase1, amps_pad, loud_pad[..., 0], frames_per_block
    )
    return audio, phase1[:, -1, -1]
