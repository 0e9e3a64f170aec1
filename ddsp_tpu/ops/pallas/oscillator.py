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

Forward-only kernel with a custom VJP whose backward rematerializes through
the XLA path (gradients w.r.t. phase, amps, loudness are exact; the sine
basis is recomputed, trading FLOPs for HBM like jax.checkpoint).

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


def _kernel(
    phase_ref,  # (1, FT, hop)
    amps_ref,  # (1, FT + 2, HP)  frames [t-1, t, ..., t+FT] amplitudes
    loud_ref,  # (1, FT + 2, LANE) loudness broadcast over lanes
    w_ref,  # (hop, 4) interp weights (padded from 3)
    out_ref,  # (1, FT, hop)
    *,
    ft: int,
    hop: int,
    hp: int,
):
    h = jax.lax.broadcasted_iota(jnp.float32, (1, hp), 1) + 1.0  # (1, HP)
    w = w_ref[:, :3]  # (hop, 3)
    for f in range(ft):
        phase = phase_ref[0, f, :].reshape(hop, 1)  # fractional cycles
        hi = jnp.floor(phase * QUANT) * (1.0 / QUANT)
        lo = phase - hi
        coarse = hi * h  # (hop, HP), exact multiples of 1/4096
        coarse = coarse - jnp.floor(coarse)
        frac = coarse + lo * h
        frac = frac - jnp.floor(frac)
        sines = jnp.sin(TWO_PI * frac)  # (hop, HP)

        # amp windows for this frame: rows f (t-1), f+1 (t), f+2 (t+1)
        s = jnp.concatenate(
            [
                jnp.sum(sines * amps_ref[0, f + k, :].reshape(1, hp), axis=1, keepdims=True)
                for k in range(3)
            ],
            axis=1,
        )  # (hop, 3)
        harm = jnp.sum(s * w, axis=1)  # (hop,)
        loud = (
            w[:, 0] * loud_ref[0, f, 0]
            + w[:, 1] * loud_ref[0, f + 1, 0]
            + w[:, 2] * loud_ref[0, f + 2, 0]
        )
        out_ref[0, f, :] = harm * loud


def _pallas_forward(
    phase1: jnp.ndarray,  # (B, T, hop)
    amps_pad: jnp.ndarray,  # (B, T+2, H)
    loud_pad: jnp.ndarray,  # (B, T+2)
    frames_per_block: int,
) -> jnp.ndarray:
    b, t, hop = phase1.shape
    h = amps_pad.shape[-1]
    hp = _round_up(h, LANE)
    ft = frames_per_block
    while t % ft:
        ft //= 2
    ft = max(ft, 1)

    amps_p = jnp.pad(amps_pad, ((0, 0), (0, 0), (0, hp - h)))
    loud_p = jnp.broadcast_to(loud_pad[..., None], (*loud_pad.shape, LANE))
    w = jnp.pad(jnp.asarray(hop_weights(hop)), ((0, 0), (0, 1)))  # (hop, 4)

    grid = (b, t // ft)
    out = pl.pallas_call(
        functools.partial(_kernel, ft=ft, hop=hop, hp=hp),
        out_shape=jax.ShapeDtypeStruct((b, t, hop), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ft, hop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, ft + 2, hp),
                lambda i, j: (i, j * ft, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ft + 2, LANE),
                lambda i, j: (i, j * ft, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((hop, 4), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ft, hop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * hop * hp * 4,
            bytes_accessed=4 * (b * t * hop * 2 + b * t * hp),
            transcendentals=b * t * hop * hp,
        ),
    )(phase1, amps_p, loud_p, w)
    return out.reshape(b, t * hop)


def _xla_reference(phase1, amps_pad, loud_pad):
    """Pure-XLA equivalent used for the backward pass (rematerialized)."""
    from ddsp_tpu.ops.oscillator import _render_from_phase

    return _render_from_phase(phase1, amps_pad, loud_pad, amps_pad.shape[-1])


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
    _, vjp = jax.vjp(_xla_reference, phase1, amps_pad, loud_pad)
    return vjp(g)


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
