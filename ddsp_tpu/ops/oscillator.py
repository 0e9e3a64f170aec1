"""Harmonic oscillator bank: additive synthesis, TPU-native formulation.

Behavioral parity target: the reference oscillator
(reference: model/ddsp/harmonic_oscillator.py:7-75):

  1. per-frame harmonic frequencies ``h * f0`` with amplitudes zeroed above
     Nyquist and renormalized to sum to 1 (:24-36),
  2. frame->audio linear upsampling of radians-per-sample (:52-55),
  3. cumulative-sum phase generation mod 2pi (:39-43),
  4. ``signal = sum_h loudness * amp_h * sin(phase_h)`` (:45-50),
  5. a ``live`` path carrying phase offsets across blocks (:64-75).

TPU-native design (NOT a translation): the reference materializes an
audio-rate (B, T*hop, H) tensor and runs a sequential ``cumsum`` over 88k+
samples.  Here the phase is computed in closed form per hop:

* All harmonic phases are exact integer multiples of the fundamental's
  accumulated phase (``phi_h = h * phi_1``), and because ``h`` is an integer,
  ``h * (phi mod 2pi) mod 2pi == h * phi mod 2pi`` -- so only the fundamental
  phase needs accumulating, and it can be wrapped early for float32 accuracy.
* Linear upsampling makes the within-hop partial sums of the fundamental's
  radian increments a fixed linear map of the three neighboring frame values
  (precomputed (hop, 3) prefix-sum weights, see ops/interp.py), so the only
  sequential dependency left is a length-T frame-rate cumsum (T ~ 172) --
  vastly cheaper and more accurate than an 88k-sample audio-rate cumsum, and
  trivially shardable across time with a scalar phase carry (parallel/).

The (B, T, hop, H) sine evaluation is the arithmetic core (~254 MFLOP-sin per
2 s batch-16 step); it is expressed as a contraction over harmonics so XLA
can tile/fuse it, with an optional frame-chunked+rematerialized path and a
Pallas kernel (ops/pallas/oscillator.py) that never materializes the
harmonic-resolved tensor in HBM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops.interp import hop_weight_cumsum, hop_weights

TWO_PI = 2.0 * np.pi


def nyquist_normalized_amps(
    f0: jnp.ndarray,
    harm_amps: jnp.ndarray,
    sample_rate: int,
    *,
    h_start: int = 0,
    denom: Optional[jnp.ndarray] = None,
    normalize: bool = True,
) -> jnp.ndarray:
    """Zero amplitudes of harmonics above Nyquist, renormalize to sum 1.

    Matches reference model/ddsp/harmonic_oscillator.py:24-33 (strict
    ``h * f0 > sample_rate // 2`` comparison, division without epsilon).

    Args:
      f0: (..., 1) fundamental frequency in Hz.
      harm_amps: (..., H) harmonic amplitude distribution.
      h_start: harmonic-number offset -- ``harm_amps[..., i]`` belongs to
        harmonic ``h_start + i + 1`` (tensor-parallel shards of the bank).
      denom: externally computed normalization sum (e.g. a ``psum`` of the
        masked amps over a 'model' mesh axis); defaults to the local sum.
      normalize: False returns the masked amps undivided (caller
        normalizes, e.g. by a global psum'd denominator).
    """
    n_harmonics = harm_amps.shape[-1]
    # h_start may be a traced scalar (e.g. axis_index * shard inside shard_map)
    h = jnp.arange(1, n_harmonics + 1, dtype=f0.dtype) + jnp.asarray(
        h_start, f0.dtype
    )
    mask = (f0 * h) > (sample_rate // 2)
    amps = jnp.where(mask, 0.0, harm_amps)
    if not normalize:
        return amps
    if denom is None:
        denom = jnp.sum(amps, axis=-1, keepdims=True)
    return amps / denom


def _fundamental_phase_cycles(
    f0_pad: jnp.ndarray,
    hop: int,
    sample_rate: int,
    initial_phase: jnp.ndarray,
) -> jnp.ndarray:
    """Fractional fundamental phase (in cycles, [0, 1)) at audio rate.

    Args:
      f0_pad: (B, T+2) fundamental in Hz with one frame of left/right context
        (edge-replicated offline; real neighbor frames when streaming).
      initial_phase: (B,) fundamental phase (cycles) entering the span.

    Returns:
      (B, T, hop) fractional cycles.

    Numerics: phases are tracked in cycles so wrapping is an exact
    floor-subtract.  The hop-boundary accumulation is TWO-LEVEL: within
    blocks of ``_PHASE_BLOCK`` frames the prefix runs as a parallel
    ``cumsum`` on the exact 1/4096-grid split (the coarse part's partial
    sums are exact multiples of 2^-12 below 2^24, so any summation order
    is exact; the residual part is < 2^-12 per frame, so its log-depth
    cumsum error is ~1e-8), and only the per-block carries go through a
    Kahan-compensated `lax.scan` with per-step wrapping.  This keeps the
    float32 accuracy of the round-2 full Kahan scan (~2e-7 cycles; the
    reference's audio-rate radian cumsum, harmonic_oscillator.py:41-43,
    drifts by whole radians) while cutting the sequential critical path
    from T tiny ops to T/128: the 60 s batch-1 render's phase stage drops
    from 2.0 ms to the carry chain's ~0.02 ms (scripts/scan_unroll_sweep.py
    measured the op-latency-bound scan; unroll does not help).
    """
    w = f0_pad / sample_rate  # cycles per sample, frame rate
    left, mid, right = w[:, :-2], w[:, 1:-1], w[:, 2:]  # (B, T)
    csum = jnp.asarray(hop_weight_cumsum(hop))  # (hop, 3)
    # Inclusive within-hop partial sums of upsampled cycle increments.
    partial = (
        left[:, :, None] * csum[None, None, :, 0]
        + mid[:, :, None] * csum[None, None, :, 1]
        + right[:, :, None] * csum[None, None, :, 2]
    )  # (B, T, hop), <= hop * f0_max/sr ~ 10 cycles
    delta = partial[:, :, -1]  # per-hop total increment (B, T)
    delta = delta - jnp.floor(delta)  # whole cycles are phase-irrelevant

    b, t = delta.shape
    block = _PHASE_BLOCK
    nb = -(-t // block)
    d = jnp.pad(delta, ((0, 0), (0, nb * block - t))).reshape(b, nb, block)
    # Exact-grid split: hi on the 1/4096 grid, lo < 2^-12.
    hi = jnp.floor(d * QUANT) * (1.0 / QUANT)
    lo = d - hi
    csum_hi = jnp.cumsum(hi, axis=-1)  # exact: grid multiples <= block
    csum_lo = jnp.cumsum(lo, axis=-1)  # <= block * 2^-12, error ~1e-8
    # Exclusive within-block prefix, wrapped while still split (the
    # unwrapped coarse prefix reaches ~block cycles where f32 ulp is too
    # coarse; frac() of a 2^-12-grid value is exact).
    excl_hi = csum_hi - hi  # exact (both on the grid)
    excl_lo = csum_lo - lo
    excl = (excl_hi - jnp.floor(excl_hi)) + excl_lo  # (B, nb, block) < 1.04

    # Per-block totals -> Kahan carry chain over nb steps only.
    tot_hi = csum_hi[..., -1]
    totals = (tot_hi - jnp.floor(tot_hi)) + csum_lo[..., -1]  # (B, nb)

    def step(carry, dtot):
        s, c = carry  # wrapped phase, Kahan compensation
        boundary = s  # phase at the START of this block (exclusive scan)
        y = dtot - c
        tt = s + y
        c = (tt - s) - y
        s = tt - jnp.floor(tt)  # exact wrap to [0, 1+eps)
        return (s, c), boundary

    s0 = initial_phase - jnp.floor(initial_phase)
    (_, _), block0 = jax.lax.scan(
        step, (s0, jnp.zeros_like(s0)), jnp.moveaxis(totals, 0, 1), unroll=8
    )
    block0 = jnp.moveaxis(block0, 0, 1)  # (B, nb)

    boundary = block0[:, :, None] + excl
    boundary = (boundary - jnp.floor(boundary)).reshape(b, nb * block)[:, :t]
    phi = boundary[:, :, None] + partial
    return phi - jnp.floor(phi)


QUANT = 4096.0  # split grid: h * coarse phase is exact in f32 for h <= 2048
_PHASE_BLOCK = 128  # two-level phase prefix: parallel within, Kahan across


def harmonic_sines(
    phase1: jnp.ndarray, n_harmonics: int, h_start: int = 0
) -> jnp.ndarray:
    """sin(2 pi h phi) for h = h_start+1..h_start+H from fundamental phase.

    Split-precision product: phi = hi + lo with hi on a 1/4096-cycle grid
    makes h*hi exactly representable (so its frac is exact), leaving only
    h*lo (tiny) in rounding territory -- the harmonic phase error stays
    ~h * ulp(phi) ~ 1e-5 cycles instead of ulp(h * phi) ~ 1e-3.
    """
    h = jnp.arange(1, n_harmonics + 1, dtype=phase1.dtype) + jnp.asarray(
        h_start, phase1.dtype
    )
    hi = jnp.floor(phase1 * QUANT) / QUANT
    lo = phase1 - hi
    coarse = hi[..., None] * h  # exact: multiples of 1/4096 below 2^24
    coarse = coarse - jnp.floor(coarse)
    frac = coarse + lo[..., None] * h
    frac = frac - jnp.floor(frac)
    return jnp.sin(TWO_PI * frac)


def _render_from_phase(
    phase1: jnp.ndarray,  # (B, T, hop) fractional fundamental phase (cycles)
    amps_pad: jnp.ndarray,  # (B, T+2, H) masked+renormalized amplitudes
    loud_pad: jnp.ndarray,  # (B, T+2) overall loudness
    n_harmonics: int,
    h_start: int = 0,
) -> jnp.ndarray:
    """sum_h amp_h(i) * sin(2 pi h phi1(i)), with linear-interp amps/loudness.

    The interpolated amplitude at sample (t, j) mixes frames (t-1, t, t+1)
    with weights w[j, k]; distributing the harmonic sum through the mix gives
    three per-frame contractions sharing one sine tensor, which XLA fuses.
    """
    b, t, hop = phase1.shape
    # (B, T, hop, H) sine basis -- the arithmetic core.
    sines = harmonic_sines(phase1, n_harmonics, h_start)
    # Frame windows of amplitudes: (B, T, 3, H)
    amp_win = jnp.stack(
        [amps_pad[:, :-2], amps_pad[:, 1:-1], amps_pad[:, 2:]], axis=2
    )
    # S[b,t,j,k] = sum_h sines[b,t,j,h] * amp_win[b,t,k,h].  HIGHEST keeps
    # true-f32 MXU passes: the default bf16 passes cost ~50 dB of render SNR.
    s = jnp.einsum(
        "btjh,btkh->btjk", sines, amp_win, precision=jax.lax.Precision.HIGHEST
    )
    w = jnp.asarray(hop_weights(hop))  # (hop, 3)
    harm = jnp.einsum("btjk,jk->btj", s, w)
    loud_win = jnp.stack(
        [loud_pad[:, :-2], loud_pad[:, 1:-1], loud_pad[:, 2:]], axis=2
    )  # (B, T, 3)
    loud_up = jnp.einsum("btk,jk->btj", loud_win, w)
    return (loud_up * harm).reshape(b, t * hop)


def render_padded(
    f0_pad: jnp.ndarray,
    amps_pad: jnp.ndarray,
    loud_pad: jnp.ndarray,
    *,
    sample_rate: int,
    hop: int,
    initial_phase: Optional[jnp.ndarray] = None,
    frame_chunk: Optional[int] = None,
    h_start: int = 0,
    normalize_amps: bool = True,
    impl: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render audio from frame-rate controls that carry 1 frame of context.

    Args:
      f0_pad: (B, T+2, 1) Hz.  amps_pad: (B, T+2, H).  loud_pad: (B, T+2, 1).
        Index 0 is the frame before the rendered span, index T+1 the frame
        after (edge-replicated for offline rendering; actual neighbors when
        streaming or time-sharding).
      initial_phase: (B,) fundamental phase entering the span, in CYCLES
        (harmonic h's phase is exactly h times it, mod 1).
      frame_chunk: if set, render in chunks of this many frames under
        ``jax.checkpoint`` to bound peak memory (the sine basis is
        rematerialized in the backward pass).  XLA path only: the Pallas
        kernel is already frame-blocked and never materializes the
        harmonic-resolved tensor, so chunking it would only add overhead.
      h_start: harmonic-number offset of ``amps_pad``'s slice of the bank
        (tensor parallelism over harmonics, parallel/tp.py); may be a traced
        scalar (``axis_index * shard`` inside shard_map).
      normalize_amps: apply Nyquist mask + renormalization here.  Pass False
        when amps were already masked/normalized globally (TP shards must
        normalize by the psum over every shard's amps).
      impl: 'xla' (einsum contraction) or 'pallas' (fused sine-bank kernel,
        ops/pallas/oscillator.py -- ~4x faster per chip at production shape).
        Both share the frame-rate phase scan; only the audio-rate stage
        differs, so outputs agree to float32 accuracy.

    Returns:
      audio: (B, T*hop) rendered harmonic signal.
      final_phase: (B,) fractional fundamental phase (cycles) after the
        span, for streaming/sharded continuation (replaces the reference's
        per-harmonic ``last_phases`` buffer, harmonic_oscillator.py:64-75).
    """
    b, tp2, _ = f0_pad.shape
    t = tp2 - 2
    n_harmonics = amps_pad.shape[-1]
    if initial_phase is None:
        initial_phase = jnp.zeros((b,), f0_pad.dtype)

    if normalize_amps:
        amps_pad = nyquist_normalized_amps(
            f0_pad, amps_pad, sample_rate, h_start=h_start
        )
    f0p = f0_pad[..., 0]
    loudp = loud_pad[..., 0]

    phase1 = _fundamental_phase_cycles(f0p, hop, sample_rate, initial_phase)
    # Final fundamental phase = phase of the last rendered sample.
    final_phase = phase1[:, -1, -1]

    if impl == "pallas":
        from ddsp_tpu.ops.pallas.oscillator import pallas_render_from_phase

        audio = pallas_render_from_phase(
            phase1, amps_pad, loudp, h_start=h_start
        )
        return audio, final_phase

    if frame_chunk is None or frame_chunk >= t:
        audio = _render_from_phase(phase1, amps_pad, loudp, n_harmonics, h_start)
        return audio, final_phase

    if t % frame_chunk:
        raise ValueError(f"frame_chunk {frame_chunk} must divide T={t}")
    n_chunks = t // frame_chunk

    def window(x, i):  # frames [i*fc - 1, (i+1)*fc + 1) of a padded array
        return jax.lax.dynamic_slice_in_dim(x, i * frame_chunk, frame_chunk + 2, 1)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk(i):
        ph = jax.lax.dynamic_slice_in_dim(phase1, i * frame_chunk, frame_chunk, 1)
        return _render_from_phase(
            ph, window(amps_pad, i), window(loudp, i), n_harmonics, h_start
        )

    chunks = jax.lax.map(chunk, jnp.arange(n_chunks))  # (n_chunks, B, fc*hop)
    audio = jnp.moveaxis(chunks, 0, 1).reshape(b, t * hop)
    return audio, final_phase


def render_hop_rows(
    f0_pad: jnp.ndarray,  # (N, 3, 1): each row's (prev, cur, next) f0
    amps_pad: jnp.ndarray,  # (N, 3, H)
    loud_pad: jnp.ndarray,  # (N, 3, 1)
    *,
    sample_rate: int,
    hop: int,
    initial_phase: jnp.ndarray,  # (N,) per-row fundamental phase, cycles
    impl: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render ONE hop for N independent rows (the serving/streaming case).

    Semantically identical to ``render_padded`` at T=1 (each row a
    separate stream with its own 3-frame context); with ``impl='pallas'``
    the rows ride the frame axis of the fused slot-hop kernel
    (ops/pallas/oscillator.pallas_render_hop_slots) instead of the XLA
    path's HBM-materialized (N, hop, H) sine tensor.  Forward-only --
    serving steps are not differentiated.

    Returns (audio (N, hop), final phase (N,)).
    """
    if impl != "pallas":
        return render_padded(
            f0_pad,
            amps_pad,
            loud_pad,
            sample_rate=sample_rate,
            hop=hop,
            initial_phase=initial_phase,
        )
    from ddsp_tpu.ops.pallas.oscillator import pallas_render_hop_slots

    amps_n = nyquist_normalized_amps(f0_pad, amps_pad, sample_rate)
    f0p = f0_pad[..., 0]
    loudp = loud_pad[..., 0]
    phase1 = _fundamental_phase_cycles(f0p, hop, sample_rate, initial_phase)
    final_phase = phase1[:, -1, -1]
    n = f0p.shape[0]
    audio = pallas_render_hop_slots(
        jnp.moveaxis(phase1, 0, 1),  # (1, N, hop): slots on the frame axis
        amps_n[:, 0][None],
        amps_n[:, 1][None],
        amps_n[:, 2][None],
        loudp[:, 0][None],
        loudp[:, 1][None],
        loudp[:, 2][None],
    ).reshape(n, hop)
    return audio, final_phase


def oscillator_bank(
    f0: jnp.ndarray,
    harm_amps: jnp.ndarray,
    loudness: jnp.ndarray,
    *,
    sample_rate: int,
    hop: int,
    initial_phase: Optional[jnp.ndarray] = None,
    frame_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Offline additive synthesis from frame-rate controls.

    Args:
      f0: (B, T, 1) Hz.  harm_amps: (B, T, H).  loudness: (B, T, 1).

    Returns:
      (audio (B, T*hop), final fundamental phase (B,)).  Matches the
      reference ``OscillatorBank.forward`` (harmonic_oscillator.py:57-62)
      with edge-replicated interpolation context.
    """
    from ddsp_tpu.ops.interp import edge_pad_frames as pad

    return render_padded(
        pad(f0),
        pad(harm_amps),
        pad(loudness),
        sample_rate=sample_rate,
        hop=hop,
        initial_phase=initial_phase,
        frame_chunk=frame_chunk,
    )
