"""Time-sharded rendering: long audio over the 'time' mesh axis.

The reference renders on one GPU and its only cross-time couplings are the
phase accumulator, the reverb convolution, and the (frame-rate) GRU
(SURVEY.md section 5, long-context).  Sharding the sample axis therefore
needs exactly three mechanisms, all implemented here with shard_map
collectives:

1. **Phase carry**: each time shard sums its per-hop fundamental phase
   increments (fractional cycles, cheap frame-rate reduction) and an
   exclusive scan across shards -- an ``all_gather`` of one scalar per
   shard -- gives each shard its starting phase.  No audio-rate scan
   crosses shard boundaries.
2. **Control halo**: the hop interpolation needs one neighbor frame on each
   side; fetched with ``ppermute`` (edge shards replicate, matching the
   offline edge-clamp).
3. **Reverb halo (overlap-save)**: each shard fetches the previous
   ``ir_length`` dry samples from its left neighbors (one or more
   ``ppermute`` hops for short shards) and convolves locally; outputs match
   the full causal convolution exactly.

The filtered-noise branch is frame-local; its RNG is keyed by absolute
frame index so sharded output is bit-identical to single-device output.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddsp_tpu.config import Config
from ddsp_tpu.models.synths import reverb_impulse
from ddsp_tpu.ops.fir import (
    convolve_designed_fir,
    fft_convolve,
    filtered_noise,
    frame_noise,
)
from ddsp_tpu.ops.interp import hop_weight_cumsum
from ddsp_tpu.ops.oscillator import render_padded
from ddsp_tpu.parallel.mesh import TIME_AXIS


def _neighbor_frame(x: jnp.ndarray, direction: int, axis_name: str) -> jnp.ndarray:
    """Fetch the adjacent shard's edge frame (direction=+1: left neighbor's
    last frame; -1: right neighbor's first frame).  Edge shards fall back to
    their own clamped edge (offline edge-replication semantics)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if direction == +1:
        edge = x[:, -1:]
        perm = [(i, i + 1) for i in range(n - 1)]
        fallback = x[:, :1]
        is_edge = idx == 0
    else:
        edge = x[:, :1]
        perm = [(i + 1, i) for i in range(n - 1)]
        fallback = x[:, -1:]
        is_edge = idx == n - 1
    got = jax.lax.ppermute(edge, axis_name, perm)
    return jnp.where(is_edge, fallback, got)


def _phase_carry(delta_frac_total: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Exclusive scan of per-shard phase increments: (B,) -> (B,) carry."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    all_deltas = jax.lax.all_gather(delta_frac_total, axis_name)  # (n, B)
    mask = (jnp.arange(n) < idx)[:, None]
    carry = jnp.sum(all_deltas * mask, axis=0)
    return carry - jnp.floor(carry)


def _halo_left(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Previous ``halo`` samples from left neighbors (zeros before start).

    Works even when halo spans multiple shards: K = ceil(halo/local) hops of
    ``ppermute`` shift tails rightward around the ring.
    """
    local = x.shape[-1]
    k = -(-halo // local)  # shards the halo spans
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    pieces = []
    block = x
    for hop_count in range(1, k + 1):
        perm = [(i, i + hop_count) for i in range(n - hop_count)]
        shifted = jax.lax.ppermute(block, axis_name, perm)
        shifted = jnp.where(idx >= hop_count, shifted, jnp.zeros_like(shifted))
        pieces.append(shifted)
    window = jnp.concatenate(pieces[::-1] + [jnp.zeros_like(x[..., :0])], axis=-1) \
        if pieces else x[..., :0]
    return window[..., -halo:] if window.shape[-1] >= halo else jnp.pad(
        window, [(0, 0)] * (window.ndim - 1) + [(halo - window.shape[-1], 0)]
    )


def _local_delta_total(f0_pad: jnp.ndarray, hop: int, sample_rate: int) -> jnp.ndarray:
    """Total fractional phase increment of this shard's hops, (B,)."""
    w = f0_pad[..., 0] / sample_rate  # (B, T+2) cycles/sample
    csum = jnp.asarray(hop_weight_cumsum(hop))[-1]  # (3,) full-hop weights
    delta = (
        w[:, :-2] * csum[0] + w[:, 1:-1] * csum[1] + w[:, 2:] * csum[2]
    )  # (B, T)
    delta = delta - jnp.floor(delta)
    total = jnp.sum(delta, axis=1)
    return total - jnp.floor(total)


def render_controls_local(
    rev_params: Dict,
    f0: jnp.ndarray,
    amps: jnp.ndarray,
    loud: jnp.ndarray,
    noise_mags: jnp.ndarray,
    key: jax.Array,
    conf: Config,
    t_local: int,
    frame_chunk: Optional[int] = None,
    data_axis: Optional[str] = None,
    b_global: Optional[int] = None,
    impl: Optional[str] = None,
    model_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Per-shard synthesis body: local frames -> local audio samples.

    Must run inside a ``shard_map`` over ``TIME_AXIS`` (it issues ppermute /
    all_gather collectives for the control halo, phase carry, and reverb
    overlap-save halo).  Exposed so other sharded computations — e.g. the
    sequence-parallel train step (parallel/sp.py) — can reuse the exact
    render path inside their own shard_map.

    When the batch rows are *also* sharded (over ``data_axis``), pass that
    axis name and the global batch size: the noise is then drawn at global
    batch shape and row-sliced per shard, so every row's noise is
    bit-identical to the unsharded render (the tp.py convention).

    ``impl`` selects the oscillator's audio-rate stage ('xla' | 'pallas');
    None resolves from ``conf.osc_impl`` -- on TPU the fused Pallas kernel
    runs per shard, so time-sharded scale-out keeps the single-chip per-chip
    rate instead of falling back to the einsum path.

    When the harmonic bank is *also* sharded (over ``model_axis``), ``amps``
    is this rank's contiguous harmonic slice: the Nyquist renormalization
    denominator and the partial audio are reduced over ``model_axis`` with
    one ``psum`` each (the parallel/tp.py convention; f0 is replicated over
    'model', so every model rank computes the same phase carry).
    """
    from ddsp_tpu.models.synths import osc_impl_name

    if impl is None:
        impl = osc_impl_name(conf)
    idx = jax.lax.axis_index(TIME_AXIS)

    def with_context(x):
        prev = _neighbor_frame(x, +1, TIME_AXIS)
        nxt = _neighbor_frame(x, -1, TIME_AXIS)
        return jnp.concatenate([prev, x, nxt], axis=1)

    f0_pad = with_context(f0)
    amps_pad = with_context(amps)
    loud_pad = with_context(loud)

    # 1. phase carry across shards
    delta_total = _local_delta_total(f0_pad, conf.hop_length, conf.sample_rate)
    phase0 = _phase_carry(delta_total, TIME_AXIS)

    if model_axis is None:
        harm, _ = render_padded(
            f0_pad,
            amps_pad,
            loud_pad,
            sample_rate=conf.sample_rate,
            hop=conf.hop_length,
            initial_phase=phase0,
            frame_chunk=frame_chunk,
            impl=impl,
        )
    else:
        from ddsp_tpu.ops.oscillator import nyquist_normalized_amps

        h_local = amps.shape[-1]
        h0 = jax.lax.axis_index(model_axis) * h_local
        masked = nyquist_normalized_amps(
            f0_pad, amps_pad, conf.sample_rate, h_start=h0, normalize=False
        )
        denom = jax.lax.psum(
            jnp.sum(masked, axis=-1, keepdims=True), model_axis
        )
        partial, _ = render_padded(
            f0_pad,
            masked / denom,
            loud_pad,
            sample_rate=conf.sample_rate,
            hop=conf.hop_length,
            initial_phase=phase0,
            h_start=h0,
            normalize_amps=False,
            frame_chunk=frame_chunk,
            impl=impl,
        )
        harm = jax.lax.psum(partial, model_axis)

    # 2. frame-local noise with global frame offsets (bit-stable)
    if data_axis is None:
        noise_sig = filtered_noise(
            noise_mags, key, conf.hop_length, frame_offset=idx * t_local
        )
    else:
        b_local = noise_mags.shape[0]
        frames = frame_noise(
            key, b_global, noise_mags.shape[1], conf.hop_length,
            frame_offset=idx * t_local, dtype=noise_mags.dtype,
        )
        didx = jax.lax.axis_index(data_axis)
        frames = jax.lax.dynamic_slice_in_dim(
            frames, didx * b_local, b_local, 0
        )
        noise_sig = convolve_designed_fir(noise_mags, frames)
    dry = harm + noise_sig

    # 3. overlap-save reverb: halo of ir_len previous dry samples
    ir_len = conf.ir_length
    halo = _halo_left(dry, ir_len, TIME_AXIS)
    window = jnp.concatenate([halo, dry], axis=-1)
    impulse = reverb_impulse(rev_params, conf)
    wet = fft_convolve(window, impulse[None, :], kernel_len=ir_len)
    return wet[..., -dry.shape[-1] :]


def render_controls_sharded(
    reverb_params: Dict,
    controls: Dict[str, jnp.ndarray],
    conf: Config,
    mesh: Mesh,
    noise_key: jax.Array,
    frame_chunk: Optional[int] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Render synthesis controls to audio with the frame axis sharded over
    the 'time' mesh axis.

    Args:
      controls: {f0 (B,T,1), c (B,T,H), a (B,T,1), H (B,T,nf)} -- frame-rate
        controls (e.g. from controller_apply), T divisible by mesh 'time'.
      reverb_params: learned reverb parameters (replicated).

    Returns:
      (B, T*hop) audio, sharded along the sample axis; numerically matches
      the single-device decoder synthesis path to float32 accuracy.
    """
    n_time = mesh.shape[TIME_AXIS]
    t_total = controls["f0"].shape[1]
    if t_total % n_time:
        raise ValueError(f"T={t_total} not divisible by time axis {n_time}")
    t_local = t_total // n_time

    ctrl_spec = P(None, TIME_AXIS, None)
    out_spec = P(None, TIME_AXIS)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), ctrl_spec, ctrl_spec, ctrl_spec, ctrl_spec, P()),
        out_specs=out_spec,
        check_vma=False,
    )
    def shard_render(rev_params, f0, amps, loud, noise_mags, key):
        return render_controls_local(
            rev_params, f0, amps, loud, noise_mags, key, conf, t_local,
            frame_chunk, impl=impl,
        )

    return shard_render(
        reverb_params,
        controls["f0"],
        controls["c"],
        controls["a"],
        controls["H"],
        noise_key,
    )


def render_long_audio(
    decoder_params: Dict,
    batch: Dict[str, jnp.ndarray],
    conf: Config,
    mesh: Mesh,
    noise_key: jax.Array,
    frame_chunk: Optional[int] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Controller (replicated, frame rate) -> time-sharded synthesis.

    The GRU is sequential over frames but runs at frame rate (~86 Hz), so it
    stays replicated; only the sample-rate synthesis (where the FLOPs are)
    is sharded.  (SURVEY.md section 7, 'GRU in a pjit world'.)
    """
    from ddsp_tpu.models.controller import controller_apply

    controls, _ = controller_apply(decoder_params["controller"], batch)
    return render_controls_sharded(
        decoder_params["reverb"], controls, conf, mesh, noise_key, frame_chunk,
        impl=impl,
    )
