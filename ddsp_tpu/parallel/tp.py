"""Tensor parallelism over the harmonic axis of the oscillator bank.

The reference has no model parallelism of any kind (single GPU,
SURVEY.md section 2 last rows); the survey names "optional TP over
harmonics/filter-channel axes" as a first-class deliverable of the TPU
framework.  Design:

* The 180-harmonic sine bank -- the arithmetic core of the synth -- is
  sharded over a 'model' mesh axis: each device renders a contiguous slice
  of harmonic numbers (the amp tensor sharded on its channel axis, rendered
  with the matching ``h_start`` offset).
* The Nyquist-renormalization denominator (a sum over ALL harmonics,
  reference harmonic_oscillator.py:33) and the partial audio are the only
  cross-shard quantities; both are single ``psum``s over ICI.
* Frame-rate controls (f0, loudness) and the tiny noise/reverb branches
  stay replicated over 'model' -- their FLOPs are a rounding error next to
  the bank, and sharding the 195 noise-filter channels would trade one
  matmul for an extra psum of the same size as its output.
* Composes with data parallelism: mesh ('data', 'model'), batch sharded
  over 'data', params replicated.  Gradients flow through the psums
  (shard_map differentiates collectives), so the same train-step shape
  works DP x TP.

This is throughput-neutral on one chip and exists for scale-out of wide
banks (thousands of harmonics / many-voice polyphony) where a single
device's VMEM cannot hold the sine-bank working set.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ddsp_tpu.config import Config
from ddsp_tpu.models.synths import reverb_apply
from ddsp_tpu.ops.fir import convolve_designed_fir, fft_convolve, frame_noise
from ddsp_tpu.ops.interp import edge_pad_frames as _edge_pad
from ddsp_tpu.ops.oscillator import nyquist_normalized_amps, render_padded
from ddsp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh


def make_dp_tp_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh: batch over 'data', harmonics over 'model'."""
    return make_mesh(n_data, n_model, devices, axis_names=(DATA_AXIS, MODEL_AXIS))


def render_controls_tp(
    reverb_params: Dict,
    controls: Dict[str, jnp.ndarray],
    conf: Config,
    mesh: Mesh,
    noise_key: jax.Array,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Render controls to audio with the harmonic bank sharded over 'model'.

    Args:
      controls: {f0 (B,T,1), c (B,T,H), a (B,T,1), H (B,T,nf)} frame-rate
        controls; B divisible by the 'data' axis.  H is zero-padded up to a
        multiple of the 'model' axis (zero-amp harmonics are inert).

    Returns:
      (B, T*hop) audio, sharded over 'data', replicated over 'model';
      numerically matches the single-device synthesis path (same math, the
      amp-renorm sum and audio sum merely reduced via psum).

    ``impl`` ('xla' | 'pallas' | None = resolve from ``conf.osc_impl``):
    with 'pallas' each shard renders its harmonic slice through the fused
    sine-bank kernel (the bank fill seeded at ``h_start``), so TP scale-out
    keeps the single-chip per-chip rate.
    """
    from ddsp_tpu.models.synths import osc_impl_name

    if impl is None:
        impl = osc_impl_name(conf)
    n_model = mesh.shape[MODEL_AXIS]
    b_global = controls["f0"].shape[0]
    b_local = b_global // mesh.shape[DATA_AXIS]
    h_total = controls["c"].shape[-1]
    pad = (-h_total) % n_model
    c = (
        jnp.pad(controls["c"], ((0, 0), (0, 0), (0, pad)))
        if pad
        else controls["c"]
    )
    h_local = (h_total + pad) // n_model
    t = controls["f0"].shape[1]
    hop = conf.hop_length

    rspec = P(DATA_AXIS, None, None)
    cspec = P(DATA_AXIS, None, MODEL_AXIS)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), rspec, cspec, rspec, rspec, P()),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )
    def shard(rev_params, f0, c_local, a, noise_mags, key):
        h0 = jax.lax.axis_index(MODEL_AXIS) * h_local
        f0p, cp, ap = _edge_pad(f0), _edge_pad(c_local), _edge_pad(a)
        # Nyquist mask locally, renormalize by the global (psum'd) sum.
        masked = nyquist_normalized_amps(
            f0p, cp, conf.sample_rate, h_start=h0, normalize=False
        )
        denom = jax.lax.psum(
            jnp.sum(masked, axis=-1, keepdims=True), MODEL_AXIS
        )
        amps = masked / denom
        partial, _ = render_padded(
            f0p,
            amps,
            ap,
            sample_rate=conf.sample_rate,
            hop=hop,
            h_start=h0,
            normalize_amps=False,
            impl=impl,
        )
        harm = jax.lax.psum(partial, MODEL_AXIS)

        # Noise branch, replicated over 'model'.  The global batch's noise is
        # drawn and row-sliced so DP output is bit-identical to unsharded.
        didx = jax.lax.axis_index(DATA_AXIS)
        noise_full = frame_noise(key, b_global, t, hop, 0, harm.dtype)
        noise = jax.lax.dynamic_slice_in_dim(
            noise_full, didx * b_local, b_local, 0
        )
        dry = harm + convolve_designed_fir(noise_mags, noise)
        return reverb_apply(rev_params, dry, conf)

    return shard(
        reverb_params,
        controls["f0"],
        c,
        controls["a"],
        controls["H"],
        noise_key,
    )


def decoder_apply_tp(
    params: Dict,
    batch: Dict[str, jnp.ndarray],
    conf: Config,
    mesh: Mesh,
    noise_key: jax.Array,
) -> jnp.ndarray:
    """Full decode with TP synthesis: controller (replicated over 'model',
    batch-sharded over 'data' by GSPMD) -> harmonic-sharded synth."""
    from ddsp_tpu.models.controller import controller_apply

    dtype = (
        jnp.dtype(conf.compute_dtype) if conf.compute_dtype != "float32" else None
    )
    controls, _ = controller_apply(params["controller"], batch, compute_dtype=dtype)
    return render_controls_tp(params["reverb"], controls, conf, mesh, noise_key)


def make_tp_train_step(conf: Config, mesh: Mesh):
    """Jitted DP x TP train step: same contract as trainer.make_train_step,
    with the synthesis FLOPs sharded over 'model' and the batch over 'data'.
    Gradients of the psums are the standard shard_map transposes; the
    optimizer update runs replicated (params are replicated)."""
    from ddsp_tpu.training.trainer import loss_fn, make_train_step

    def tp_decode(params, batch, conf_, noise_key):
        return decoder_apply_tp(params, batch, conf_, mesh, noise_key)

    tp_loss = functools.partial(loss_fn, decode=tp_decode)
    return jax.jit(make_train_step(conf, loss=tp_loss), donate_argnums=0)


def make_time_tp_mesh(
    n_time: int = 1,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('time', 'model') mesh: long-render frames over 'time', the harmonic
    bank over 'model'."""
    from ddsp_tpu.parallel.mesh import TIME_AXIS

    return make_mesh(n_time, n_model, devices, axis_names=(TIME_AXIS, MODEL_AXIS))


def render_controls_time_tp(
    reverb_params: Dict,
    controls: Dict[str, jnp.ndarray],
    conf: Config,
    mesh: Mesh,
    noise_key: jax.Array,
    frame_chunk: Optional[int] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Long-render scale-out on BOTH axes: frames sharded over 'time', the
    harmonic bank over 'model'.

    Composes the two sharding mechanisms directly -- they touch different
    mesh axes, so the collectives do not interact:

    * over 'time': the exclusive-scan phase carry, ppermute control halos,
      and overlap-save reverb halos of parallel/render.py (f0 is replicated
      over 'model', so every model rank computes the same carry);
    * over 'model': the psum'd Nyquist renormalization and partial-audio
      reduction of render_controls_tp.

    The noise and reverb branches are computed replicated over 'model'
    (identical inputs -> identical outputs), so the result is replicated
    over 'model' and sharded over 'time', matching the single-device render
    to float32 accuracy.
    """
    from ddsp_tpu.models.synths import osc_impl_name, reverb_impulse
    from ddsp_tpu.ops.fir import filtered_noise
    from ddsp_tpu.parallel.mesh import TIME_AXIS
    from ddsp_tpu.parallel.render import (
        _halo_left,
        _local_delta_total,
        _neighbor_frame,
        _phase_carry,
    )

    if impl is None:
        impl = osc_impl_name(conf)
    n_time = mesh.shape[TIME_AXIS]
    n_model = mesh.shape[MODEL_AXIS]
    t_total = controls["f0"].shape[1]
    if t_total % n_time:
        raise ValueError(f"T={t_total} not divisible by time axis {n_time}")
    t_local = t_total // n_time
    h_total = controls["c"].shape[-1]
    pad = (-h_total) % n_model
    c = (
        jnp.pad(controls["c"], ((0, 0), (0, 0), (0, pad)))
        if pad
        else controls["c"]
    )
    h_local = (h_total + pad) // n_model

    ctrl_spec = P(None, TIME_AXIS, None)
    c_spec = P(None, TIME_AXIS, MODEL_AXIS)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), ctrl_spec, c_spec, ctrl_spec, ctrl_spec, P()),
        out_specs=P(None, TIME_AXIS),
        check_vma=False,
    )
    def shard(rev_params, f0, c_local, a, noise_mags, key):
        tidx = jax.lax.axis_index(TIME_AXIS)
        h0 = jax.lax.axis_index(MODEL_AXIS) * h_local

        def with_context(x):
            prev = _neighbor_frame(x, +1, TIME_AXIS)
            nxt = _neighbor_frame(x, -1, TIME_AXIS)
            return jnp.concatenate([prev, x, nxt], axis=1)

        f0p, cp, ap = with_context(f0), with_context(c_local), with_context(a)

        delta_total = _local_delta_total(f0p, conf.hop_length, conf.sample_rate)
        phase0 = _phase_carry(delta_total, TIME_AXIS)

        masked = nyquist_normalized_amps(
            f0p, cp, conf.sample_rate, h_start=h0, normalize=False
        )
        denom = jax.lax.psum(
            jnp.sum(masked, axis=-1, keepdims=True), MODEL_AXIS
        )
        amps = masked / denom
        partial, _ = render_padded(
            f0p,
            amps,
            ap,
            sample_rate=conf.sample_rate,
            hop=conf.hop_length,
            initial_phase=phase0,
            h_start=h0,
            normalize_amps=False,
            frame_chunk=frame_chunk,
            impl=impl,
        )
        harm = jax.lax.psum(partial, MODEL_AXIS)

        noise = filtered_noise(
            noise_mags, key, conf.hop_length, frame_offset=tidx * t_local
        )
        dry = harm + noise

        halo = _halo_left(dry, conf.ir_length, TIME_AXIS)
        window = jnp.concatenate([halo, dry], axis=-1)
        impulse = reverb_impulse(rev_params, conf)
        wet = fft_convolve(window, impulse[None, :], kernel_len=conf.ir_length)
        return wet[..., -dry.shape[-1] :]

    return shard(
        reverb_params,
        controls["f0"],
        c,
        controls["a"],
        controls["H"],
        noise_key,
    )
