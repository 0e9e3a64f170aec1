"""Sequence-parallel training: MSS loss + gradients over time-sharded audio.

The reference trains only on 2 s examples (single GPU, reference
train/train.py:46-51); long-context training is impossible there.  Here the
*training step itself* runs with the sample axis sharded over the 'time'
mesh axis, extending the time-sharded render (parallel/render.py) to the
full loss+grad path, so examples far longer than one chip's activation
memory train with DP x SP sharding:

* **Forward**: the controller runs replicated at frame rate (GRU is
  sequential but tiny, SURVEY.md section 7, 'GRU in a pjit world'); the
  sample-rate synthesis reuses ``render_controls_local`` — phase carry,
  control halos, and overlap-save reverb halos over ``ppermute``.
* **Loss**: each shard computes the STFT frames it owns.  A frame of the
  centered spectrogram (torchaudio conventions, reference
  loss/mss_loss.py:23) straddles shard edges by up to ``n_fft//2``
  samples, so shards exchange an ``n_fft//2`` halo per side (global edges
  reflect locally, matching the offline reflect pad), evaluate the
  hop-blocked Hann-rDFT matmuls on the local window, and the scalar loss
  is assembled from ``psum``'d per-shard |.|-sums — identical math to the
  offline loss (tested vs the single-device step).
* **Backward**: plain ``jax.grad`` through the shard_map; collective
  transposes (psum <-> broadcast, ppermute reversal) are handled by JAX.

Gradients and loss match the single-device train step to float32 accuracy,
so SP is purely a scale-out decision, never a numerics decision.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import controller_apply
from ddsp_tpu.ops.spectral import _spectrogram_hopblocked
from ddsp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, TIME_AXIS
from ddsp_tpu.parallel.render import render_controls_local
from ddsp_tpu.training.trainer import make_train_step


def _stft_halo_window(x: jnp.ndarray, half: int, axis_name: str) -> jnp.ndarray:
    """[left halo | local | right halo] of ``half`` samples per side.

    Interior halos come from the ring neighbors (one ``ppermute`` hop each
    way); the global edges reflect the shard's own samples, matching the
    offline ``reflect_pad`` (torch 'reflect': no edge repeat).  Requires
    local length >= half + 1.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    local = x.shape[-1]
    if local < half + 1:
        raise ValueError(
            f"local shard length {local} < n_fft//2 + 1 = {half + 1}; "
            "use fewer time shards or longer examples"
        )
    left = jax.lax.ppermute(
        x[..., -half:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    left = jnp.where(idx == 0, x[..., 1 : half + 1][..., ::-1], left)
    right = jax.lax.ppermute(
        x[..., :half], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    right = jnp.where(idx == n - 1, x[..., -half - 1 : -1][..., ::-1], right)
    return jnp.concatenate([left, x, right], axis=-1)


def _sharded_sss_sums(
    pred: jnp.ndarray,
    true: jnp.ndarray,
    n_fft: int,
    hop: int,
    eps: float,
    matmul_dtype,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local (linear, log) |diff|-sums of one STFT scale on a time shard.

    Shard s owns global frames [s*Ls/hop, (s+1)*Ls/hop), and the last shard
    additionally owns the final (T_global = L/hop) frame — together exactly
    the 1 + L/hop centered frames of the offline spectrogram.  Every shard
    computes Ls/hop + 1 frames from its halo'd window; the extra frame is
    masked off except on the last shard.
    """
    half = n_fft // 2
    is_last = jax.lax.axis_index(TIME_AXIS) == jax.lax.axis_size(TIME_AXIS) - 1

    def mags(x):
        window = _stft_halo_window(x, half, TIME_AXIS)
        re, im = _spectrogram_hopblocked(window, n_fft, hop, matmul_dtype)
        return re * re + im * im  # (B_loc, T_loc+1, bins)

    mp, mt = mags(pred), mags(true)
    mask = jnp.concatenate(
        [
            jnp.ones(mp.shape[1] - 1, mp.dtype),
            jnp.where(is_last, 1.0, 0.0)[None].astype(mp.dtype),
        ]
    )[None, :, None]
    lin = jnp.sum(jnp.abs(mp - mt) * mask)
    log = jnp.sum(
        jnp.abs(jnp.log2(mt + eps) - jnp.log2(mp + eps)) * mask
    )
    return lin, log


def make_sp_loss(conf: Config, mesh: Mesh, frame_chunk: Optional[int] = None):
    """Sequence-parallel loss with :func:`trainer.loss_fn`'s signature.

    ``(params, batch, conf, noise_key) -> (loss, per-scale dict)`` with the
    synthesis and the MSS loss sharded over ('data', 'time'): batch rows
    over 'data', frames/samples over 'time'.  Drop-in for
    ``make_train_step(conf, loss=...)``.

    When the mesh also has a 'model' axis (``mesh.make_mesh3``), the
    harmonic bank is additionally sharded over it (the parallel/tp.py
    psum'd-renorm convention), composing the full DP x SP x TP algebra in
    one train step.
    """
    n_time = mesh.shape[TIME_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    n_model = dict(mesh.shape).get(MODEL_AXIS, 0)
    has_model = n_model > 0

    def sp_loss(params, batch: Dict[str, jnp.ndarray], conf_: Config, noise_key):
        del conf_  # bound at construction; kept for signature parity
        b, t_total = batch["f0"].shape[0], batch["f0"].shape[1]
        if t_total % n_time:
            raise ValueError(f"T={t_total} not divisible by time={n_time}")
        if b % n_data:
            raise ValueError(f"B={b} not divisible by data={n_data}")
        t_local = t_total // n_time
        length = batch["audio"].shape[-1]
        loss_dtype = (
            None
            if conf.loss_matmul_dtype == "float32"
            else jnp.dtype(conf.loss_matmul_dtype)
        )

        # Frame-rate controller: replicated over 'time', batch over 'data'.
        controls, _ = controller_apply(params["controller"], batch)
        ctrl_spec = P(DATA_AXIS, TIME_AXIS, None)
        constrain = lambda v: jax.lax.with_sharding_constraint(  # noqa: E731
            v, NamedSharding(mesh, ctrl_spec)
        )
        c = controls["c"]
        if has_model:
            pad = (-c.shape[-1]) % n_model  # zero-amp harmonics are inert
            if pad:
                c = jnp.pad(c, ((0, 0), (0, 0), (0, pad)))
            c_spec = P(DATA_AXIS, TIME_AXIS, MODEL_AXIS)
            c = jax.lax.with_sharding_constraint(c, NamedSharding(mesh, c_spec))
        else:
            c_spec = ctrl_spec
            c = constrain(c)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                P(),
                ctrl_spec,
                c_spec,
                ctrl_spec,
                ctrl_spec,
                P(DATA_AXIS, TIME_AXIS),
                P(),
            ),
            out_specs=P(),
            check_vma=False,
        )
        def synth_and_loss(rev_params, f0, amps, loud, noise_mags, audio, key):
            pred = render_controls_local(
                rev_params, f0, amps, loud, noise_mags, key, conf, t_local,
                frame_chunk, data_axis=DATA_AXIS, b_global=b,
                model_axis=MODEL_AXIS if has_model else None,
            )
            scales = {}
            for n_fft in conf.mss_ffts:
                hop = int(n_fft * (1 - conf.mss_overlap))
                lin, log = _sharded_sss_sums(
                    pred, audio, n_fft, hop, 1e-7, loss_dtype
                )
                lin = jax.lax.psum(lin, (DATA_AXIS, TIME_AXIS))
                log = jax.lax.psum(log, (DATA_AXIS, TIME_AXIS))
                count = b * (1 + length // hop) * (n_fft // 2 + 1)
                scales[f"mss_{n_fft}"] = (lin + conf.mss_alpha * log) / count
            return scales

        scales = synth_and_loss(
            params["reverb"],
            constrain(controls["f0"]),
            c,
            constrain(controls["a"]),
            constrain(controls["H"]),
            batch["audio"],
            noise_key,
        )
        return sum(scales.values()), scales

    return sp_loss


def make_sp_train_step(conf: Config, mesh: Mesh, frame_chunk: Optional[int] = None):
    """Jitted DP x SP train step: params replicated, batch rows sharded over
    'data', frames/samples sharded over 'time'.

    Same optimizer/metrics plumbing as the single-device step
    (``trainer.make_train_step``); only the loss is swapped.  Loss and
    gradients match the single-device step to float32 accuracy
    (tests/test_parallel.py), so SP changes where activations live, not
    what the optimizer sees.

    With a 3-axis ('data', 'time', 'model') mesh this becomes the full
    DP x SP x TP step: the harmonic bank additionally shards over 'model'
    (see make_sp_loss); still equal to the single-device step.
    """
    return jax.jit(
        make_train_step(conf, loss=make_sp_loss(conf, mesh, frame_chunk)),
        donate_argnums=0,
    )
