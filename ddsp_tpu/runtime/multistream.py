"""Multi-stream serving runtime: N concurrent real-time streams, one chip.

The reference serves exactly one JACK client (reference rt/synth.py:16-27,
module-level singleton).  On TPU the economics invert: the streaming hop is
latency-bound (GRU recurrence + dispatch), so stepping N streams in one
fused jit costs barely more than stepping one -- batch-16 offline rendering
runs ~2x the per-stream rate of batch-1 (docs/PERFORMANCE.md).  This module
packs N independent streams into fixed batch slots of one device step:

* per-slot pipeline state: each slot has its own frame counter, GRU hidden,
  phase, control context, and reverb history, so slots can join/leave at
  any time without perturbing neighbors (``reset_slots``);
* exact single-stream semantics: slot ``i`` stepped inside the batch is
  bit-identical to a lone stream whose noise key is ``fold_in(key, i)``
  (tests/test_multistream.py) -- the noise RNG folds (slot, absolute
  frame), the batched analogue of the frame-indexed keying that makes
  streaming match offline (ops/fir.frame_noise);
* the device step is one jit over all slots: features (CREPE + loudness),
  controller, oscillator/noise/reverb -- no per-stream dispatch.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import controller_apply
from ddsp_tpu.models.synths import osc_impl_name, reverb_live, reverb_live_init
from ddsp_tpu.ops.fir import convolve_designed_fir
from ddsp_tpu.ops.oscillator import render_hop_rows
from ddsp_tpu.runtime.streaming import (
    FeatureStreamState,
    feature_stream_init,
    make_feature_stream_step,
    _zero_controls,
)


class MultiStreamState(NamedTuple):
    feat: FeatureStreamState  # rolling input buffers (N, window)
    hidden: jnp.ndarray  # (layers, N, H) GRU state
    phase: jnp.ndarray  # (N,) fundamental phase, cycles
    prev: Dict[str, jnp.ndarray]  # controls of frame t-1, (N, 1, .)
    cur: Dict[str, jnp.ndarray]  # controls of frame t (not yet rendered)
    pending: Dict[str, jnp.ndarray]  # noise mags {H} of frame t
    n_seen: jnp.ndarray  # (N,) per-slot frames consumed
    reverb_hist: object  # synths.ReverbLiveState frequency-delay line, (N, ...)


def multistream_init(conf: Config, n_streams: int) -> MultiStreamState:
    return MultiStreamState(
        feat=feature_stream_init(conf, batch=n_streams),
        hidden=jnp.zeros(
            (conf.decoder_gru_layers, n_streams, conf.decoder_gru_units)
        ),
        phase=jnp.zeros((n_streams,)),
        prev=_zero_controls(conf, n_streams),
        cur=_zero_controls(conf, n_streams),
        pending={"H": jnp.zeros((n_streams, 1, conf.n_noise_filters))},
        n_seen=jnp.zeros((n_streams,), jnp.int32),
        reverb_hist=reverb_live_init(conf, n_streams, conf.hop_length),
    )


def _slot_noise(
    key: jax.Array, offsets: jnp.ndarray, block_size: int, dtype
) -> jnp.ndarray:
    """(N,) per-slot absolute frame indices -> (N, 1, block) uniform noise.

    Row ``i`` evaluates :func:`ops.fir.frame_noise` for a lone batch-1
    stream keyed ``fold_in(key, i)`` at absolute frame ``offsets[i]`` --
    delegated to frame_noise itself so a slot's noise sequence is
    bit-identical to an independent stream by construction, whatever the
    generator's internals.
    """
    from ddsp_tpu.ops.fir import frame_noise

    n = offsets.shape[0]
    slot_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
    drawn = jax.vmap(
        lambda k, off: frame_noise(k, 1, 1, block_size, off, dtype)
    )(slot_keys, offsets)  # (N, 1, 1, block)
    return drawn[:, 0]  # (N, 1, block)


def _where_rows(mask: jnp.ndarray, new: MultiStreamState, old: MultiStreamState) -> MultiStreamState:
    """Per-slot select: rows where ``mask`` take ``new``, others keep ``old``.

    The slot axis leads every leaf except ``hidden``'s (layers, N, H).
    """
    n = mask.shape[0]

    def rows(o, nw, axis):
        shape = [1] * o.ndim
        shape[axis] = n
        return jnp.where(mask.reshape(shape), nw, o)

    return MultiStreamState(
        feat=FeatureStreamState(buffer=rows(old.feat.buffer, new.feat.buffer, 0)),
        hidden=rows(old.hidden, new.hidden, 1),
        phase=rows(old.phase, new.phase, 0),
        prev=jax.tree_util.tree_map(lambda o, nw: rows(o, nw, 0), old.prev, new.prev),
        cur=jax.tree_util.tree_map(lambda o, nw: rows(o, nw, 0), old.cur, new.cur),
        pending=jax.tree_util.tree_map(
            lambda o, nw: rows(o, nw, 0), old.pending, new.pending
        ),
        n_seen=rows(old.n_seen, new.n_seen, 0),
        reverb_hist=jax.tree_util.tree_map(
            lambda o, nw: rows(o, nw, 0), old.reverb_hist, new.reverb_hist
        ),
    )


def make_multistream_step(
    params: Dict,
    crepe_params: Dict,
    conf: Config,
    noise_key: jax.Array,
    masked: bool = False,
):
    """Jitted (state, blocks (N, hop)) -> (out_blocks (N, hop), state).

    Mirrors the single-stream pipeline (runtime/streaming.py: one feature
    frame per hop, one-frame render lookahead, zeros while each slot's
    pipeline fills) with every per-slot condition vectorized over rows.

    With ``masked=True`` the signature becomes (state, blocks, active) where
    ``active`` is an (N,) bool mask: all slots are stepped on device but only
    active rows commit to the returned state -- inactive slots are frozen
    exactly (their output rows are garbage and must be ignored).  This is
    the serving-host building block: asynchronous clients step their slots
    only when they have delivered a block, in whatever batches happen to be
    pending, and each slot's sequence stays bit-identical to an independent
    lockstep stream (tests/test_server.py).
    """
    feat_step = make_feature_stream_step(crepe_params, conf)
    # Fixed params for the step's lifetime -> precompute the reverb IR
    # partition spectra once instead of P DFT matmuls per hop.
    from ddsp_tpu.models.synths import reverb_ir_spectra

    ir_spec = reverb_ir_spectra(params["reverb"], conf, conf.hop_length)

    def step(state: MultiStreamState, blocks: jnp.ndarray):
        frame, feat = feat_step(state.feat, blocks)
        controls, hidden = controller_apply(
            params["controller"], frame, hidden=state.hidden
        )
        new_ctrl = {k: controls[k] for k in ("f0", "c", "a")}

        first = state.n_seen == 0  # (N,) slot pipelines filling
        snap = lambda old, new: jax.tree_util.tree_map(  # noqa: E731
            lambda o, n: jnp.where(first[:, None, None], n, o), old, new
        )
        prev_r = snap(state.prev, new_ctrl)
        cur_r = snap(state.cur, new_ctrl)

        cat = lambda k: jnp.concatenate(  # noqa: E731
            [prev_r[k], cur_r[k], new_ctrl[k]], axis=1
        )
        harm, phase = render_hop_rows(
            cat("f0"), cat("c"), cat("a"),
            sample_rate=conf.sample_rate,
            hop=conf.hop_length,
            initial_phase=state.phase,
            impl=osc_impl_name(conf),
        )
        offsets = jnp.maximum(state.n_seen - 1, 0)
        noise_frames = _slot_noise(
            noise_key, offsets, conf.hop_length, harm.dtype
        )
        noise = convolve_designed_fir(state.pending["H"], noise_frames)
        dry = harm + noise
        wet, hist = reverb_live(
            params["reverb"], state.reverb_hist, dry, conf, ir_spec=ir_spec
        )

        have_output = state.n_seen >= 1  # (N,)
        row = have_output[:, None]
        out = jnp.where(row, wet, jnp.zeros_like(wet))
        new_state = MultiStreamState(
            feat=feat,
            hidden=hidden,
            phase=jnp.where(have_output, phase, state.phase),
            prev=cur_r,
            cur=new_ctrl,
            pending={"H": controls["H"]},
            n_seen=state.n_seen + 1,
            reverb_hist=jax.tree_util.tree_map(
                lambda h, o: jnp.where(
                    have_output.reshape((-1,) + (1,) * (h.ndim - 1)), h, o
                ),
                hist,
                state.reverb_hist,
            ),
        )
        return out, new_state

    if not masked:
        return jax.jit(step)

    @jax.jit
    def step_masked(
        state: MultiStreamState, blocks: jnp.ndarray, active: jnp.ndarray
    ):
        out, new_state = step(state, blocks)
        return out, _where_rows(active, new_state, state)

    return step_masked


def make_multistream_flush(
    params: Dict, conf: Config, noise_key: jax.Array
):
    """Jitted state -> (tail_blocks (N, hop), state): render every slot's
    final buffered frame with right-edge clamp (single-stream flush
    semantics, runtime/streaming.make_synth_stream_flush)."""
    from ddsp_tpu.models.synths import reverb_ir_spectra

    ir_spec = reverb_ir_spectra(params["reverb"], conf, conf.hop_length)

    @jax.jit
    def flush(state: MultiStreamState):
        cat = lambda k: jnp.concatenate(  # noqa: E731
            [state.prev[k], state.cur[k], state.cur[k]], axis=1
        )
        harm, phase = render_hop_rows(
            cat("f0"), cat("c"), cat("a"),
            sample_rate=conf.sample_rate,
            hop=conf.hop_length,
            initial_phase=state.phase,
            impl=osc_impl_name(conf),
        )
        offsets = jnp.maximum(state.n_seen - 1, 0)
        noise_frames = _slot_noise(
            noise_key, offsets, conf.hop_length, harm.dtype
        )
        noise = convolve_designed_fir(state.pending["H"], noise_frames)
        dry = harm + noise
        wet, hist = reverb_live(
            params["reverb"], state.reverb_hist, dry, conf, ir_spec=ir_spec
        )
        return wet, state._replace(phase=phase, reverb_hist=hist)

    return flush


def reset_slots(
    conf: Config, state: MultiStreamState, slots
) -> MultiStreamState:
    """Return ``state`` with the given slot rows reset to fresh-stream
    state (a new client takes over the slot); other slots are untouched.

    ``slots``: int index, sequence of indices, or (N,) bool mask.
    """
    n = state.n_seen.shape[0]
    mask = np.zeros((n,), bool)
    mask[np.asarray(slots)] = True
    return _where_rows(jnp.asarray(mask), multistream_init(conf, n), state)


class MultiStreamServer:
    """Host-side wrapper: N block-synthesizer slots behind one device step.

    The batched analogue of runtime/streaming.BlockSynthesizer -- feed
    (N, hop) mic blocks, get (N, hop) synthesized blocks; ``reset`` a slot
    when its client disconnects and a new one joins.
    """

    def __init__(
        self,
        params: Dict,
        crepe_params: Dict,
        conf: Config,
        n_streams: int,
        noise_seed: int = 0,
    ):
        self.conf = conf
        self.n_streams = n_streams
        self.hop = conf.hop_length
        key = jax.random.PRNGKey(noise_seed)
        self._step = make_multistream_step(params, crepe_params, conf, key)
        self._flush = make_multistream_flush(params, conf, key)
        self.state = multistream_init(conf, n_streams)
        self.blocks = 0
        # warm up compilation before the first deadline-bound call
        self._step(self.state, jnp.zeros((n_streams, self.hop)))

    def process(self, blocks: np.ndarray) -> np.ndarray:
        assert blocks.shape == (self.n_streams, self.hop), blocks.shape
        out, self.state = self._step(
            self.state, jnp.asarray(blocks, jnp.float32)
        )
        self.blocks += 1
        return np.asarray(out)

    def flush(self) -> np.ndarray:
        out, self.state = self._flush(self.state)
        return np.asarray(out)

    def reset(self, slots) -> None:
        self.state = reset_slots(self.conf, self.state, slots)
