"""Streaming runtime: block-based synthesis with explicit state pytrees.

Parity target: the reference real-time path (reference: rt/synth.py:40-56,
model/autoencoder/decoder.py:139-147, harmonic_oscillator.py:64-75,
reverb.py:40-49), redesigned to fix its documented defects (SURVEY.md
sections 2, 5):

* state is an explicit pytree threaded through pure jitted functions -- no
  module buffers mutated from the audio thread (thread-safe by construction);
* the GRU hidden state actually advances (the reference returns the stale
  state, decoder.py:106-107);
* every feature frame drives the GRU exactly once (the reference re-feeds a
  4-frame window every block, advancing the GRU at 4x frame rate);
* the synthesis path is *bit-identical* to the offline renderer: the
  oscillator renders hop t only once frame t+1 is known (one hop of
  lookahead = 11.6 ms at the default hop), noise RNG is keyed by absolute
  frame index, and the reverb keeps a full-IR history window.
"""

from __future__ import annotations

import time
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import controller_apply
from ddsp_tpu.models.crepe import crepe_forward, pitch_argmax
from ddsp_tpu.models.synths import reverb_live, reverb_live_init
from ddsp_tpu.ops.fir import filtered_noise
from ddsp_tpu.ops.oscillator import render_hop_rows
from ddsp_tpu.ops.resample import resample, resample_length
from ddsp_tpu.ops.spectral import a_weighted_loudness


class SynthStreamState(NamedTuple):
    hidden: jnp.ndarray  # (layers, B, H) GRU state
    phase: jnp.ndarray  # (B,) fundamental phase, cycles
    prev: Dict[str, jnp.ndarray]  # controls of frame t-1 {f0, c, a}
    cur: Dict[str, jnp.ndarray]  # controls of frame t (not yet rendered)
    pending: Dict[str, jnp.ndarray]  # noise mags {H} of frame t
    n_seen: jnp.ndarray  # frames consumed so far (int32)
    reverb_hist: object  # synths.ReverbLiveState frequency-delay line


def _zero_controls(conf: Config, batch: int) -> Dict[str, jnp.ndarray]:
    return {
        "f0": jnp.zeros((batch, 1, 1)),
        "c": jnp.full((batch, 1, conf.n_harmonics), 1.0 / conf.n_harmonics),
        "a": jnp.zeros((batch, 1, 1)),
    }


def synth_stream_init(conf: Config, batch: int = 1) -> SynthStreamState:
    return SynthStreamState(
        hidden=jnp.zeros((conf.decoder_gru_layers, batch, conf.decoder_gru_units)),
        phase=jnp.zeros((batch,)),
        prev=_zero_controls(conf, batch),
        cur=_zero_controls(conf, batch),
        pending={"H": jnp.zeros((batch, 1, conf.n_noise_filters))},
        n_seen=jnp.zeros((), jnp.int32),
        reverb_hist=reverb_live_init(conf, batch, conf.hop_length),
    )


def _render_hop(
    params: Dict,
    state: SynthStreamState,
    next_ctrl: Dict[str, jnp.ndarray],
    conf: Config,
    noise_key: jax.Array,
    ir_spec=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render the hop of state.cur with (prev, cur, next) context."""
    cat = lambda k: jnp.concatenate(
        [state.prev[k], state.cur[k], next_ctrl[k]], axis=1
    )
    from ddsp_tpu.models.synths import osc_impl_name

    harm, phase = render_hop_rows(
        cat("f0"), cat("c"), cat("a"),
        sample_rate=conf.sample_rate,
        hop=conf.hop_length,
        initial_phase=state.phase,
        impl=osc_impl_name(conf),
    )
    noise = filtered_noise(
        state.pending["H"], noise_key, conf.hop_length,
        frame_offset=state.n_seen - 1,
    )
    dry = harm + noise
    wet, hist = reverb_live(
        params["reverb"], state.reverb_hist, dry, conf, ir_spec=ir_spec
    )
    return wet, phase, hist


def make_synth_stream_step(params: Dict, conf: Config, noise_key: jax.Array):
    """Jitted (state, feature_frame) -> (audio_block, state).

    ``feature_frame``: {'f0', 'normalized_cents', 'loudness'} of shape
    (B, 1, .) -- ONE new frame.  Returns the hop of the *previous* frame
    (zeros for the first two calls while the pipeline fills).

    Params are fixed for the step's lifetime, so the reverb IR partition
    spectra are precomputed once here rather than per hop (synths.
    reverb_ir_spectra).
    """
    from ddsp_tpu.models.synths import reverb_ir_spectra

    ir_spec = reverb_ir_spectra(params["reverb"], conf, conf.hop_length)

    @jax.jit
    def step(state: SynthStreamState, frame: Dict[str, jnp.ndarray]):
        controls, hidden = controller_apply(
            params["controller"], frame, hidden=state.hidden
        )
        new_ctrl = {k: controls[k] for k in ("f0", "c", "a")}
        first = state.n_seen == 0
        # while filling (first frame): prev/cur snap to the incoming frame
        snap = lambda old, new: jax.tree_util.tree_map(
            lambda o, n: jnp.where(first, n, o), old, new
        )
        prev_for_render = snap(state.prev, new_ctrl)
        cur_for_render = snap(state.cur, new_ctrl)
        render_state = state._replace(prev=prev_for_render, cur=cur_for_render)

        wet, phase, hist = _render_hop(
            params, render_state, new_ctrl, conf, noise_key, ir_spec=ir_spec
        )
        have_output = state.n_seen >= 1
        block = jnp.where(have_output, wet, jnp.zeros_like(wet))
        new_state = SynthStreamState(
            hidden=hidden,
            phase=jnp.where(have_output, phase, state.phase),
            prev=cur_for_render,
            cur=new_ctrl,
            pending={"H": controls["H"]},
            n_seen=state.n_seen + 1,
            reverb_hist=jax.tree_util.tree_map(
                lambda h, o: jnp.where(have_output, h, o),
                hist,
                state.reverb_hist,
            ),
        )
        return block, new_state

    return step


def make_synth_stream_flush(params: Dict, conf: Config, noise_key: jax.Array):
    """Render the final buffered frame with right-edge clamp (offline parity)."""
    from ddsp_tpu.models.synths import reverb_ir_spectra

    ir_spec = reverb_ir_spectra(params["reverb"], conf, conf.hop_length)

    @jax.jit
    def flush(state: SynthStreamState):
        wet, phase, hist = _render_hop(
            params, state, state.cur, conf, noise_key, ir_spec=ir_spec
        )
        return wet, state._replace(phase=phase, reverb_hist=hist)

    return flush


# --- feature streaming -------------------------------------------------------
class FeatureStreamState(NamedTuple):
    buffer: jnp.ndarray  # (B, window) rolling input samples


def feature_stream_init(conf: Config, batch: int = 1, window: int = 4096) -> FeatureStreamState:
    return FeatureStreamState(buffer=jnp.zeros((batch, window)))


def make_feature_stream_step(crepe_params: Dict, conf: Config):
    """Jitted (state, audio_hop (B, hop)) -> (feature_frame, state).

    Computes the newest frame's loudness (rectangular STFT frame over the
    last n_fft samples) and CREPE f0 (last 1024 resampled samples), mirroring
    the reference's per-callback analysis (rt/synth.py:44-51) but emitting
    exactly one frame per hop.
    """
    crepe_win_orig = int(np.ceil(conf.crepe_window * conf.sample_rate / conf.crepe_sample_rate)) + 64

    @jax.jit
    def step(state: FeatureStreamState, audio_hop: jnp.ndarray):
        buf = jnp.concatenate([state.buffer[:, audio_hop.shape[-1] :], audio_hop], axis=-1)
        loud = a_weighted_loudness(
            buf[:, -conf.n_fft :], conf.n_fft, conf.hop_length, conf.sample_rate
        )  # (B, 1, 1): exactly one frame fits the window
        tail = buf[:, -crepe_win_orig:]
        rs = resample(tail, conf.sample_rate, conf.crepe_sample_rate)
        window = rs[:, -conf.crepe_window :]
        mean = jnp.mean(window, axis=-1, keepdims=True)
        std = jnp.std(window, axis=-1, keepdims=True, ddof=1) + 1e-8
        probs = crepe_forward(
            crepe_params,
            (window - mean) / std,
            layout=getattr(conf, "crepe_layout", "nlc"),
        )
        freq, harmonicity, normalized_cents = pitch_argmax(probs[:, None, :])
        frame = {
            "f0": freq,
            "normalized_cents": normalized_cents,
            "loudness": loud,
        }
        return frame, FeatureStreamState(buffer=buf)

    return step


# --- host-side block synthesizer --------------------------------------------
class BlockSynthesizer:
    """Mic block in -> synthesized block out, with deadline tracking.

    Host-side convenience wrapper composing the feature streamer and the
    synth streamer; the analogue of the reference's JACK process callback
    (rt/synth.py:40-56) minus the JACK dependency (see runtime/jack_io.py).
    """

    def __init__(
        self,
        params: Dict,
        crepe_params: Dict,
        conf: Config,
        noise_seed: int = 0,
    ):
        self.conf = conf
        self.hop = conf.hop_length
        key = jax.random.PRNGKey(noise_seed)
        self._feat_step = make_feature_stream_step(crepe_params, conf)
        self._synth_step = make_synth_stream_step(params, conf, key)
        self._synth_flush = make_synth_stream_flush(params, conf, key)
        self._feat_state = feature_stream_init(conf)
        self._synth_state = synth_stream_init(conf)
        self.missed_deadlines = 0
        self.blocks = 0
        # warm up compilation so the first RT callback doesn't stall
        silence = jnp.zeros((1, self.hop))
        f, fs = self._feat_step(self._feat_state, silence)
        self._synth_step(self._synth_state, f)

    def process(self, block: np.ndarray) -> np.ndarray:
        """One hop of input samples -> one hop of output samples."""
        assert block.shape[-1] == self.hop, (block.shape, self.hop)
        t0 = time.perf_counter()
        frame, self._feat_state = self._feat_step(
            self._feat_state, jnp.asarray(block, jnp.float32).reshape(1, -1)
        )
        out, self._synth_state = self._synth_step(self._synth_state, frame)
        out = np.asarray(out)[0]
        self.blocks += 1
        if time.perf_counter() - t0 >= self.hop / self.conf.sample_rate:
            self.missed_deadlines += 1
        return out

    def flush(self) -> np.ndarray:
        """Render the final buffered frame (right-edge clamp, offline parity).

        The step path runs one frame behind its input (frame t renders only
        once frame t+1 is known, so interpolation context is exact); at
        stream end the last consumed frame is still pending.  Call this once
        after the final ``process`` to emit that tail hop -- without it the
        render is one hop short (the reference's RT loop just drops it,
        rt/synth.py:44-56).  Compilation is not pre-warmed: flushing happens
        after the deadline-bound callback stream has ended.
        """
        out, self._synth_state = self._synth_flush(self._synth_state)
        return np.asarray(out)[0]
