"""Synthesizer modules: oscillator bank, filtered noise, learned reverb.

Functional modules ``(params, controls, state) -> (audio, state)`` wrapping
the pure ops in ddsp_tpu/ops.  Parity targets:

* OscillatorBank  (reference: model/ddsp/harmonic_oscillator.py:7-75)
* FilteredNoise   (reference: model/ddsp/filtered_noise.py:35-53)
* Reverb          (reference: model/ddsp/reverb.py:8-49)

The streaming paths thread explicit state pytrees instead of mutating module
buffers, which fixes the reference's RT thread-safety hazards and makes
block-based rendering bit-identical to offline rendering (see runtime/).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.ops.fir import fft_convolve, filtered_noise
from ddsp_tpu.ops.oscillator import oscillator_bank, render_padded


# --- oscillator bank ---------------------------------------------------------
def use_pallas_oscillator(conf: Config) -> bool:
    """'auto' picks the fused Pallas kernel on TPU, XLA elsewhere."""
    if conf.osc_impl == "pallas":
        return True
    if conf.osc_impl == "xla":
        return False
    return jax.default_backend() == "tpu"


def osc_impl_name(conf: Config) -> str:
    """Resolved oscillator implementation ('pallas' | 'xla') for
    ops.oscillator.render_padded's ``impl`` argument -- the sharded render
    paths (parallel/) dispatch through this so ``conf.osc_impl`` is honored
    inside shard_map too."""
    return "pallas" if use_pallas_oscillator(conf) else "xla"


def oscillator_apply(
    controls: dict,
    conf: Config,
    initial_phase: Optional[jnp.ndarray] = None,
    frame_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Offline harmonic render from a controls dict {f0, c, a}.

    Returns (audio (B, T*hop), final fundamental phase (B,)).  Dispatches
    between the XLA einsum path and the fused Pallas sine-bank kernel
    (ops/pallas/oscillator.py, ~4x faster per chip) per ``conf.osc_impl``.
    """
    if use_pallas_oscillator(conf) and frame_chunk is None:
        from ddsp_tpu.ops.pallas.oscillator import oscillator_bank_pallas

        return oscillator_bank_pallas(
            controls["f0"],
            controls["c"],
            controls["a"],
            sample_rate=conf.sample_rate,
            hop=conf.hop_length,
            initial_phase=initial_phase,
        )
    return oscillator_bank(
        controls["f0"],
        controls["c"],
        controls["a"],
        sample_rate=conf.sample_rate,
        hop=conf.hop_length,
        initial_phase=initial_phase,
        frame_chunk=frame_chunk,
    )


def oscillator_live(
    controls: dict,
    conf: Config,
    phase: jnp.ndarray,
    context: Optional[dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming harmonic render carrying fundamental phase across blocks.

    ``context`` optionally holds {f0, c, a} for the frame before / after the
    block (keys 'prev', 'next'), enabling exact cross-block interpolation;
    without it the block edges are clamped like the reference live() path
    (harmonic_oscillator.py:64-75).
    """
    pad = lambda x, p, n: jnp.concatenate([p, x, n], axis=1)
    if context is None:
        from ddsp_tpu.ops.interp import edge_pad_frames

        f0p = edge_pad_frames(controls["f0"])
        cp = edge_pad_frames(controls["c"])
        ap = edge_pad_frames(controls["a"])
    else:
        f0p = pad(controls["f0"], context["prev"]["f0"], context["next"]["f0"])
        cp = pad(controls["c"], context["prev"]["c"], context["next"]["c"])
        ap = pad(controls["a"], context["prev"]["a"], context["next"]["a"])
    return render_padded(
        f0p, cp, ap,
        sample_rate=conf.sample_rate,
        hop=conf.hop_length,
        initial_phase=phase,
    )


# --- filtered noise ----------------------------------------------------------
def noise_apply(
    controls: dict, conf: Config, key: jax.Array, frame_offset=0
) -> jnp.ndarray:
    """Filtered-noise branch from controls dict {H}; (B, T*hop) audio."""
    return filtered_noise(controls["H"], key, conf.hop_length, frame_offset)


# --- learned reverb ----------------------------------------------------------
def reverb_init(key: jax.Array, conf: Config, initial_wet: float = 0.0,
                initial_decay: float = 5.0) -> dict:
    """Trainable 1 s impulse response parameters (reference reverb.py:8-22)."""
    length = conf.ir_length
    return {
        "noise": jax.random.uniform(key, (length,), jnp.float32, -1.0, 1.0),
        "decay": jnp.asarray(float(initial_decay)),
        "wet": jnp.asarray(float(initial_wet)),
    }


def reverb_impulse(params: dict, conf: Config) -> jnp.ndarray:
    """Decaying learned IR with unit dry path (reference reverb.py:24-29)."""
    length = conf.ir_length
    t = jnp.arange(length, dtype=jnp.float32) / conf.sample_rate
    envelope = jnp.exp(-jax.nn.softplus(-params["decay"]) * t * 500.0)
    impulse = params["noise"] * envelope * jax.nn.sigmoid(params["wet"])
    return impulse.at[0].set(1.0)


def reverb_apply(params: dict, x: jnp.ndarray, conf: Config) -> jnp.ndarray:
    """Convolve (B, L) audio with the learned IR (reference reverb.py:31-38)."""
    impulse = reverb_impulse(params, conf)
    return fft_convolve(x, impulse[None, :], kernel_len=impulse.shape[-1])


def reverb_live(
    params: dict, history: jnp.ndarray, x: jnp.ndarray, conf: Config
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming reverb with full IR memory.

    Args:
      history: (B, ir_length) past dry samples (zeros at stream start).
      x: (B, block) current dry block.

    Returns:
      (wet block (B, block), new history).  Unlike the reference's rolling
    buffer (reverb.py:40-49, which loses tail terms), keeping `ir_length`
    samples of *pre-block* history makes block output == offline output.
    """
    block = x.shape[-1]
    window = jnp.concatenate([history, x], axis=-1)  # (B, ir + block)
    impulse = reverb_impulse(params, conf)
    wet = fft_convolve(window, impulse[None, :], kernel_len=impulse.shape[-1])[
        ..., -block:
    ]
    new_history = window[..., -history.shape[-1] :]
    return wet, new_history
