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

from typing import NamedTuple, Optional, Tuple

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
    """Convolve (B, L) audio with the learned IR (reference reverb.py:31-38).

    The forward convolution runs at full DFT precision; the backward
    convolutions run at ``conf.reverb_grad_matmul_dtype`` through the
    transpose VJP in ops/fir.fft_convolve (default bfloat16: round 4
    measured bf16 a wash because the old CT path was data-movement-bound;
    the round-5 permuted-spectrum CT removed that movement and bf16 wins
    0.969 vs 1.067 ms -- docs/PERFORMANCE.md.  'float32' = exact
    autodiff, pinned by the gradient-parity tests).
    """
    impulse = reverb_impulse(params, conf)
    return fft_convolve(
        x,
        impulse[None, :],
        kernel_len=impulse.shape[-1],
        grad_matmul_dtype=getattr(conf, "reverb_grad_matmul_dtype", None),
    )


class ReverbLiveState(NamedTuple):
    """Frequency-delay line for streaming reverb.

    ``spec_re``/``spec_im``: (B, P, block+1) rDFT spectra of the last P
    overlap-save windows, newest at partition index 0 (the ring advances
    by a roll, so per-slot freeze/reset semantics in the multi-stream
    runtime work row-wise with no position bookkeeping).  ``prev``:
    (B, block) previous dry block (the left half of the next window).
    """

    spec_re: jnp.ndarray
    spec_im: jnp.ndarray
    prev: jnp.ndarray


def reverb_partitions(conf: Config, block: int) -> int:
    """Number of block-sized IR partitions covering the learned IR."""
    return -(-conf.ir_length // block)


def reverb_live_init(conf: Config, batch: int, block: int) -> ReverbLiveState:
    p = reverb_partitions(conf, block)
    return ReverbLiveState(
        spec_re=jnp.zeros((batch, p, block + 1)),
        spec_im=jnp.zeros((batch, p, block + 1)),
        prev=jnp.zeros((batch, block)),
    )


def reverb_ir_spectra(
    params: dict, conf: Config, block: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute the (P, block+1) rDFT spectra of the IR's partitions.

    Serving steps render with *fixed* reverb params, so the partition
    spectra are loop-invariant; computing them once at step-build time and
    passing them to :func:`reverb_live` saves P block-sized DFT matmuls per
    hop (round-3 ADVICE).  Training paths (where the IR is learned) keep
    the default recompute-from-params behavior.
    """
    from ddsp_tpu.ops.fft import rfft_pair

    p = reverb_partitions(conf, block)
    impulse = reverb_impulse(params, conf)  # (ir,)
    hpad = jnp.pad(impulse, (0, p * block - impulse.shape[-1]))
    return rfft_pair(hpad.reshape(p, block), 2 * block)


def reverb_live(
    params: dict,
    state: ReverbLiveState,
    x: jnp.ndarray,
    conf: Config,
    ir_spec: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, ReverbLiveState]:
    """Streaming reverb by partitioned (frequency-delay-line) convolution.

    The round-2 implementation re-convolved a full (ir + block) window
    every hop; at 256 serving slots that one stage cost 5.7 of the 6.8 ms
    step (docs/PERFORMANCE.md round-3 profile).  Here the IR is split into
    P = ceil(ir/block) block partitions whose 2*block rDFT spectra
    multiply the stored spectra of the last P dry windows (overlap-save:
    window j = [dry block j-1, dry block j], keep the last ``block``
    inverse outputs) -- mathematically exact by linearity, one small
    FFT pair per hop instead of an ir-sized convolution, and the spectral
    MAC runs as an exact elementwise multiply + f32 sum over partitions.

    Unlike the reference's rolling buffer (reverb.py:40-49, which loses
    tail terms), the P-deep delay line carries the IR's full memory:
    block output == offline output (tests/test_synths.py).

    Args:
      state: :func:`reverb_live_init` pytree (zeros at stream start).
      x: (B, block) current dry block; ``block`` must match the state's.

    Returns:
      (wet block (B, block), advanced state).
    """
    from ddsp_tpu.ops.fft import irfft_pair, rfft_pair

    block = x.shape[-1]
    if state.prev.shape[-1] != block:
        raise ValueError(
            f"block {block} does not match the reverb stream state's "
            f"{state.prev.shape[-1]}; build the state with reverb_live_init"
        )
    nfft = 2 * block
    hr, hi = (
        ir_spec
        if ir_spec is not None
        else reverb_ir_spectra(params, conf, block)
    )  # (P, block+1)

    window = jnp.concatenate([state.prev, x], axis=-1)  # (B, 2*block)
    xr, xi = rfft_pair(window, nfft)  # (B, block+1)
    spec_re = jnp.concatenate([xr[:, None], state.spec_re[:, :-1]], axis=1)
    spec_im = jnp.concatenate([xi[:, None], state.spec_im[:, :-1]], axis=1)

    # Complex MAC over partitions, elementwise on the VPU (exact f32 sums;
    # the operands are tiny next to the FFT matmuls).
    acc_re = jnp.sum(spec_re * hr - spec_im * hi, axis=1)
    acc_im = jnp.sum(spec_re * hi + spec_im * hr, axis=1)
    wet = irfft_pair(acc_re, acc_im, nfft)[..., block:]
    return wet, ReverbLiveState(spec_re, spec_im, x)
