"""Frame-rate -> audio-rate linear upsampling.

Behavioral parity target: the reference upsamples frame-rate control signals
by ``hop_length`` with ``F.interpolate(mode='linear', align_corners=False)``
(reference: model/ddsp/harmonic_oscillator.py:52-55).  This module reproduces
those exact semantics as a pure JAX function, plus exposes the per-hop
interpolation weight decomposition used by the TPU-native oscillator to avoid
materializing audio-rate control tensors (see ops/oscillator.py).

align_corners=False semantics for integer scale ``s``: output sample
``i = t*s + j`` reads the source at coordinate ``src = t + (j + 0.5)/s - 0.5``
clamped to ``[0, T-1]``, i.e. each hop ``t`` mixes frames ``t-1, t, t+1`` with
fixed weights depending only on ``j``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def hop_weights(hop: int) -> np.ndarray:
    """(hop, 3) weights w[j] over frames (t-1, t, t+1) for sample t*hop + j.

    For j < hop/2 the source coordinate falls in [t-1, t]; for j >= hop/2 in
    [t, t+1].  Boundary clamping is handled by the caller via edge-padding the
    frame sequence.
    """
    j = np.arange(hop, dtype=np.float64)
    u = (j + 0.5) / hop  # in (0, 1)
    w = np.zeros((hop, 3), dtype=np.float64)
    lo = u < 0.5
    # src = (t-1) + (u + 0.5): weight on t-1 is (0.5 - u), on t is (0.5 + u)
    w[lo, 0] = 0.5 - u[lo]
    w[lo, 1] = 0.5 + u[lo]
    # src = t + (u - 0.5): weight on t is (1.5 - u), on t+1 is (u - 0.5)
    w[~lo, 1] = 1.5 - u[~lo]
    w[~lo, 2] = u[~lo] - 0.5
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def hop_weight_cumsum(hop: int) -> np.ndarray:
    """(hop, 3) inclusive prefix sums of :func:`hop_weights` along j.

    Row j gives the contribution of frames (t-1, t, t+1) to the partial sum
    ``sum_{j'<=j} x_up[t*hop + j']`` of the upsampled signal within hop t.
    Used for the closed-form oscillator phase accumulation.
    """
    return np.cumsum(hop_weights(hop), axis=0).astype(np.float32)


def edge_pad_frames(x: jnp.ndarray) -> jnp.ndarray:
    """Replicate one frame of context on each side of the time axis (axis=1).

    The single home of the interpolation edge-clamp convention (shared by
    the oscillator render paths, TP sharding, and streaming)."""
    return jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)



def upsample_linear(x: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Linearly upsample frame-rate controls to audio rate.

    Args:
      x: (B, T, C) frame-rate signal.
      hop: integer upsampling factor.

    Returns:
      (B, T*hop, C) audio-rate signal, bit-matching
      ``F.interpolate(x.permute(0,2,1), scale_factor=hop, mode='linear')``
      of the reference (model/ddsp/harmonic_oscillator.py:52-55).
    """
    b, t, c = x.shape
    xp = edge_pad_frames(x)  # (B, T+2, C)
    w = jnp.asarray(hop_weights(hop))  # (hop, 3)
    # windows[:, t] = frames (t-1, t, t+1) -> stack 3 shifted views
    left = xp[:, :-2]  # frame t-1  (B, T, C)
    mid = xp[:, 1:-1]  # frame t
    right = xp[:, 2:]  # frame t+1
    # out[b, t, j, c] = sum_k w[j, k] * win_k[b, t, c]
    out = (
        left[:, :, None, :] * w[None, None, :, 0, None]
        + mid[:, :, None, :] * w[None, None, :, 1, None]
        + right[:, :, None, :] * w[None, None, :, 2, None]
    )
    return out.reshape(b, t * hop, c)
