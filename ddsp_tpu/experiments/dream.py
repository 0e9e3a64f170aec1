"""CREPE DeepDream: gradient ascent on audio to excite a CREPE layer.

Parity target: reference trajectory.py:18-82, which registers a forward
hook on an intermediate CREPE layer and ascends the input audio along the
gradient of the activation norm.  Functionally trivial in JAX: the
activation is just a return value (models/crepe.crepe_activation) and the
ascent loop is a jitted ``jax.grad`` step -- no hooks, no mutable state.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.models.crepe import WINDOW_SIZE, crepe_activation


def dream(
    crepe_params: Dict,
    audio: jnp.ndarray,
    layer_index: int = 5,
    iterations: int = 20,
    lr: float = 10.0,
    normalize_gradient: bool = True,
) -> Tuple[np.ndarray, float]:
    """Ascend ||activation(layer)|| w.r.t. (B, 1024)-windowed audio.

    Returns (dreamed audio, final activation norm).  Matches the reference
    loop (trajectory.py:55-67): grad of the L2 norm of the chosen layer's
    activations, normalized gradient steps.
    """
    if audio.ndim == 1:
        audio = audio[None]
    assert audio.shape[-1] == WINDOW_SIZE, "CREPE dreams over 1024-sample windows"

    def objective(x):
        act = crepe_activation(crepe_params, x, layer_index)
        return jnp.linalg.norm(act)

    grad_fn = jax.jit(jax.value_and_grad(objective))

    x = jnp.asarray(audio, jnp.float32)
    value = 0.0
    for _ in range(iterations):
        value, g = grad_fn(x)
        if normalize_gradient:
            g = g / (jnp.linalg.norm(g) + 1e-12)
        x = x + lr * g
    return np.asarray(x), float(value)


def dream_file(
    crepe_params: Dict,
    in_path: str,
    out_path: str,
    layer_index: int = 5,
    iterations: int = 20,
    lr: float = 10.0,
    sample_rate: int = 16000,
) -> float:
    """File-to-file dreaming over consecutive 1024-sample windows."""
    from ddsp_tpu.data.audio_io import read_wav, write_wav
    from ddsp_tpu.ops.resample import resample

    audio, sr = read_wav(in_path)
    mono = audio.mean(0) if audio.shape[0] > 1 else audio[0]
    if sr != sample_rate:
        mono = np.asarray(resample(jnp.asarray(mono), sr, sample_rate))
    n = len(mono) // WINDOW_SIZE
    windows = mono[: n * WINDOW_SIZE].reshape(n, WINDOW_SIZE)
    dreamed, value = dream(crepe_params, jnp.asarray(windows), layer_index, iterations, lr)
    out = dreamed.reshape(-1)
    write_wav(out_path, out / max(1e-6, np.abs(out).max()) * 0.9, sample_rate)
    return value


def main(argv=None) -> None:
    """CLI: python -m ddsp_tpu.experiments.dream crepe.pth in.wav out.wav
    [layer] [iterations] [lr] -- the reference's trajectory.py:44-82 loop
    with its defaults (layer 5, 20 iterations, lr 10)."""
    import sys

    from ddsp_tpu.models.crepe import load_torch_checkpoint

    args = sys.argv[1:] if argv is None else argv
    if len(args) < 3:
        raise SystemExit(
            "usage: dream <crepe.pth> <in.wav> <out.wav> [layer] [iters] [lr]"
        )
    crepe_params = load_torch_checkpoint(args[0])
    value = dream_file(
        crepe_params,
        args[1],
        args[2],
        layer_index=int(args[3]) if len(args) > 3 else 5,
        iterations=int(args[4]) if len(args) > 4 else 20,
        lr=float(args[5]) if len(args) > 5 else 10.0,
    )
    print(f"done: final activation norm {value:.3f}")


if __name__ == "__main__":
    main()
