"""CREPE DeepDream: gradient ascent on audio to excite a CREPE layer.

Parity target: reference trajectory.py:18-82, which registers a forward
hook on an intermediate CREPE layer and ascends the input audio along the
gradient of the activation norm.  Functionally trivial in JAX: the
activation is just a return value (models/crepe.crepe_activation) and the
ascent loop is a jitted ``jax.grad`` step -- no hooks, no mutable state.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.models.crepe import WINDOW_SIZE, crepe_activation


def dream(
    crepe_params: Dict,
    audio: jnp.ndarray,
    layer_index: int = 2,
    iterations: int = 20,
    lr: float = 10.0,
) -> Tuple[np.ndarray, float]:
    """Gradient-ascend ||activation(layer)|| w.r.t. (B, length) audio.

    Matches the reference loop exactly (trajectory.py:49-67): the audio is
    mean/std-normalized before the loop (torch ``.std()`` is unbiased,
    ddof=1), each step adds ``lr * grad`` raw (no gradient normalization),
    and the result is un-normalized and clipped to [-1, 1].  The objective
    is the L2 norm of the first batch row's activations
    (``hook.output[0].norm()``, trajectory.py:39).

    ``layer_index`` counts conv *stages* (0-based, pad->conv->relu->BN->pool);
    the reference's default hook target ``list(net.modules())[5]`` is conv3,
    i.e. stage index 2 here (hence the default).  The conv stack is fully
    convolutional, so any length >= 1024 works -- the reference likewise
    feeds the whole file at once, not 1024-sample windows.

    Returns (dreamed audio, final activation norm).
    """
    if audio.ndim == 1:
        audio = audio[None]
    x = jnp.asarray(audio, jnp.float32)
    mean = x.mean(axis=1, keepdims=True)
    std = x.std(axis=1, keepdims=True, ddof=1)
    x = (x - mean) / std

    def objective(x):
        act = crepe_activation(crepe_params, x, layer_index)
        return jnp.linalg.norm(act[0])

    grad_fn = jax.jit(jax.value_and_grad(objective))

    value = 0.0
    for _ in range(iterations):
        value, g = grad_fn(x)
        x = x + lr * g
    out = np.clip(np.asarray(x * std + mean), -1.0, 1.0)
    return out, float(value)


def dream_file(
    crepe_params: Dict,
    in_path: str,
    out_path: str,
    layer_index: int = 2,
    iterations: int = 20,
    lr: float = 10.0,
    sample_rate: int = 16000,
) -> float:
    """File-to-file dreaming over the whole (truncated) signal at once.

    Mirrors the reference main() (trajectory.py:44-76): load at 16 kHz,
    truncate to a multiple of 2048 samples, dream, write the clipped result.
    """
    from ddsp_tpu.data.audio_io import read_wav, write_wav
    from ddsp_tpu.ops.resample import resample

    audio, sr = read_wav(in_path)
    mono = audio.mean(0) if audio.shape[0] > 1 else audio[0]
    if sr != sample_rate:
        mono = np.asarray(resample(jnp.asarray(mono), sr, sample_rate))
    mono = mono[: len(mono) - (len(mono) % 2048)]
    if len(mono) < WINDOW_SIZE:
        raise ValueError(f"{in_path}: need >= 2048 samples at {sample_rate} Hz")
    dreamed, value = dream(
        crepe_params, jnp.asarray(mono)[None], layer_index, iterations, lr
    )
    write_wav(out_path, dreamed[0], sample_rate)
    return value


def main(argv=None) -> None:
    """CLI: python -m ddsp_tpu.experiments.dream crepe.pth in.wav out.wav
    [layer] [iterations] [lr] -- the reference's trajectory.py:44-82 loop
    with its defaults (20 iterations, lr 10; layer = conv stage 2, the
    stage the reference's modules()[5] hook lands on)."""
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
        layer_index=int(args[3]) if len(args) > 3 else 2,
        iterations=int(args[4]) if len(args) > 4 else 20,
        lr=float(args[5]) if len(args) > 5 else 10.0,
    )
    print(f"done: final activation norm {value:.3f}")


if __name__ == "__main__":
    main()
