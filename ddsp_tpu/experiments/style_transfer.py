"""Spectrogram style transfer (Gatys-style) on log1p-magnitude STFTs.

Parity target: reference style_transfer.py:19-165 -- a fixed random
Conv1d(channels -> 4096, kernel 17) feature extractor over spectrogram
frequency-channels, content loss = feature MSE, style loss = Gram-matrix
MSE, optimizing the content *spectrogram* directly, then Griffin-Lim
inversion.  TPU-native: the optimizer is optax L-BFGS (the reference uses
torch LBFGS) inside one jitted update, the conv is an MXU matmul, and
Griffin-Lim runs on the matmul-FFT layer.  All paths are parameters (the
reference hardcodes user paths, :15-16, :161).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddsp_tpu.ops.griffin_lim import griffin_lim
from ddsp_tpu.ops.spectral import frame_signal, reflect_pad
from ddsp_tpu.ops.fft import rfft_pair
from ddsp_tpu.ops.fir import hann_window


class StyleTransferConfig(NamedTuple):
    n_fft: int = 2048
    hop: int = 512
    kernel_size: int = 17
    n_features: int = 4096
    content_weight: float = 1.0  # alpha (reference style_transfer.py:121)
    style_weight: float = 1.0e13  # beta (:122; gram normalization matches)
    n_steps: int = 1000  # reference LBFGS max_iter (:124)
    # LBFGS step scale (the reference's film_ui exposes lr, LBFGS(lr=1),
    # style_transfer.py:124).  0 = optax's zoom linesearch (adaptive step,
    # the validated default); > 0 = fixed step like torch LBFGS(lr=...).
    learning_rate: float = 0.0
    # Griffin-Lim iterations for the inversion.  The reference runs 5000
    # (style_transfer.py:149-154); measured on the matmul-FFT GL
    # (scripts/gl_quality_curve.py, docs/PERFORMANCE.md round 4), quality
    # plateaus by 512: spectral convergence 0.05922 @512 vs 0.05912 @5000
    # (64 iters sits 35% off plateau).  512 matches the reference's
    # inversion quality at 1/10th the iterations.
    gl_iters: int = 512
    sample_rate: int = 44100


def log_spectrogram(audio: jnp.ndarray, conf: StyleTransferConfig) -> jnp.ndarray:
    """log1p |STFT| feature map, (channels=bins, frames).

    Matches the reference's ``np.log1p(np.abs(librosa.stft(...)))``
    (style_transfer.py:28-36).
    """
    x = reflect_pad(audio, conf.n_fft // 2)
    frames = frame_signal(x, conf.n_fft, conf.hop) * hann_window(conf.n_fft)
    re, im = rfft_pair(frames)
    mag = jnp.sqrt(re * re + im * im)
    return jnp.log1p(mag).T  # (bins, frames)


def extractor_init(key: jax.Array, n_channels: int, conf: StyleTransferConfig) -> Dict:
    """Fixed random conv weights (never trained), reference :68-81."""
    std = np.sqrt(2.0 / (n_channels * conf.kernel_size))
    w = std * jax.random.normal(
        key, (conf.n_features, n_channels, conf.kernel_size)
    )
    return {"weight": w}


def extract_features(extractor: Dict, spec: jnp.ndarray) -> jnp.ndarray:
    """(channels, frames) -> (n_features, frames') ReLU conv features."""
    out = jax.lax.conv_general_dilated(
        spec[None],
        extractor["weight"],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[0]
    return jax.nn.relu(out)


def gram_matrix(features: jnp.ndarray) -> jnp.ndarray:
    """Normalized feature covariance (reference :49-57)."""
    c, t = features.shape
    return (features @ features.T) / (c * t)


def style_transfer_spec(
    content_spec: jnp.ndarray,
    style_spec: jnp.ndarray,
    conf: StyleTransferConfig,
    key: Optional[jax.Array] = None,
    log_every: int = 0,
) -> Tuple[jnp.ndarray, Dict[str, float]]:
    """Optimize the content spectrogram toward the style statistics.

    Returns (stylized log-spectrogram, final loss terms).
    """
    if content_spec.shape[1] < conf.kernel_size:
        raise ValueError(
            f"spectrogram has {content_spec.shape[1]} frames < kernel_size "
            f"{conf.kernel_size}; provide longer audio or a smaller kernel"
        )
    key = jax.random.PRNGKey(0) if key is None else key
    extractor = extractor_init(key, content_spec.shape[0], conf)

    content_target = extract_features(extractor, content_spec)
    style_target = gram_matrix(extract_features(extractor, style_spec))

    # Everything large travels as jit ARGUMENTS, not closure constants:
    # baked-in constants bloat the serialized HLO (and large-weight
    # closures can exceed compile-service payload limits).
    def losses(spec, ext, c_target, s_target):
        feats = extract_features(ext, spec)
        c = jnp.mean((feats - c_target) ** 2)
        s = jnp.mean((gram_matrix(feats) - s_target) ** 2)
        return conf.content_weight * c + conf.style_weight * s, (c, s)

    # Fixed-step torch semantics need the zoom linesearch DISABLED: with
    # the default linesearch chained, a learning_rate only rescales the
    # direction the linesearch then re-scales, making the knob inert.
    opt = (
        optax.lbfgs(learning_rate=conf.learning_rate, linesearch=None)
        if conf.learning_rate > 0
        else optax.lbfgs()
    )

    @jax.jit
    def step(spec, opt_state, ext, c_target, s_target):
        (loss, (c, s)), grads = jax.value_and_grad(losses, has_aux=True)(
            spec, ext, c_target, s_target
        )
        updates, opt_state = opt.update(
            grads, opt_state, spec, value=loss, grad=grads,
            value_fn=lambda x: losses(x, ext, c_target, s_target)[0],
        )
        return optax.apply_updates(spec, updates), opt_state, loss, c, s

    spec = content_spec
    opt_state = opt.init(spec)
    loss = c = s = jnp.nan
    for i in range(conf.n_steps):
        spec, opt_state, loss, c, s = step(
            spec, opt_state, extractor, content_target, style_target
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i+1}: loss {float(loss):.5f} content {float(c):.5f} style {float(s):.7f}")
    return spec, {
        "loss": float(loss),
        "content": float(c),
        "style": float(s),
    }


def style_transfer_audio(
    content_audio: jnp.ndarray,
    style_audio: jnp.ndarray,
    conf: StyleTransferConfig = StyleTransferConfig(),
    key: Optional[jax.Array] = None,
    log_every: int = 0,
) -> Tuple[np.ndarray, Dict[str, float]]:
    """End to end: audio pair -> stylized audio via Griffin-Lim inversion."""
    cs = log_spectrogram(content_audio, conf)
    ss = log_spectrogram(style_audio, conf)
    # match frame counts like the reference trim (helper.py:40-47)
    t = min(cs.shape[1], ss.shape[1])
    out_spec, metrics = style_transfer_spec(cs[:, :t], ss[:, :t], conf, key, log_every)
    mag = jnp.expm1(jnp.maximum(out_spec, 0.0)).T  # (frames, bins)
    audio = griffin_lim(
        mag, conf.n_fft, conf.hop, n_iter=conf.gl_iters,
        length=(t - 1) * conf.hop,
    )
    return np.asarray(audio), metrics


def main(argv=None) -> None:
    """CLI: python -m ddsp_tpu.experiments.style_transfer content.wav style.wav out.wav"""
    import sys

    from ddsp_tpu.data.audio_io import read_wav, write_wav

    args = sys.argv[1:] if argv is None else argv
    if len(args) < 3:
        raise SystemExit("usage: style_transfer <content.wav> <style.wav> <out.wav> [steps]")
    content, sr = read_wav(args[0])
    style, sr2 = read_wav(args[1])
    conf = StyleTransferConfig(
        sample_rate=sr, n_steps=int(args[3]) if len(args) > 3 else 1000
    )
    out, metrics = style_transfer_audio(
        jnp.asarray(content.mean(0)), jnp.asarray(style.mean(0)), conf, log_every=50
    )
    write_wav(args[2], out / max(1e-6, np.abs(out).max()) * 0.9, sr)
    print("done:", metrics)


if __name__ == "__main__":
    main()
