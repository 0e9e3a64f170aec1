"""Streamlit UI for spectrogram style transfer (optional dependency).

Parity target: reference film_ui.py:1-37 + helper.py:14-116 -- sliders for
learning rate / alpha / beta / iterations / kernel / features / sample rate
/ window / hop, two file uploaders, a start button, and spectrogram
displays.  Streamlit is an optional dependency here; import this module
and call :func:`main` via ``streamlit run`` when it is installed:

    streamlit run ddsp_tpu/experiments/ui.py
"""

from __future__ import annotations

import io

import numpy as np

try:
    import streamlit as st

    HAS_STREAMLIT = True
except Exception:  # pragma: no cover - optional dependency
    st = None
    HAS_STREAMLIT = False


def spectrogram_figure(spec: np.ndarray, sample_rate: int, hop: int):
    """Log-spectrogram display figure (reference helper.py:50-65)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 3))
    extent = [0, spec.shape[1] * hop / sample_rate, 0, sample_rate / 2 / 1000]
    ax.imshow(spec, origin="lower", aspect="auto", extent=extent, cmap="magma")
    ax.set_xlabel("time [s]")
    ax.set_ylabel("freq [kHz]")
    fig.tight_layout()
    return fig


def main() -> None:  # pragma: no cover - interactive UI
    if not HAS_STREAMLIT:
        raise RuntimeError(
            "streamlit is not installed; run the CLI instead: "
            "python -m ddsp_tpu.experiments.style_transfer content.wav style.wav out.wav"
        )
    import jax.numpy as jnp

    from ddsp_tpu.data.audio_io import read_wav, write_wav
    from ddsp_tpu.experiments.style_transfer import (
        StyleTransferConfig,
        log_spectrogram,
        style_transfer_audio,
    )

    st.title("ddsp_tpu spectrogram style transfer")
    with st.sidebar:
        alpha = st.number_input("content weight (alpha)", value=1.0, format="%f")
        beta = st.number_input("style weight (beta)", value=1e6, format="%g")
        n_steps = int(st.number_input("optimizer steps", value=200, step=50))
        kernel = int(st.number_input("conv kernel size", value=17, step=2))
        n_features = int(st.number_input("conv features", value=4096, step=256))
        n_fft = int(st.selectbox("window size", [512, 1024, 2048, 4096], index=2))
        hop = int(st.number_input("hop length", value=n_fft // 4))
        gl_iters = int(st.number_input("Griffin-Lim iterations", value=64, step=16))

    content_file = st.file_uploader("content audio (wav)", type=["wav"])
    style_file = st.file_uploader("style audio (wav)", type=["wav"])

    if content_file and style_file and st.button("start"):
        import tempfile

        def load(upload):
            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                f.write(upload.read())
                f.flush()
                audio, sr = read_wav(f.name)
            return audio.mean(0) if audio.shape[0] > 1 else audio[0], sr

        content, sr = load(content_file)
        style, _ = load(style_file)
        conf = StyleTransferConfig(
            n_fft=n_fft, hop=hop, kernel_size=kernel, n_features=n_features,
            content_weight=alpha, style_weight=beta, n_steps=n_steps,
            gl_iters=gl_iters, sample_rate=sr,
        )
        st.pyplot(spectrogram_figure(
            np.asarray(log_spectrogram(jnp.asarray(content), conf)), sr, hop))
        with st.spinner("optimizing..."):
            out, metrics = style_transfer_audio(
                jnp.asarray(content), jnp.asarray(style), conf
            )
        st.write(metrics)
        st.pyplot(spectrogram_figure(
            np.asarray(log_spectrogram(jnp.asarray(out), conf)), sr, hop))
        buf = io.BytesIO()
        import tempfile as _tf

        with _tf.NamedTemporaryFile(suffix=".wav") as f:
            write_wav(f.name, out / max(1e-6, np.abs(out).max()) * 0.9, sr)
            buf.write(open(f.name, "rb").read())
        st.audio(buf.getvalue(), format="audio/wav")


if __name__ == "__main__":
    main()
