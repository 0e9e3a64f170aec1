"""Native ring buffer + PCM conversion + threaded synthesizer."""

import threading

import numpy as np
import pytest

import jax

from ddsp_tpu.native import (
    RingBuffer,
    f32_to_pcm16,
    native_available,
    pcm16_to_f32,
)


@pytest.fixture(params=["native", "python"])
def ring_mode(request):
    if request.param == "native" and not native_available():
        pytest.skip("no C++ toolchain")
    return request.param == "python"


def test_ring_basic(ring_mode):
    rb = RingBuffer(100, force_python=ring_mode)
    assert rb.capacity == 128
    assert rb.write(np.arange(10, dtype=np.float32)) == 10
    assert rb.readable() == 10
    np.testing.assert_array_equal(rb.peek(4), np.arange(4, dtype=np.float32))
    np.testing.assert_array_equal(rb.read(6), np.arange(6, dtype=np.float32))
    assert rb.readable() == 4
    np.testing.assert_array_equal(rb.read(10), np.arange(6, 10, dtype=np.float32))


def test_ring_wraparound_and_overflow(ring_mode):
    rb = RingBuffer(8, force_python=ring_mode)  # capacity 8
    assert rb.write(np.ones(6, np.float32)) == 6
    rb.read(6)
    # writes now wrap the underlying storage
    x = np.arange(8, dtype=np.float32)
    assert rb.write(x) == 8
    assert rb.write(np.ones(3, np.float32)) == 0  # full
    np.testing.assert_array_equal(rb.read(8), x)


def test_ring_threaded_stream(ring_mode):
    """Producer/consumer on separate threads: all samples arrive in order."""
    rb = RingBuffer(1 << 12, force_python=ring_mode)
    total = 200_000
    src = np.random.default_rng(0).standard_normal(total).astype(np.float32)
    received = []

    def producer():
        pos = 0
        while pos < total:
            pos += rb.write(src[pos : pos + 777])

    def consumer():
        got = 0
        while got < total:
            chunk = rb.read(1024)
            got += len(chunk)
            if len(chunk):
                received.append(chunk)

    tp, tc = threading.Thread(target=producer), threading.Thread(target=consumer)
    tp.start(); tc.start(); tp.join(timeout=30); tc.join(timeout=30)
    out = np.concatenate(received)
    assert out.shape == (total,)
    np.testing.assert_array_equal(out, src)


def test_pcm_roundtrip():
    x = np.linspace(-1, 1, 1000).astype(np.float32) * 0.99
    pcm = f32_to_pcm16(x)
    back = pcm16_to_f32(pcm)
    # truncating quantizer + 32767/32768 scale bias -> up to ~2 LSB
    np.testing.assert_allclose(back, x, atol=2.5 / 32768)
    # clipping
    assert f32_to_pcm16(np.asarray([2.0], np.float32))[0] == 32767
    assert f32_to_pcm16(np.asarray([-2.0], np.float32))[0] == -32768


def test_threaded_synthesizer_stream():
    from ddsp_tpu.config import Config
    from ddsp_tpu.models.controller import decoder_init
    from ddsp_tpu.models.crepe import crepe_init
    from ddsp_tpu.runtime.threaded import ThreadedSynthesizer

    conf = Config(
        sample_rate=4000,
        n_fft=256,
        hop_length=64,
        n_harmonics=12,
        n_noise_filters=9,
        decoder_mlp_units=16,
        decoder_mlp_layers=1,
        decoder_gru_units=16,
        reverb_length=256,
        crepe_window=1024,
        crepe_sample_rate=16000,
    )
    params = decoder_init(jax.random.PRNGKey(0), conf)
    crepe = crepe_init(jax.random.PRNGKey(1), "tiny")
    t = np.arange(conf.sample_rate) / conf.sample_rate
    mic = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    hop = conf.hop_length
    with ThreadedSynthesizer(params, crepe, conf, latency_hops=3) as synth:
        outs = []
        import time

        for i in range(40):
            synth.push(mic[i * hop : (i + 1) * hop])
            time.sleep(0.002)  # give the worker a chance (2-CPU host)
            outs.append(synth.pull(hop))
        # Drain: wait until the worker has consumed every pushed hop (the
        # 2-CPU CI host lags far behind the pulls), then read whatever is
        # left in the output ring.
        deadline = time.time() + 120.0
        while synth._in.readable() >= hop and time.time() < deadline:
            time.sleep(0.05)
        time.sleep(0.3)  # let the final block land in the output ring
        rest = synth._out.read(synth._out.readable())
    out = np.concatenate(outs)
    assert np.isfinite(out).all() and np.isfinite(rest).all()
    assert out.shape == (40 * hop,)
    # The worker must have actually synthesized: it wrote 40 blocks (the
    # first two are pipeline-fill zeros) and the realtime pulls consumed at
    # most 40 hops of the 43 written, so `rest` holds late REAL blocks --
    # a dead or silent worker would leave it empty/all-zero.
    assert len(rest) >= hop, len(rest)
    assert np.abs(rest).max() > 1e-7, np.abs(rest).max()


# --- parallel WAV corpus decoder (wavloader.cpp) ------------------------------
def _write_test_wav(path, audio, rate, bits, fmt="pcm"):
    """Write (channels, samples) float32 as a WAV of the given depth/format."""
    import struct

    audio = np.asarray(audio, np.float32)
    ch, n = audio.shape
    inter = audio.T.reshape(-1)
    if fmt == "f32":
        raw = inter.astype("<f4").tobytes()
        tag, bits = 3, 32
    elif fmt == "f64":
        raw = inter.astype("<f8").tobytes()
        tag, bits = 3, 64
    elif bits == 8:
        raw = (np.clip(inter, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
        tag = 1
    elif bits == 16:
        raw = np.clip(inter * 32768, -32768, 32767).astype("<i2").tobytes()
        tag = 1
    elif bits == 24:
        i32 = np.clip(inter * (1 << 23), -(1 << 23), (1 << 23) - 1).astype(np.int32)
        b = np.zeros((len(i32), 3), np.uint8)
        b[:, 0] = i32 & 0xFF
        b[:, 1] = (i32 >> 8) & 0xFF
        b[:, 2] = (i32 >> 16) & 0xFF
        raw = b.tobytes()
        tag = 1
    elif bits == 32:
        raw = np.clip(inter * (1 << 31), -(2**31), 2**31 - 1).astype("<i4").tobytes()
        tag = 1
    block = ch * bits // 8
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, tag, ch, rate, rate * block, block, bits))
        f.write(b"data" + struct.pack("<I", len(raw)) + raw)


@pytest.mark.parametrize(
    "bits,fmt,ch",
    [(8, "pcm", 1), (16, "pcm", 2), (24, "pcm", 1), (32, "pcm", 2),
     (32, "f32", 2), (64, "f64", 1)],
)
def test_corpus_decoder_matches_python(tmp_path, bits, fmt, ch):
    """Native decode+mono-mix == Python read_audio+mean, bit-for-bit."""
    from ddsp_tpu.native import load_corpus_mono

    rng = np.random.default_rng(bits + ch)
    audio = (0.8 * rng.standard_normal((ch, 1000))).clip(-1, 0.999).astype(np.float32)
    p = str(tmp_path / f"t{bits}{fmt}.wav")
    _write_test_wav(p, audio, 22050, bits, fmt)
    native = load_corpus_mono([p])
    python = load_corpus_mono([p], force_python=True)
    assert native[0][1] == python[0][1] == 22050
    np.testing.assert_array_equal(native[0][0], python[0][0])


def test_corpus_decoder_many_files_threaded(tmp_path):
    from ddsp_tpu.native import load_corpus_mono, native_available

    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    paths, want = [], []
    for i in range(12):
        a = (0.5 * rng.standard_normal((1, 300 + 17 * i))).astype(np.float32)
        p = str(tmp_path / f"f{i}.wav")
        _write_test_wav(p, a, 16000, 16)
        paths.append(p)
    got = load_corpus_mono(paths, n_threads=4)
    ref = load_corpus_mono(paths, force_python=True)
    for (ga, gr), (ra, rr) in zip(got, ref):
        assert gr == rr == 16000
        np.testing.assert_array_equal(ga, ra)


def test_corpus_decoder_bad_file_falls_back(tmp_path):
    """A corrupt wav raises the Python decoder's clear error, not a crash."""
    from ddsp_tpu.data.audio_io import UnsupportedAudioFormat
    from ddsp_tpu.native import load_corpus_mono

    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"not a wav at all")
    with pytest.raises(UnsupportedAudioFormat):
        load_corpus_mono([p])
