"""Data pipeline: WAV I/O round trips, chunking contract, feature cache."""

import os

import numpy as np
import pytest

import jax

from ddsp_tpu.config import Config
from ddsp_tpu.data.audio_io import UnsupportedAudioFormat, read_wav, write_wav
from ddsp_tpu.data.dataset import (
    batch_iterator,
    extract_features,
    list_audio_files,
    load_examples,
)
from ddsp_tpu.models.crepe import crepe_init


def test_wav_roundtrip(tmp_path):
    sr = 8000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    path = str(tmp_path / "tone.wav")
    write_wav(path, x, sr)
    y, sr2 = read_wav(path)
    assert sr2 == sr and y.shape == (1, sr)
    np.testing.assert_allclose(y[0], x, atol=1.5 / 32768)


def test_wav_stereo_and_float(tmp_path):
    sr = 4000
    x = np.stack([np.ones(100, np.float32) * 0.25, -np.ones(100, np.float32) * 0.5])
    path = str(tmp_path / "st.wav")
    write_wav(path, x, sr)
    y, _ = read_wav(path)
    assert y.shape == (2, 100)
    np.testing.assert_allclose(y, x, atol=1.5 / 32768)


def test_non_wav_rejected(tmp_path):
    path = str(tmp_path / "fake.wav")
    with open(path, "wb") as f:
        f.write(b"ID3\x00 not a wav at all")
    with pytest.raises(UnsupportedAudioFormat):
        read_wav(path)


def test_read_audio_dispatch(tmp_path, monkeypatch):
    """read_audio: wav goes native; compressed uses an optional backend."""
    import sys
    import types

    from ddsp_tpu.data import audio_io
    from ddsp_tpu.data.audio_io import read_audio

    sr = 8000
    x = (0.25 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    wav = str(tmp_path / "t.wav")
    write_wav(wav, x, sr)
    y, got_sr = read_audio(wav)
    assert got_sr == sr and y.shape[0] == 1

    # no backend installed -> clear error for compressed formats
    mp3 = str(tmp_path / "t.mp3")
    with open(mp3, "wb") as f:
        f.write(b"ID3\x00fake")
    if not audio_io.have_compressed_backend():
        with pytest.raises(UnsupportedAudioFormat):
            read_audio(mp3)

    # fake soundfile backend -> dispatched there
    fake = types.ModuleType("soundfile")
    fake.read = lambda path, dtype, always_2d: (
        np.zeros((16, 2), np.float32),
        22050,
    )
    monkeypatch.setitem(sys.modules, "soundfile", fake)
    y, got_sr = read_audio(mp3)
    assert y.shape == (2, 16) and got_sr == 22050


def test_list_audio_files_compressed_gating(tmp_path, monkeypatch):
    from ddsp_tpu.data import dataset as ds

    write_wav(str(tmp_path / "a.wav"), np.zeros(128, np.float32), 8000)
    with open(tmp_path / "b.mp3", "wb") as f:
        f.write(b"ID3\x00fake")

    monkeypatch.setattr(ds, "have_compressed_backend", lambda: False)
    files = ds.list_audio_files(str(tmp_path))
    assert [os.path.basename(f) for f in files] == ["a.wav"]

    monkeypatch.setattr(ds, "have_compressed_backend", lambda: True)
    files = ds.list_audio_files(str(tmp_path))
    assert [os.path.basename(f) for f in files] == ["a.wav", "b.mp3"]


@pytest.fixture
def tiny_dataset_dir(tmp_path):
    conf = Config(data_dir=str(tmp_path), sample_rate=44100)
    sr = conf.sample_rate
    t = np.arange(int(2.6 * sr)) / sr
    write_wav(str(tmp_path / "a.wav"), 0.5 * np.sin(2 * np.pi * 330 * t), sr)
    sub = tmp_path / "sub"
    sub.mkdir()
    write_wav(str(sub / "b.wav"), 0.3 * np.sin(2 * np.pi * 220 * t), sr)
    return conf


def test_load_examples_shapes_and_cache(tiny_dataset_dir):
    conf = tiny_dataset_dir
    ex = load_examples(conf)
    assert ex.shape[1] == conf.example_length == 88064
    # 2.6 s audio -> (len-2s)//0.5s + 1 = 2 examples per file, 2 files
    assert ex.shape[0] == 4, ex.shape
    # cache hit returns identical data
    ex2 = load_examples(conf)
    np.testing.assert_array_equal(ex, ex2)
    assert any(f.startswith("audio_dataset") for f in os.listdir(conf.data_dir))


def test_extract_features_and_iterate(tiny_dataset_dir):
    conf = tiny_dataset_dir.replace(batch_size=2)
    crepe = crepe_init(jax.random.PRNGKey(0), "tiny")
    feats = extract_features(crepe, conf, include_probabilities=False)
    t = conf.frames_per_example
    n = len(feats["audio"])
    assert feats["f0"].shape == (n, t, 1)
    assert feats["loudness"].shape == (n, t, 1)
    assert feats["normalized_cents"].shape == (n, t, 1)
    assert "probabilities" not in feats
    # cache round trip
    feats2 = extract_features(crepe, conf, include_probabilities=False)
    np.testing.assert_allclose(feats2["f0"], feats["f0"], atol=1e-6)

    batches = list(batch_iterator(feats, 2, jax.random.PRNGKey(0)))
    assert len(batches) == n // 2
    assert batches[0]["audio"].shape == (2, conf.example_length)


def test_missing_dir_raises():
    with pytest.raises(ValueError, match="No valid audio files"):
        list_audio_files("/nonexistent_dir_xyz")


def _write_extensible_wav(path, body_bytes, bits, fmt_tag, sr=8000, channels=1):
    """Handcraft a WAVE_FORMAT_EXTENSIBLE file (fmt tag 0xFFFE + SubFormat)."""
    import struct

    guid = struct.pack("<H", fmt_tag) + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
    )
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 0xFFFE, channels, sr, sr * block, block, bits
    ) + struct.pack("<HHI", 22, bits, 0) + guid
    data = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body_bytes))
    data += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data += b"data" + struct.pack("<I", len(body_bytes)) + body_bytes
    with open(path, "wb") as f:
        f.write(data)


def test_wav_extensible_int32_and_float32(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE decodes by SubFormat GUID, not a bit-depth guess."""
    rng = np.random.default_rng(0)
    x = (0.5 * rng.standard_normal(256)).clip(-1, 1).astype(np.float32)

    p = str(tmp_path / "int32ext.wav")
    # scale in float64: float32 rounds 2**31-1 up to 2**31, overflowing int32
    _write_extensible_wav(
        p, (x.astype(np.float64) * (2**31 - 1)).astype("<i4").tobytes(), 32, 1
    )
    y, sr = read_wav(p)
    assert sr == 8000
    np.testing.assert_allclose(y[0], x, atol=2 / 2**31 + 1e-7)

    p = str(tmp_path / "f32ext.wav")
    _write_extensible_wav(p, x.astype("<f4").tobytes(), 32, 3)
    y, _ = read_wav(p)
    np.testing.assert_allclose(y[0], x, atol=1e-7)

    p = str(tmp_path / "badext.wav")
    _write_extensible_wav(p, x.astype("<f4").tobytes(), 32, 0xFFF0)
    with pytest.raises(UnsupportedAudioFormat):
        read_wav(p)


def test_feature_cache_keyed_on_crepe_weights(tiny_dataset_dir):
    """Different CREPE weights must not share a feature cache (silently
    reusing features from other weights was a real bug)."""
    conf = tiny_dataset_dir.replace(batch_size=2)
    crepe_a = crepe_init(jax.random.PRNGKey(0), "tiny")
    crepe_b = crepe_init(jax.random.PRNGKey(1), "tiny")
    fa = extract_features(crepe_a, conf, include_probabilities=False)
    fb = extract_features(crepe_b, conf, include_probabilities=False)
    caches = [f for f in os.listdir(conf.data_dir) if f.startswith("features_")]
    assert len(caches) >= 2, caches
    # different nets -> different pitch probabilities -> (generically) f0
    assert not np.allclose(fa["f0"], fb["f0"])
