"""Compressed-audio ingest (mp3/ogg) through the pygame/SDL_mixer backend.

The reference globs and decodes ``**/*.{wav,mp3,ogg}``
(reference: dataset/audio_dataset.py:22-24) via torchaudio; this environment
ships no torchaudio/soundfile/librosa, so compressed files decode through
SDL_mixer (pygame) at the native rate parsed from the container header
(data/audio_io.read_via_pygame).  Real-world mp3 and ogg fixtures shipped by
pygame itself serve as test vectors; the same source encoded in both formats
must decode to mutually consistent audio.
"""

import shutil

import numpy as np
import pytest

from ddsp_tpu.data import audio_io
from ddsp_tpu.data.audio_io import (
    UnsupportedAudioFormat,
    probe_flac,
    probe_mp3,
    probe_ogg_vorbis,
    read_audio,
)

MP3_FIXTURE = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3"
OGG_FIXTURE = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"


def _have_pygame_and_fixtures():
    import importlib.util
    import os

    return (
        importlib.util.find_spec("pygame") is not None
        and os.path.exists(MP3_FIXTURE)
        and os.path.exists(OGG_FIXTURE)
    )


needs_pygame = pytest.mark.skipif(
    not _have_pygame_and_fixtures(), reason="pygame backend / fixtures not present"
)


# ---------------------------------------------------------------- header probes


def test_probe_mp3_synthetic():
    # MPEG-1 Layer III, 44100 Hz, joint stereo: sync=0x FF FA, rate bits 00.
    hdr = bytes([0xFF, 0xFA, 0x10, 0x40]) + b"\x00" * 8
    rate, ch = probe_mp3(hdr)
    assert (rate, ch) == (44100, 2)
    # mono mode bits (11), MPEG-2 (ver bits 10 -> 0xF2), rate idx 01 -> 24000
    hdr = bytes([0xFF, 0xF2, 0x14, 0xC0])
    rate, ch = probe_mp3(hdr)
    assert (rate, ch) == (24000, 1)
    # ID3v2 tag is skipped via its sync-safe size
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x05" + b"x" * 5
    rate, ch = probe_mp3(tag + bytes([0xFF, 0xFA, 0x10, 0xC0]))
    assert (rate, ch) == (44100, 1)
    with pytest.raises(UnsupportedAudioFormat):
        probe_mp3(b"\x00" * 64)


def test_probe_ogg_vorbis_synthetic():
    page = b"OggS" + b"\x00" * 24 + b"\x01vorbis" + b"\x00" * 4 + bytes([2]) + (48000).to_bytes(4, "little")
    rate, ch = probe_ogg_vorbis(page)
    assert (rate, ch) == (48000, 2)
    with pytest.raises(UnsupportedAudioFormat):
        probe_ogg_vorbis(b"RIFFxxxx")


def test_probe_flac_synthetic():
    # STREAMINFO: rate 44100 = 0x0AC44 in 20 bits, channels 1 -> bits 0b000
    body = bytes(10) + bytes([0x0A, 0xC4, 0x40]) + bytes(21)
    data = b"fLaC" + bytes([0x80, 0, 0, 34]) + body
    rate, ch = probe_flac(data)
    assert (rate, ch) == (44100, 1)
    with pytest.raises(UnsupportedAudioFormat):
        probe_flac(b"OggS")


# ------------------------------------------------------------- fixture decodes


@needs_pygame
def test_mp3_decode_native_rate():
    y, sr = read_audio(MP3_FIXTURE)
    assert sr == 11025  # parsed from the MPEG-2.5 frame header, not SDL default
    assert y.shape[0] == 1 and y.shape[1] > 5 * sr  # ~7 s fixture
    assert np.isfinite(y).all() and np.abs(y).max() <= 1.0
    assert float(np.abs(y).max()) > 0.1  # real audio, not silence


@needs_pygame
def test_ogg_decode_native_rate():
    y, sr = read_audio(OGG_FIXTURE)
    assert sr == 11025
    assert y.shape[0] == 1 and y.shape[1] > 5 * sr
    assert float(np.abs(y).max()) > 0.1


@needs_pygame
def test_mp3_ogg_cross_format_consistency():
    """Same source in both codecs: after alignment they must agree well.

    mp3 prepends encoder delay, so the best lag is found by direct search;
    the SNR bound is loose (both are lossy at low bitrate) but strong enough
    to catch rate, channel-order, or scaling errors, which would destroy the
    correlation entirely.
    """
    a, _ = read_audio(MP3_FIXTURE)
    b, _ = read_audio(OGG_FIXTURE)
    a, b = a[0], b[0]
    win = 20000
    best_mse, best_lag = np.inf, 0
    for lag in range(0, 1501, 5):  # mp3 delay is positive (mp3 starts later)
        x, y = a[lag : lag + win], b[:win]
        mse = float(np.mean((x - y) ** 2))
        if mse < best_mse:
            best_mse, best_lag = mse, lag
    sig = float(np.mean(b[:win] ** 2))
    snr = 10 * np.log10(sig / best_mse)
    assert snr > 15.0, (snr, best_lag)


# ------------------------------------------------------------------- pipeline


@needs_pygame
def test_load_examples_from_mp3_corpus(tmp_path):
    """An mp3-only corpus flows through glob -> decode -> resample -> chunk."""
    from ddsp_tpu.config import Config
    from ddsp_tpu.data.dataset import list_audio_files, load_examples

    shutil.copy(MP3_FIXTURE, tmp_path / "tune.mp3")
    conf = Config(data_dir=str(tmp_path), sample_rate=44100)
    files = list_audio_files(str(tmp_path))
    assert [f.split("/")[-1] for f in files] == ["tune.mp3"]
    ex = load_examples(conf)
    # ~7.26 s at native 11025 Hz -> resampled to 44.1 k -> 2 s windows / 0.5 s
    assert ex.shape[1] == conf.example_length
    assert ex.shape[0] >= 9
    assert np.isfinite(ex).all() and float(np.abs(ex).max()) > 0.05


@needs_pygame
def test_mp3_oversized_id3_tag(tmp_path):
    """An ID3v2 tag larger than the 1 MB probe head (e.g. embedded album
    art) must not defeat the native-rate probe (round-2 ADVICE, low): the
    sync-safe tag size says where the audio frames start, so the reader
    extends the head past the tag."""

    def syncsafe(n):
        return bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )

    tag_body = bytes(1_500_000)  # 1.5 MB of padding (> the 1 MB probe head)
    tag = b"ID3\x04\x00\x00" + syncsafe(len(tag_body)) + tag_body
    with open(MP3_FIXTURE, "rb") as f:
        payload = f.read()
    big = tmp_path / "big_tag.mp3"
    big.write_bytes(tag + payload)

    y_ref, sr_ref = audio_io.read_via_pygame(MP3_FIXTURE)
    y, sr = audio_io.read_via_pygame(str(big))
    assert sr == sr_ref  # probe found the frame header past the tag
    assert y.shape[0] == y_ref.shape[0]
    assert abs(y.shape[1] - y_ref.shape[1]) <= sr  # decoder may trim edges


def test_backend_detected_here():
    """This environment ships pygame, so compressed ingest must be live."""
    if not _have_pygame_and_fixtures():
        pytest.skip("pygame missing")
    assert audio_io.have_compressed_backend()
