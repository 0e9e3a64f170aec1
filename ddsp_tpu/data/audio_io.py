"""Audio file I/O without external audio libraries.

The reference leans on torchaudio/soundfile (reference:
dataset/audio_dataset.py:30, train/train.py:41); neither exists in this
environment, so WAV read/write is implemented directly (PCM 8/16/24/32 and
float32/float64, via the stdlib ``wave``-compatible RIFF layout parsed with
numpy).  Compressed formats raise a clear error listing the offending file.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


class UnsupportedAudioFormat(ValueError):
    pass


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a RIFF/WAVE file -> ((channels, samples) float32 in [-1, 1], rate)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnsupportedAudioFormat(
            f"{path}: not a WAV file (compressed formats like mp3/ogg are not "
            "supported in this environment; convert to wav)"
        )
    pos = 12
    fmt = None
    fmt_body = b""
    raw = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif chunk_id == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise UnsupportedAudioFormat(f"{path}: missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # The real format tag is the first 2 bytes of the SubFormat GUID in
        # the fmt extension: 16 base bytes + cbSize(2) + valid-bits(2) +
        # channel-mask(4), GUID at offset 24.
        if len(fmt_body) >= 26:
            audio_format = struct.unpack("<H", fmt_body[24:26])[0]
        else:
            raise UnsupportedAudioFormat(
                f"{path}: WAVE_FORMAT_EXTENSIBLE with truncated fmt extension"
            )
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = data_to_float(np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0, 127.0)
        elif bits == 16:
            x = data_to_float(np.frombuffer(raw, "<i2").astype(np.float32), 32768.0)
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            i32 = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            i32 = np.where(i32 >= 1 << 23, i32 - (1 << 24), i32)
            x = data_to_float(i32.astype(np.float32), float(1 << 23))
        elif bits == 32:
            x = data_to_float(np.frombuffer(raw, "<i4").astype(np.float32), float(1 << 31))
        else:
            raise UnsupportedAudioFormat(f"{path}: {bits}-bit PCM")
    elif audio_format == 3:  # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(raw, dt).astype(np.float32)
    else:
        raise UnsupportedAudioFormat(
            f"{path}: WAV format tag {audio_format} (only PCM/float supported)"
        )
    if n_channels > 1:
        x = x[: len(x) - len(x) % n_channels]
        x = x.reshape(-1, n_channels).T
    else:
        x = x[None, :]
    return np.ascontiguousarray(x), sample_rate


def data_to_float(x: np.ndarray, scale: float) -> np.ndarray:
    return (x / scale).astype(np.float32)


def have_compressed_backend() -> bool:
    """True if an optional decoder for mp3/ogg/flac is importable."""
    import importlib.util

    def usable(m):
        try:
            return importlib.util.find_spec(m) is not None
        except (ImportError, ValueError):
            # find_spec raises ValueError for an in-sys.modules module
            # whose __spec__ is None (e.g. a test stub) -- not a backend.
            return False

    return any(usable(m) for m in ("soundfile", "torchaudio", "librosa"))


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    """Read any supported audio file -> ((channels, samples) float32, rate).

    WAV is decoded natively; other formats (the reference globs mp3/ogg too,
    dataset/audio_dataset.py:22-24) go through an optional backend --
    soundfile, torchaudio, or librosa, whichever imports first -- and raise
    :class:`UnsupportedAudioFormat` when none is installed.
    """
    if path.lower().endswith(".wav"):
        return read_wav(path)
    try:
        import soundfile

        data, sr = soundfile.read(path, dtype="float32", always_2d=True)
        return np.ascontiguousarray(data.T), int(sr)
    except ImportError:
        pass
    try:
        import torchaudio

        wav, sr = torchaudio.load(path)
        return wav.numpy().astype(np.float32), int(sr)
    except ImportError:
        pass
    try:
        import librosa

        y, sr = librosa.load(path, sr=None, mono=False)
        y = y[None, :] if y.ndim == 1 else y
        return y.astype(np.float32), int(sr)
    except ImportError:
        pass
    raise UnsupportedAudioFormat(
        f"{path}: compressed audio needs soundfile/torchaudio/librosa "
        "(none installed); convert to wav"
    )


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write float32 audio (samples,) or (channels, samples) as 16-bit PCM WAV.

    Replaces the reference's ``soundfile.write`` validation dumps
    (reference: train/train.py:41-43).
    """
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    n_channels, n_samples = audio.shape
    pcm = np.clip(audio.T * 32767.0, -32768, 32767).astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(pcm)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(pcm)))
        f.write(pcm)
