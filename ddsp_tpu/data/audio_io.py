"""Audio file I/O without external audio libraries.

The reference leans on torchaudio/soundfile (reference:
dataset/audio_dataset.py:30, train/train.py:41); neither exists in this
environment, so WAV read/write is implemented directly (PCM 8/16/24/32 and
float32/float64, via the stdlib ``wave``-compatible RIFF layout parsed with
numpy).  Compressed formats (mp3/ogg/flac) decode through the first
importable backend -- soundfile, torchaudio, librosa, or pygame/SDL_mixer
at the native rate parsed from the container header -- and raise a clear
error listing the offending file when none is installed.
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
            f"{path}: not a WAV file (compressed formats go through "
            "read_audio, which needs a decoder backend)"
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

    return any(usable(m) for m in ("soundfile", "torchaudio", "librosa", "pygame"))


# MPEG audio sample rates indexed by [version bits][rate bits]; version bits:
# 0 = MPEG-2.5, 2 = MPEG-2, 3 = MPEG-1 (1 is reserved).
_MPEG_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def probe_mp3(data: bytes) -> Tuple[int, int]:
    """(sample_rate, channels) from the first valid MPEG audio frame header.

    Skips a leading ID3v2 tag (sync-safe size), then scans for the 11-bit
    frame sync.  Raises :class:`UnsupportedAudioFormat` if no frame is found.
    """
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = (
            ((data[6] & 0x7F) << 21)
            | ((data[7] & 0x7F) << 14)
            | ((data[8] & 0x7F) << 7)
            | (data[9] & 0x7F)
        )
        pos = 10 + size
    end = min(len(data) - 3, pos + (1 << 20))  # sync must appear within ~1 MB
    while pos < end:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            version = (data[pos + 1] >> 3) & 3
            layer = (data[pos + 1] >> 1) & 3
            rate_idx = (data[pos + 2] >> 2) & 3
            mode = (data[pos + 3] >> 6) & 3
            if version != 1 and layer != 0 and rate_idx != 3:
                return _MPEG_RATES[version][rate_idx], 1 if mode == 3 else 2
        pos += 1
    raise UnsupportedAudioFormat("no MPEG audio frame header found")


def probe_ogg_vorbis(data: bytes) -> Tuple[int, int]:
    """(sample_rate, channels) from the Vorbis identification header.

    The id header is the first packet of the first Ogg page: the marker
    ``\\x01vorbis`` followed by version(u32) channels(u8) rate(u32le).
    """
    i = data.find(b"\x01vorbis", 0, 1 << 16)
    if data[:4] != b"OggS" or i < 0 or i + 16 > len(data):
        raise UnsupportedAudioFormat("no Ogg Vorbis identification header found")
    channels = data[i + 11]
    rate = struct.unpack("<I", data[i + 12 : i + 16])[0]
    return rate, channels


def probe_flac(data: bytes) -> Tuple[int, int]:
    """(sample_rate, channels) from the FLAC STREAMINFO block."""
    if data[:4] != b"fLaC" or len(data) < 26:
        raise UnsupportedAudioFormat("not a FLAC stream")
    b = data[8:]  # STREAMINFO body (first metadata block is mandatory)
    rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    channels = ((b[12] >> 1) & 7) + 1
    return rate, channels


def _probe_compressed(data: bytes) -> Tuple[int, int]:
    if data[:4] == b"OggS":
        return probe_ogg_vorbis(data)
    if data[:4] == b"fLaC":
        return probe_flac(data)
    return probe_mp3(data)


def read_via_pygame(path: str) -> Tuple[np.ndarray, int]:
    """Decode mp3/ogg/flac through pygame's SDL_mixer at the file's native rate.

    SDL_mixer converts every Sound to the mixer's output spec, so the native
    (rate, channels) are parsed from the container header first and the
    (dummy-audio-device) mixer is opened to match -- no resampling happens and
    the returned samples are the decoder's raw int16 output scaled to float32.
    """
    import os

    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    try:
        import pygame
    except ImportError as e:  # pragma: no cover - guarded by caller
        raise UnsupportedAudioFormat(f"{path}: pygame backend unavailable: {e}")

    with open(path, "rb") as f:
        head = f.read(1 << 20)
        # An ID3v2 tag can exceed the probe head (multi-MB embedded album
        # art is common); its sync-safe size says how far the audio frames
        # start, so extend the read past the tag plus a scan margin.
        if head[:3] == b"ID3" and len(head) >= 10:
            tag_end = 10 + (
                ((head[6] & 0x7F) << 21)
                | ((head[7] & 0x7F) << 14)
                | ((head[8] & 0x7F) << 7)
                | (head[9] & 0x7F)
            )
            # Clamp to the actual file size: the sync-safe field of a
            # corrupt tag can claim up to ~256 MB and the probe must not
            # try to buffer that much just to read a frame header.
            tag_end = min(tag_end, os.path.getsize(path))
            if tag_end + (1 << 16) > len(head):
                f.seek(0)
                head = f.read(tag_end + (1 << 16))
    rate, channels = _probe_compressed(head)

    init = pygame.mixer.get_init()
    if init != (rate, -16, channels):
        if init is not None:
            pygame.mixer.quit()
        pygame.mixer.init(frequency=rate, size=-16, channels=channels, buffer=512)
    try:
        sound = pygame.mixer.Sound(path)
        arr = pygame.sndarray.array(sound)
    except pygame.error as e:
        raise UnsupportedAudioFormat(f"{path}: SDL_mixer could not decode: {e}")
    x = np.asarray(arr, np.float32) / 32768.0
    x = x[None, :] if x.ndim == 1 else x.T
    return np.ascontiguousarray(x), rate


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
    try:
        import pygame  # noqa: F401 -- SDL_mixer decode fallback

        return read_via_pygame(path)
    except ImportError:
        pass
    raise UnsupportedAudioFormat(
        f"{path}: compressed audio needs soundfile/torchaudio/librosa/pygame "
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
