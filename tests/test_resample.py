"""Sinc resampler: tone fidelity, length contract, DC preservation."""

import numpy as np
import pytest

from ddsp_tpu.ops.resample import resample, resample_length


def _tone(freq, sr, dur=1.0):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_length_contract():
    assert resample_length(89600, 44100, 16000) == int(np.ceil(160 * 89600 / 441))
    for L in [1, 100, 88064, 89600]:
        y = resample(np.zeros((L,), np.float32), 44100, 16000)
        assert y.shape[-1] == resample_length(L, 44100, 16000)


@pytest.mark.parametrize("freq", [440.0, 1234.5, 3000.0])
def test_tone_preserved(snr, freq):
    sr_in, sr_out = 44100, 16000
    x = _tone(freq, sr_in)
    y = np.asarray(resample(x, sr_in, sr_out))
    t_out = np.arange(len(y)) / sr_out
    want = np.sin(2 * np.pi * freq * t_out)
    # ignore filter edge transients
    m = slice(200, -200)
    assert snr(want[m], y[m]) > 35.0


def test_upsample_tone(snr):
    x = _tone(440.0, 16000)
    y = np.asarray(resample(x, 16000, 44100))
    want = _tone(440.0, 44100)[: len(y)]
    m = slice(400, -400)
    assert snr(want[m], y[m]) > 35.0


def test_batched_shapes():
    x = np.random.default_rng(0).standard_normal((2, 3, 4410)).astype(np.float32)
    y = np.asarray(resample(x, 44100, 16000))
    assert y.shape == (2, 3, resample_length(4410, 44100, 16000))


def test_identity_when_same_rate():
    x = np.ones((5,), np.float32)
    assert resample(x, 16000, 16000) is x
