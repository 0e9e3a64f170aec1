"""Spectral ops: torch.stft oracles, A-weighting literature values."""

import os

import numpy as np
import pytest
import torch

from ddsp_tpu.ops.spectral import (
    a_weighted_loudness,
    a_weighting,
    spectrogram,
    stft_magnitude_nocenter,
)
from ddsp_tpu.losses import mss_loss, sss_loss


def _torch_spectrogram(x, n_fft, hop):
    # torchaudio.transforms.Spectrogram semantics via torch.stft
    return (
        torch.stft(
            torch.from_numpy(x),
            n_fft=n_fft,
            hop_length=hop,
            window=torch.hann_window(n_fft),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        .abs()
        .pow(2)
        .numpy()
    )


@pytest.mark.parametrize("n_fft,hop", [(64, 16), (256, 64), (2048, 512)])
def test_spectrogram_matches_torchaudio_convention(n_fft, hop):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    got = np.asarray(spectrogram(x, n_fft, hop))
    want = _torch_spectrogram(x, n_fft, hop)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_stft_nocenter_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    n_fft, hop = 2048, 512
    got = np.asarray(stft_magnitude_nocenter(x, n_fft, hop))
    want = (
        torch.stft(
            torch.from_numpy(x),
            n_fft=n_fft,
            hop_length=hop,
            center=False,
            return_complex=True,
        )
        .abs()
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_a_weighting_literature_values():
    # IEC 61672 A-weighting values: 0 dB @ 1 kHz, about -19.1 @ 100 Hz,
    # +1.3 @ 2 kHz, -9.3 @ 8 kHz (curve values, 0.2 dB tolerance).
    sr, n_fft = 44100, 8820  # bin width 5 Hz -> exact 100/1000/2000/8000 bins
    w = a_weighting(n_fft, sr)
    freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)

    def at(f):
        return w[np.argmin(np.abs(freqs - f))]

    assert abs(at(1000) - 0.0) < 0.2
    assert abs(at(100) - (-19.1)) < 0.3
    assert abs(at(2000) - 1.2) < 0.3
    assert abs(at(8000) - (-1.1)) < 0.3
    assert w[0] == -80.0  # min_db floor at DC


def test_loudness_range():
    sr = 44100
    t = np.arange(sr) / sr
    # full-scale 1 kHz sine ~ -3 dBFS RMS -> loudness near 1; silence -> ~0
    loud_sine = np.asarray(
        a_weighted_loudness(np.sin(2 * np.pi * 1000 * t)[None].astype(np.float32), 2048, 512, sr)
    )
    loud_silence = np.asarray(
        a_weighted_loudness(np.zeros((1, sr), np.float32), 2048, 512, sr)
    )
    assert loud_silence.max() < 0.1
    assert 0.5 < loud_sine.mean() < 1.2
    assert loud_sine.shape == (1, (sr - 2048) // 512 + 1, 1)


def _reference_sss(pred, true, n_fft, alpha=1.0, overlap=0.75, eps=1e-7):
    """Golden oracle: the reference's own SSSLoss imported at test time when
    torchaudio exists; otherwise an independent torch re-derivation of its
    documented formula (loss/mss_loss.py:16-33) so the test never goes dark
    in torchaudio-free environments."""
    import sys

    if os.path.exists("/root/reference"):
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        try:
            from loss.mss_loss import SSSLoss

            return float(
                SSSLoss(n_fft)(torch.from_numpy(pred), torch.from_numpy(true))
            )
        except Exception:  # torchaudio missing: fall through to the oracle
            pass
    hop = int(n_fft * (1 - overlap))
    sp = torch.from_numpy(np.asarray(_torch_spectrogram(pred, n_fft, hop)))
    st = torch.from_numpy(np.asarray(_torch_spectrogram(true, n_fft, hop)))
    lin = torch.nn.functional.l1_loss(sp, st)
    log = torch.nn.functional.l1_loss((st + eps).log2(), (sp + eps).log2())
    return (lin + alpha * log).item()


@pytest.mark.parametrize("n_fft", [64, 256, 1024])
def test_sss_loss_matches_reference_formula(n_fft):
    rng = np.random.default_rng(2)
    pred = (0.1 * rng.standard_normal((2, 4096))).astype(np.float32)
    true = (0.1 * rng.standard_normal((2, 4096))).astype(np.float32)
    got = float(sss_loss(pred, true, n_fft))
    want = _reference_sss(pred, true, n_fft)
    assert abs(got - want) < 1e-3 * max(1.0, abs(want))


def test_mss_loss_zero_for_identical():
    rng = np.random.default_rng(3)
    x = (0.1 * rng.standard_normal((1, 8192))).astype(np.float32)
    assert float(mss_loss(x, x, ffts=(512, 256, 128))) == 0.0


def test_hopblocked_matches_framed_path():
    """The hop-blocked STFT fast path must equal the framed matmul path
    bit-for-bit up to f32 summation order (both directions of the branch in
    spectrogram(); the hop-blocked branch fires when hop divides n_fft and
    the padded length)."""
    import jax.numpy as jnp

    from ddsp_tpu.ops.fft import rfft_pair
    from ddsp_tpu.ops.fir import hann_window
    from ddsp_tpu.ops.spectral import frame_signal, reflect_pad

    rng = np.random.default_rng(0)
    n_fft, hop = 256, 64
    x = rng.standard_normal((3, 64 * 40)).astype(np.float32)
    got = np.asarray(spectrogram(jnp.asarray(x), n_fft, hop))

    xp = reflect_pad(jnp.asarray(x), n_fft // 2)
    assert xp.shape[-1] % hop == 0  # precondition: fast path was taken
    frames = frame_signal(xp, n_fft, hop) * hann_window(n_fft)
    re, im = rfft_pair(frames)
    # framed path is (..., T, bins); spectrogram returns torchaudio-style
    # (..., bins, T)
    want = np.moveaxis(np.asarray(re * re + im * im), -1, -2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mss_loss_dict_inputs():
    """Reference MSSLoss dict convention: pred['audio_reverb'|'audio_synth'],
    true['audio'] (loss/mss_loss.py:49-62)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    wet = jnp.asarray(0.1 * rng.standard_normal((2, 4096)), jnp.float32)
    dry = jnp.asarray(0.1 * rng.standard_normal((2, 4096)), jnp.float32)
    true = jnp.asarray(0.1 * rng.standard_normal((2, 4096)), jnp.float32)
    pred = {"audio_reverb": wet, "audio_synth": dry}
    ffts = (512, 256)
    got_wet = float(mss_loss(pred, {"audio": true}, ffts=ffts))
    got_dry = float(mss_loss(pred, true, ffts=ffts, use_reverb=False))
    assert got_wet == float(mss_loss(wet, true, ffts=ffts))
    assert got_dry == float(mss_loss(dry, true, ffts=ffts))
    assert got_wet != got_dry


def test_cached_target_loss_matches_uncached():
    """mss_loss_per_scale_cached(target_spectrograms(x)) == mss_loss_per_scale."""
    import jax.numpy as jnp

    from ddsp_tpu.losses import (
        mss_loss_per_scale,
        mss_loss_per_scale_cached,
        target_spectrograms,
    )

    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    true = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    ffts = (256, 128, 64)
    want = mss_loss_per_scale(pred, true, ffts)
    mags = target_spectrograms(true, ffts)
    got = mss_loss_per_scale_cached(pred, mags, ffts)
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(want[k]), np.asarray(got[k]), rtol=1e-6
        )


def test_spectrogram_phased_matches_hopblocked():
    """The phase-decimated STFT (built for the round-5 MSS study, measured
    slower on the chip and NOT the default -- docs/PERFORMANCE.md) computes
    the same spectra as the production hop-blocked form."""
    import jax.numpy as jnp

    from ddsp_tpu.ops.spectral import (
        _spectrogram_hopblocked,
        _spectrogram_phased,
        reflect_pad,
    )

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    for n in (64, 1024):
        xp = reflect_pad(x, n // 2)
        r1, i1 = _spectrogram_hopblocked(xp, n, n // 4)
        r2, i2 = _spectrogram_phased(xp, n, n // 4)
        scale = float(np.abs(np.asarray(r1)).max())
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), rtol=0, atol=1e-5 * scale)
        np.testing.assert_allclose(np.asarray(i2), np.asarray(i1), rtol=0, atol=1e-5 * scale)
