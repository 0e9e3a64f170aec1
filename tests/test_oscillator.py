"""Oscillator bank: golden tests vs the reference renderer + invariants."""

import types

import numpy as np
import pytest
import torch

from ddsp_tpu.ops.oscillator import oscillator_bank, render_padded


def _make_controls(b=2, t=24, h=32, seed=0, sr=16000):
    rng = np.random.default_rng(seed)
    f0 = rng.uniform(80.0, 600.0, (b, t, 1)).astype(np.float32)
    amps = rng.uniform(0.01, 1.0, (b, t, h)).astype(np.float32)
    loud = rng.uniform(0.0, 1.0, (b, t, 1)).astype(np.float32)
    return f0, amps, loud


def _reference_render(reference_path, f0, amps, loud, sr, hop):
    from model.ddsp.harmonic_oscillator import OscillatorBank

    conf = types.SimpleNamespace(
        n_harmonics=amps.shape[-1], sample_rate=sr, hop_length=hop
    )
    bank = OscillatorBank(conf)
    with torch.no_grad():
        out = bank(
            {
                "f0": torch.from_numpy(f0),
                "c": torch.from_numpy(amps.copy()),
                "a": torch.from_numpy(loud),
            }
        )
    return out.numpy()


@pytest.mark.parametrize("hop", [8, 64])
def test_matches_reference(reference_path, snr, hop):
    sr = 16000
    f0, amps, loud = _make_controls(sr=sr)
    want = _reference_render(reference_path, f0, amps, loud, sr, hop)
    got, _ = oscillator_bank(f0, amps, loud, sample_rate=sr, hop=hop)
    got = np.asarray(got)
    assert got.shape == want.shape
    assert snr(want, got) > 60.0


def _reference_render_f64(reference_path, f0, amps, loud, sr, hop):
    """Reference renderer in float64: the numerical ground truth."""
    from model.ddsp.harmonic_oscillator import OscillatorBank

    conf = types.SimpleNamespace(
        n_harmonics=amps.shape[-1], sample_rate=sr, hop_length=hop
    )
    bank = OscillatorBank(conf).double()
    with torch.no_grad():
        out = bank(
            {
                "f0": torch.from_numpy(f0).double(),
                "c": torch.from_numpy(amps.copy()).double(),
                "a": torch.from_numpy(loud).double(),
            }
        )
    return out.numpy()


def test_matches_reference_realistic_shapes(reference_path, snr):
    # Full-scale config: 172 frames x hop 512 x 180 harmonics, f0 high enough
    # to exercise Nyquist culling of upper harmonics.  Both the reference's
    # f32 audio-rate cumsum and our f32 render are compared against the
    # float64 reference render: ours must be at least as accurate (the
    # closed-form early-wrapped phase drifts less than an 88k-sample cumsum).
    sr, hop = 44100, 512
    rng = np.random.default_rng(1)
    b, t, h = 1, 172, 180
    f0 = rng.uniform(200.0, 800.0, (b, t, 1)).astype(np.float32)
    amps = rng.uniform(0.01, 1.0, (b, t, h)).astype(np.float32)
    loud = rng.uniform(0.0, 1.0, (b, t, 1)).astype(np.float32)
    truth = _reference_render_f64(reference_path, f0, amps, loud, sr, hop)
    ref_f32 = _reference_render(reference_path, f0, amps, loud, sr, hop)
    got, _ = oscillator_bank(f0, amps, loud, sample_rate=sr, hop=hop)
    ours_snr = snr(truth, np.asarray(got))
    ref_snr = snr(truth, ref_f32)
    assert ours_snr > 40.0, (ours_snr, ref_snr)
    assert ours_snr > ref_snr - 3.0, (ours_snr, ref_snr)


def test_frame_chunk_equivalence():
    sr, hop = 16000, 16
    f0, amps, loud = _make_controls(t=24, sr=sr)
    full, pf = oscillator_bank(f0, amps, loud, sample_rate=sr, hop=hop)
    chunked, pc = oscillator_bank(
        f0, amps, loud, sample_rate=sr, hop=hop, frame_chunk=8
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pc), atol=1e-6)


def test_streaming_split_equals_offline(snr):
    """Rendering in two halves with carried phase + real neighbor context
    must equal the offline render (the reference's live() path can only
    approximate this; ours is exact by construction)."""
    sr, hop = 16000, 32
    f0, amps, loud = _make_controls(b=1, t=20, sr=sr)

    full, _ = oscillator_bank(f0, amps, loud, sample_rate=sr, hop=hop)

    def pad_window(x, lo, hi, t):
        # frames [lo-1, hi+1) with edge clamp at the global sequence ends
        lo_i, hi_i = max(lo - 1, 0), min(hi + 1, t)
        left = x[:, :1] if lo == 0 else x[:, lo - 1 : lo]
        right = x[:, -1:] if hi == t else x[:, hi : hi + 1]
        return np.concatenate([left, x[:, lo:hi], right], axis=1)

    t = f0.shape[1]
    mid = 11
    outs = []
    phase = None
    for lo, hi in [(0, mid), (mid, t)]:
        audio, phase = render_padded(
            pad_window(f0, lo, hi, t),
            pad_window(amps, lo, hi, t),
            pad_window(loud, lo, hi, t),
            sample_rate=sr,
            hop=hop,
            initial_phase=phase,
        )
        outs.append(np.asarray(audio))
    stitched = np.concatenate(outs, axis=1)
    assert snr(np.asarray(full), stitched) > 80.0  # f32 round-off only


def test_nyquist_culling():
    sr, hop = 8000, 16
    b, t, h = 1, 32, 10
    # bin-aligned f0 (60 * 8000/512) so spectral leakage is negligible;
    # harmonics 5..10 exceed the 4 kHz Nyquist and must be culled.
    f0 = np.full((b, t, 1), 937.5, np.float32)
    amps = np.ones((b, t, h), np.float32)
    loud = np.ones((b, t, 1), np.float32)
    audio, _ = oscillator_bank(f0, amps, loud, sample_rate=sr, hop=hop)
    # Culled harmonics would alias to 3312.5 / 2375 / 500 Hz etc.
    spec = np.abs(np.fft.rfft(np.asarray(audio)[0]))
    freqs = np.fft.rfftfreq(t * hop, 1 / sr)

    def peak(f):
        return spec[np.abs(freqs - f) < 30].max()

    kept = min(peak(937.5), peak(1875), peak(2812.5), peak(3750))
    aliased = max(peak(3312.5), peak(2375), peak(500))
    assert aliased < 0.05 * kept


def test_gradients_finite():
    import jax

    sr, hop = 16000, 16
    f0, amps, loud = _make_controls(b=1, t=8, h=8, sr=sr)

    def loss(a, l, f):
        audio, _ = oscillator_bank(f, a, l, sample_rate=sr, hop=hop)
        return (audio**2).mean()

    g = jax.grad(loss, argnums=(0, 1, 2))(amps, loud, f0)
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
