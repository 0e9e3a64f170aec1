"""CREPE: golden test vs the reference torch model with shipped tiny weights."""

import os

import numpy as np
import pytest
import torch

import jax

from ddsp_tpu.models.crepe import (
    crepe_forward,
    crepe_activation,
    load_torch_checkpoint,
    pitch_argmax,
    pitch_weighted,
    cents_map,
    freq_map,
)
from ddsp_tpu.models import nn

TINY = "/root/reference/crepe/pretrained/tiny.pth"


@pytest.fixture(scope="module")
def tiny_params():
    if not os.path.exists(TINY):
        pytest.skip("tiny.pth not available")
    return load_torch_checkpoint(TINY)


@pytest.fixture(scope="module")
def torch_tiny(reference_path):
    from crepe.crepe import Crepe

    model = Crepe("tiny")
    model.load_state_dict(torch.load(TINY, weights_only=True))
    return model.eval()


def test_param_count(tiny_params):
    """Converted pytree must carry every checkpoint tensor except the
    integer num_batches_tracked counters (inference-irrelevant)."""
    import torch as _torch

    sd = _torch.load(TINY, weights_only=True)
    want = sum(
        v.numel() for k, v in sd.items() if "num_batches_tracked" not in k
    )
    assert nn.count_params(tiny_params) == want


def test_forward_matches_reference(reference_path, tiny_params, torch_tiny):
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((8, 1024)).astype(np.float32)
    got = np.asarray(crepe_forward(tiny_params, frames))
    with torch.no_grad():
        want = torch_tiny(torch.from_numpy(frames)).numpy()
    assert got.shape == want.shape == (8, 360)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # argmax bins must agree exactly for pitch decoding parity
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_embed_matches_reference(reference_path, tiny_params, torch_tiny):
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((4, 1024)).astype(np.float32)
    got = np.asarray(crepe_forward(tiny_params, frames, embed=True))
    with torch.no_grad():
        want = torch_tiny(torch.from_numpy(frames), embed=True).numpy()
    np.testing.assert_allclose(got, want[..., 0], rtol=1e-3, atol=1e-4)


def test_activation_layers(tiny_params):
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((2, 1024)).astype(np.float32)
    shapes = []
    for layer in range(6):
        act = crepe_activation(tiny_params, frames, layer)
        shapes.append(act.shape)
        assert np.all(np.isfinite(np.asarray(act)))
    assert shapes[0] == (2, 128, 128)
    assert shapes[5] == (2, 64, 4)


def test_full_capacity_converter_matches_reference(reference_path, tmp_path):
    """'full' capacity (in_features=2048, 1024-ch first conv) must convert and
    match the torch reference forward.  full.pth itself is stripped from the
    reference (.MISSING_LARGE_BLOBS), so a random-init state dict stands in --
    this validates the converter + conv stack at full shapes (SURVEY.md
    'pretrained-asset contract')."""
    from crepe.crepe import Crepe

    torch.manual_seed(0)
    model = Crepe("full").eval()
    path = tmp_path / "full_random.pth"
    torch.save(model.state_dict(), path)
    params = load_torch_checkpoint(str(path))

    sd = model.state_dict()
    want_n = sum(
        v.numel() for k, v in sd.items() if "num_batches_tracked" not in k
    )
    assert nn.count_params(params) == want_n

    rng = np.random.default_rng(4)
    frames = rng.standard_normal((4, 1024)).astype(np.float32)
    got = np.asarray(crepe_forward(params, frames))
    with torch.no_grad():
        want = model(torch.from_numpy(frames)).numpy()
    assert got.shape == want.shape == (4, 360)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pitch_decode_maps():
    assert abs(float(cents_map(0.0)) - 1997.3794084376191) < 1e-9
    # bin->cents->freq: C1 (32.7 Hz) is near bin 0
    assert 30.0 < float(freq_map(cents_map(0.0))) < 35.0
    probs = np.zeros((1, 3, 360), np.float32)
    probs[0, :, 100] = 0.9
    f, h, nc = pitch_argmax(probs)
    assert np.allclose(np.asarray(h), 0.9)
    assert np.allclose(np.asarray(nc), 100 / 359.0)
    f2, h2, nc2 = pitch_weighted(probs)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2), rtol=1e-5)


def _reference_pitch_decoder(reference_path):
    """Import the reference F0Encoder's pitch decode methods.

    The reference encoder module imports librosa/torchaudio at module level
    but the pitch_* methods never touch them, so missing packages are
    stubbed; the decode code under test is the genuine reference code.
    """
    import importlib
    import sys
    import types

    stubbed = []
    for name in ("librosa", "torchaudio", "torchaudio.transforms"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    if not hasattr(sys.modules["torchaudio"], "transforms"):
        sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    if not hasattr(sys.modules["torchaudio.transforms"], "Resample"):
        sys.modules["torchaudio.transforms"].Resample = object
    for fn in ("A_weighting", "fft_frequencies"):
        if not hasattr(sys.modules["librosa"], fn):
            setattr(sys.modules["librosa"], fn, lambda *a, **k: None)
    try:
        enc_mod = importlib.import_module("model.autoencoder.encoder")
    finally:
        # Drop the spec-less stubs: leaked, they make importlib.find_spec
        # raise ValueError for later tests probing optional backends
        # (observed: test_read_audio_dispatch failing suite-wide only).
        for name in stubbed:
            del sys.modules[name]

    class Dummy:
        cents_map = staticmethod(enc_mod.F0Encoder.cents_map)
        freq_map = staticmethod(enc_mod.F0Encoder.freq_map)
        min_cents = enc_mod.F0Encoder.cents_map(0)
        max_cents = enc_mod.F0Encoder.cents_map(359)

        def normalize_cents(self, cents):
            return (cents - self.min_cents) / (self.max_cents - self.min_cents)

        pitch_weighted = enc_mod.F0Encoder.pitch_weighted
        pitch_centered = enc_mod.F0Encoder.pitch_centered

    return Dummy()


def test_pitch_centered_ref_matches_reference_bitwise(reference_path):
    """pitch_centered_ref is the bug-compatible replica: it must match the
    reference's pitch_weighted/pitch_centered to float32 noise, INCLUDING
    the index-pairing bug (encoder.py:96-110 pairs each probability with
    the wrong offset's cents via negative-index assignment order)."""
    from ddsp_tpu.models.crepe import pitch_centered_ref

    d = _reference_pitch_decoder(reference_path)
    rng = np.random.default_rng(3)
    probs = rng.uniform(0, 1, (2, 5, 360)).astype(np.float32)
    with torch.no_grad():
        rf, rh, rnc = d.pitch_weighted(torch.from_numpy(probs))
    fc, hc, ncc = pitch_centered_ref(probs)
    np.testing.assert_allclose(np.asarray(fc), rf.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hc), rh.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ncc), rnc.numpy(), atol=1e-6)


def test_pitch_weighted_fixes_reference_pairing_bug(reference_path):
    """pitch_weighted implements the evident intent.  Two checks: (a) it
    matches a numpy oracle of the intended +-4-bin weighted average; (b) it
    genuinely DIFFERS from the reference's buggy pairing on asymmetric
    probabilities (if they agreed, the 'fix' would be fiction)."""
    d = _reference_pitch_decoder(reference_path)
    rng = np.random.default_rng(3)
    probs = rng.uniform(0, 1, (2, 5, 360)).astype(np.float32)

    # (a) intended-semantics oracle
    center = probs.argmax(-1)
    padded = np.pad(probs, ((0, 0), (0, 0), (4, 4)))
    want_f = np.zeros_like(center, np.float64)
    for b in range(probs.shape[0]):
        for t in range(probs.shape[1]):
            c = center[b, t]
            offs = np.arange(-4, 5)
            vals = padded[b, t, c + offs + 4]
            cents = (c + offs) * 20.0 + 1997.3794084376191
            want_f[b, t] = 10 * 2 ** ((vals @ cents / vals.sum()) / 1200)
    f, _, _ = pitch_weighted(probs)
    np.testing.assert_allclose(np.asarray(f)[..., 0], want_f, rtol=1e-4)

    # (b) the buggy reference decode must disagree measurably
    with torch.no_grad():
        rf, _, _ = d.pitch_weighted(torch.from_numpy(probs))
    rel = np.abs(np.asarray(f) - rf.numpy()) / np.abs(rf.numpy())
    assert rel.max() > 1e-3, "reference pairing bug not observable?"


def test_nlc_layout_matches_nch():
    """The channels-last stack + space-to-depth first conv (round 4) is a
    pure relayout: forward probabilities and embed features must match the
    torch-shaped NCH path to float32 reassociation noise."""
    from ddsp_tpu.models.crepe import crepe_forward, crepe_init

    params = crepe_init(jax.random.PRNGKey(5), capacity="tiny")
    rng = np.random.default_rng(6)
    import jax.numpy as jnp
    frames = jnp.asarray(rng.standard_normal((4, 1024)).astype(np.float32))
    for embed in (False, True):
        a = np.asarray(crepe_forward(params, frames, embed=embed, layout="nlc"))
        b = np.asarray(crepe_forward(params, frames, embed=embed, layout="nch"))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
