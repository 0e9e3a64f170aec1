"""Pallas fused oscillator: interpreter-mode equivalence vs the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_tpu.ops.oscillator import oscillator_bank
from ddsp_tpu.ops.pallas.oscillator import oscillator_bank_pallas


def _controls(b=2, t=8, h=20, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    f0 = rng.uniform(80.0, 600.0, (b, t, 1)).astype(np.float32)
    amps = rng.uniform(0.01, 1.0, (b, t, h)).astype(np.float32)
    loud = rng.uniform(0.0, 1.0, (b, t, 1)).astype(np.float32)
    return f0, amps, loud


@pytest.fixture(autouse=True)
def _interpret_mode():
    """CPU tests run the kernel through the Pallas interpreter."""
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() == "cpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("hop", [128, 512])
def test_matches_xla_path(snr, hop):
    sr = 16000
    f0, amps, loud = _controls(t=8, sr=sr)
    want, wphase = oscillator_bank(f0, amps, loud, sample_rate=sr, hop=hop)
    got, gphase = oscillator_bank_pallas(f0, amps, loud, sample_rate=sr, hop=hop)
    assert got.shape == want.shape
    assert snr(np.asarray(want), np.asarray(got)) > 80.0
    np.testing.assert_allclose(np.asarray(gphase), np.asarray(wphase), atol=1e-6)


def test_odd_frame_count_falls_back():
    """T not divisible by frames_per_block: block size degrades gracefully."""
    sr, hop = 16000, 64
    f0, amps, loud = _controls(t=7, sr=sr)
    got, _ = oscillator_bank_pallas(
        f0, amps, loud, sample_rate=sr, hop=hop, frames_per_block=4
    )
    want, _ = oscillator_bank(f0, amps, loud, sample_rate=sr, hop=hop)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_gradients_match_xla(snr):
    sr, hop = 16000, 64
    f0, amps, loud = _controls(b=1, t=4, h=12, sr=sr)

    def loss_pallas(a, l, f):
        audio, _ = oscillator_bank_pallas(f, a, l, sample_rate=sr, hop=hop)
        return jnp.sum(audio**2)

    def loss_xla(a, l, f):
        audio, _ = oscillator_bank(f, a, l, sample_rate=sr, hop=hop)
        return jnp.sum(audio**2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(amps, loud, f0)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(amps, loud, f0)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_banked2_variants_match_banked(snr):
    """The round-3 window-row kernels (banked2: (ft+2)-row contraction, rot
    or cheb8 fill, optional K-chunking) must reproduce the round-2 banked
    kernel in both directions -- they are reschedulings of the same math."""
    from ddsp_tpu.ops.pallas.oscillator import _pallas_backward, _pallas_forward

    rng = np.random.default_rng(3)
    b, t, hop, h = 2, 18, 128, 40  # t not divisible by ft: exercises padding
    phase = jnp.asarray(rng.uniform(0, 1, (b, t, hop)).astype(np.float32))
    amps = jnp.asarray(rng.uniform(0, 1, (b, t + 2, h)).astype(np.float32) / h)
    loud = jnp.asarray(rng.uniform(0, 1, (b, t + 2)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, t * hop)).astype(np.float32))

    want = np.asarray(_pallas_forward(phase, amps, loud, 4, impl="banked"))
    for kw in (
        dict(fill="rot"),
        dict(fill="cheb8", resync_tiles=4),
        dict(fill="rot", k_chunk=16),
        dict(fill="rot4"),  # round-4 log-depth batched-seed fill
    ):
        got = np.asarray(
            _pallas_forward(phase, amps, loud, 4, impl="banked2", **kw)
        )
        assert snr(want, got) > 90.0, kw
        got16 = np.asarray(
            _pallas_forward(phase, amps, loud, 16, impl="banked2", **kw)
        )
        assert snr(want, got16) > 90.0, kw

    wb = _pallas_backward(phase, amps, loud, g, 4, impl="banked")
    for fpb, fill in ((4, "rot"), (16, "rot"), (16, "rot4")):
        gb = _pallas_backward(
            phase, amps, loud, g, fpb, impl="banked2", fill=fill
        )
        for name, a, c in zip(("dphase", "damps", "dloud"), wb, gb):
            a, c = np.asarray(a), np.asarray(c)
            assert a.shape == c.shape, (name, fpb, fill)
            assert snr(a, c) > 90.0, (name, fpb, fill)


def test_slot_hop_kernel_matches_xla(snr):
    """pallas_render_hop_slots (serving: N independent slots on the frame
    axis, each with its own prev/cur/next context) == the XLA per-slot
    t=1 render."""
    from ddsp_tpu.ops.oscillator import _render_from_phase
    from ddsp_tpu.ops.pallas.oscillator import pallas_render_hop_slots

    rng = np.random.default_rng(9)
    n, hop, h = 13, 128, 40  # n not a multiple of ft: exercises padding
    phase = jnp.asarray(rng.uniform(0, 1, (n, 1, hop)).astype(np.float32))
    l, m, r = (
        jnp.asarray(rng.uniform(0, 1, (n, h)).astype(np.float32) / h)
        for _ in range(3)
    )
    ll, lm, lr = (
        jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
        for _ in range(3)
    )
    want = np.asarray(
        _render_from_phase(
            phase,
            jnp.stack([l, m, r], axis=1),  # (N, 3, H) window rows
            jnp.stack([ll, lm, lr], axis=1),  # (N, 3)
            h,
        )
    )  # (N, hop)
    got = np.asarray(
        pallas_render_hop_slots(
            phase.reshape(1, n, hop),
            l[None], m[None], r[None],
            ll[None], lm[None], lr[None],
        )
    ).reshape(n, hop)
    assert snr(want, got) > 90.0
