"""Sweep the banked2 oscillator-forward variants on the real chip.

Round-2 VERDICT next-step #1: close the oscillator roofline gap (0.37 of
the fill+contract bound).  Candidates (ops/pallas/oscillator.py):

* banked   -- production round-2 kernel: 3ft-row contraction + rotation fill
* banked2  -- (ft+2)-row contraction (amps_l/m/r are shifted views of one
  padded array, so 3ft rows were 2.4x redundant), with either the rotation
  fill ('rot', 6 VPU ops/elt) or the tile-level Chebyshev recurrence fill
  ('cheb8', ~2 ops/elt, exact re-seed every `resync_tiles` tiles), and an
  optional K-chunked fill/contract interleave (`k_chunk` harmonics per
  chunk) to let Mosaic overlap chunk g+1's VPU fill with chunk g's MXU
  contraction.

Prints per-variant device ms (marginal-chain method) and float64-oracle
SNR at production shape.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.ops.pallas.oscillator import _pallas_forward
from ddsp_tpu.utils.profiling import marginal_chain_time

conf = Config()
B, T, HOP, H = 16, conf.frames_per_example, conf.hop_length, conf.n_harmonics
rng = np.random.default_rng(0)
amps = jnp.asarray(rng.uniform(0, 1, (B, T + 2, H)).astype(np.float32) / H)
loud = jnp.asarray(rng.uniform(0, 1, (B, T + 2)).astype(np.float32))
phase0 = jnp.asarray(rng.uniform(0, 1, (B, T, HOP)).astype(np.float32))


def oracle_f64(phase, amps_pad, loud_pad, rows=2):
    """Float64 reference on the first `rows` batch rows."""
    p = np.asarray(phase[:rows], np.float64)  # (r, T, hop) cycles
    a = np.asarray(amps_pad[:rows], np.float64)  # (r, T+2, H)
    l = np.asarray(loud_pad[:rows], np.float64)  # (r, T+2)
    from ddsp_tpu.ops.interp import hop_weights

    w = np.asarray(hop_weights(HOP), np.float64)  # (hop, 3)
    h_idx = np.arange(1, H + 1, dtype=np.float64)
    out = np.zeros((rows, T, HOP))
    for f in range(T):
        mix = (
            w[:, 0][None, :, None] * a[:, f, None, :]
            + w[:, 1][None, :, None] * a[:, f + 1, None, :]
            + w[:, 2][None, :, None] * a[:, f + 2, None, :]
        )  # (r, hop, H)
        lm = (
            w[:, 0][None, :] * l[:, f, None]
            + w[:, 1][None, :] * l[:, f + 1, None]
            + w[:, 2][None, :] * l[:, f + 2, None]
        )  # (r, hop)
        s = np.sin(2 * np.pi * p[:, f, :, None] * h_idx[None, None, :])
        out[:, f] = lm * np.sum(mix * s, axis=-1)
    return out.reshape(rows, T * HOP)


def time_variant(fpb, **kw):
    def make_many(iters):
        @jax.jit
        def many(phase, amps, loud):
            def body(carry, i):
                out = _pallas_forward(carry, amps, loud, fpb, **kw)
                p = carry + 1e-12 * jnp.mean(out)
                return p - jnp.floor(p), None

            final, _ = jax.lax.scan(body, phase, jnp.arange(iters))
            return jnp.sum(final)

        return many

    def trial_args(trial):
        return (
            jnp.asarray(rng.uniform(0, 1, (B, T, HOP)).astype(np.float32)),
            amps,
            loud,
        )

    return marginal_chain_time(make_many, trial_args)


def snr(ref, x):
    return 10 * np.log10(np.sum(ref**2) / max(np.sum((ref - x) ** 2), 1e-30))


def main():
    variants = [
        ("banked fpb4 (base)", 4, dict(impl="banked")),
        ("banked2 rot fpb16", 16, dict(impl="banked2", fill="rot")),
        ("banked2 rot fpb16 DEFAULT", 16,
         dict(impl="banked2", fill="rot",
              precision="__DEFAULT__")),
        ("banked2 rot fpb16 bf16bank", 16,
         dict(impl="banked2", fill="rot", bank_dtype="bfloat16",
              precision="__DEFAULT__")),
        ("banked2 rot fpb8 DEFAULT", 8,
         dict(impl="banked2", fill="rot",
              precision="__DEFAULT__")),
        ("banked2 rot4 fpb16", 16, dict(impl="banked2", fill="rot4")),
        ("banked2 rot4 fpb8", 8, dict(impl="banked2", fill="rot4")),
        ("banked2 rot", 4, dict(impl="banked2", fill="rot")),
        ("banked2 cheb8 r8", 4, dict(impl="banked2", fill="cheb8", resync_tiles=8)),
        ("banked2 cheb8 r23", 4, dict(impl="banked2", fill="cheb8", resync_tiles=23)),
        ("banked2 cheb8 r8 kc64", 4,
         dict(impl="banked2", fill="cheb8", resync_tiles=8, k_chunk=64)),
        ("banked2 cheb8 r8 kc96", 4,
         dict(impl="banked2", fill="cheb8", resync_tiles=8, k_chunk=96)),
        ("banked2 rot kc64", 4, dict(impl="banked2", fill="rot", k_chunk=64)),
        ("banked2 cheb8 r8 fpb16", 16,
         dict(impl="banked2", fill="cheb8", resync_tiles=8)),
        ("banked fpb16", 16, dict(impl="banked")),
    ]
    import jax as _jax
    for _, _, kw in variants:
        if kw.get("precision") == "__DEFAULT__":
            kw["precision"] = _jax.lax.Precision.DEFAULT
    want = oracle_f64(phase0, amps, loud)
    names = sys.argv[1:]
    for name, fpb, kw in variants:
        if names and not any(n in name for n in names):
            continue
        got = np.asarray(
            jax.jit(lambda p, a, l: _pallas_forward(p, a, l, fpb, **kw))(
                phase0, amps, loud
            )
        )[:2]
        acc = snr(want, got)
        dt = time_variant(fpb, **kw)
        print(
            f"{name:28s} {1e3 * dt:7.3f} ms   {acc:7.2f} dB vs f64",
            flush=True,
        )




def time_bwd(fpb, **kw):
    from ddsp_tpu.ops.pallas.oscillator import _pallas_backward

    g0 = jnp.asarray(
        rng.standard_normal((B, T * HOP)).astype(np.float32)
    )

    def make_many(iters):
        @jax.jit
        def many(phase, amps, loud, g):
            def body(carry, i):
                dp, da, dl = _pallas_backward(carry, amps, loud, g, fpb, **kw)
                p = dp - jnp.floor(dp)
                return p, None

            final, _ = jax.lax.scan(body, phase, jnp.arange(iters))
            return jnp.sum(final)

        return many

    def trial_args(trial):
        return (
            jnp.asarray(rng.uniform(0, 1, (B, T, HOP)).astype(np.float32)),
            amps,
            loud,
            g0,
        )

    return marginal_chain_time(make_many, trial_args)


def main_bwd():
    variants = [
        ("bwd banked fpb4 f32 (base)", 4, dict(impl="banked")),
        ("bwd banked2 rot fpb4", 4, dict(impl="banked2", fill="rot")),
        ("bwd banked2 rot fpb16", 16, dict(impl="banked2", fill="rot")),
        ("bwd banked2 rot fpb16 bf16", 16,
         dict(impl="banked2", fill="rot", bank_dtype="bfloat16")),
        ("bwd banked2 rot fpb8 bf16", 8,
         dict(impl="banked2", fill="rot", bank_dtype="bfloat16")),
        ("bwd banked2 rot4 fpb16", 16, dict(impl="banked2", fill="rot4")),
        ("bwd banked2 rot4 fpb8", 8, dict(impl="banked2", fill="rot4")),
    ]
    names = sys.argv[2:]
    for name, fpb, kw in variants:
        if names and not any(n in name for n in names):
            continue
        try:
            dt = time_bwd(fpb, **kw)
        except Exception as e:
            print(f"{name:30s} FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
            continue
        print(f"{name:30s} {1e3 * dt:7.3f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bwd":
        main_bwd()
    else:
        main()
