"""Decompose the MSS loss's gap to its MAC bound (round-4 VERDICT #2).

Measures, interleaved in one run at production shape (B=16, L=88064,
bf16 STFT matmuls):

* full mss_loss fwd and fwd+bwd (the bench.py quantity),
* per-scale sss_loss fwd+bwd marginals (which scale carries the gap),
* spectrogram-only fwd+bwd (pred+true STFTs, sum readout -- no loss
  elementwise): isolates DFT matmul + framing work,
* loss-elementwise-only: spectrograms precomputed, just the L1 +
  log2 terms and means (the VPU/HBM tail).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_mss.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from profile_stages import marginal_time

from ddsp_tpu.config import Config
from ddsp_tpu.losses import mss_loss, sss_loss
from ddsp_tpu.ops.spectral import spectrogram


def main():
    conf = Config()
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    b, length = 16, conf.example_length
    true = jnp.asarray(0.1 * rng.standard_normal((b, length)), jnp.float32)
    x0 = {
        "pred": jnp.asarray(0.1 * rng.standard_normal((b, length)), jnp.float32),
        "true": true,
    }

    def t(name, fn):
        ms = marginal_time(fn, x0) * 1e3
        print(f"{name:28s} {ms:7.3f} ms", flush=True)
        return ms

    def full_fwd(x):
        return mss_loss(x["pred"], x["true"], conf.mss_ffts, conf.mss_alpha,
                        conf.mss_overlap, matmul_dtype=dtype)

    def full_fwdbwd(x):
        l, g = jax.value_and_grad(
            lambda p: mss_loss(p, x["true"], conf.mss_ffts, conf.mss_alpha,
                               conf.mss_overlap, matmul_dtype=dtype)
        )(x["pred"])
        return l + jnp.sum(g)

    t("full fwd", full_fwd)
    t("full fwd+bwd", full_fwdbwd)

    for n in conf.mss_ffts:
        def scale_fwdbwd(x, n=n):
            l, g = jax.value_and_grad(
                lambda p: sss_loss(p, x["true"], n, conf.mss_alpha,
                                   conf.mss_overlap, matmul_dtype=dtype)
            )(x["pred"])
            return l + jnp.sum(g)

        t(f"scale {n} fwd+bwd", scale_fwdbwd)

    def specs_only_fwdbwd(x):
        def f(p):
            s = 0.0
            for n in conf.mss_ffts:
                hop = int(n * (1 - conf.mss_overlap))
                s += jnp.sum(spectrogram(p, n, hop, matmul_dtype=dtype))
                s += jnp.sum(spectrogram(x["true"], n, hop, matmul_dtype=dtype))
            return s
        l, g = jax.value_and_grad(f)(x["pred"])
        return l + jnp.sum(g)

    t("specs only fwd+bwd", specs_only_fwdbwd)

    # elementwise tail: precompute spectrograms OUTSIDE the timed fn is not
    # possible inside one jit chain; instead time loss-with-specs-recomputed
    # minus specs-only == elementwise marginal (reported implicitly), and
    # also time the pure elementwise on device-resident spectrograms.
    specs = {}
    for n in conf.mss_ffts:
        hop = int(n * (1 - conf.mss_overlap))
        specs[f"p{n}"] = spectrogram(x0["pred"], n, hop, matmul_dtype=dtype)
        specs[f"t{n}"] = spectrogram(x0["true"], n, hop, matmul_dtype=dtype)

    def elementwise_only(x):
        s = 0.0
        for n in conf.mss_ffts:
            sp, st = x[f"p{n}"], x[f"t{n}"]
            s += jnp.mean(jnp.abs(sp - st)) + conf.mss_alpha * jnp.mean(
                jnp.abs(jnp.log2(st + 1e-7) - jnp.log2(sp + 1e-7))
            )
        return s

    ms = marginal_time(elementwise_only, specs) * 1e3
    print(f"{'loss elementwise only fwd':28s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
