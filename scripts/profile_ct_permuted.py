"""A/B: permuted-spectrum CT convolution vs the round-4 packed/hermitian path.

Round-4 established the reverb-class CT convolution runs ~2.5x over its
MAC bound on proportional twiddle + pack/unpack data movement
(docs/PERFORMANCE.md).  The round-5 rework (ops/fft.py) removes the two
structural data-movement terms ALGEBRAICALLY:

* permuted-spectrum four-step CT: spectra stay in (n1, n2) layout, the
  inverse is built from the factorization directly -- no output
  de-interleave transposes, no hermitian extension;
* shared-kernel packing: conv(x + j y, k) = conv(x, k) + j conv(y, k),
  so the old separate -> multiply -> repack (two full-spectrum reversals
  + ~30 elementwise ops per row pair) collapses to ONE complex multiply.

This interleaves old and new in one run at the training shape
(B=16, L=88064, K=44100) and the 60 s render shape (B=1, L=2646016):
forward convolution and fwd+bwd (grad wrt signal and kernel), plus the
full reverb stage through models/synths.reverb_apply for the record.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_ct_permuted.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from profile_stages import marginal_time

from ddsp_tpu.ops.fft import (
    _overlap_save_plan,
    _rfft_convolve_large_packed,
    _rfft_convolve_large_shared,
    next_fft_size,
)


def make_convolve(impl, length, kernel_len):
    """Causal truncated convolution via overlap-save with the given
    large-conv implementation ('old' = round-4 packed/hermitian,
    'new' = permuted-spectrum shared-kernel)."""
    k = _overlap_save_plan(length, kernel_len)
    c = -(-length // k)
    m = next_fft_size(c + kernel_len - 1)
    halo = kernel_len - 1
    inner = (
        _rfft_convolve_large_packed
        if impl == "old"
        else _rfft_convolve_large_shared
    )

    def convolve(signal, kernel):
        b = signal.shape[0]
        total = halo + (k - 1) * c + m
        padded = jnp.pad(signal, ((0, 0), (halo, total - halo - length)))
        blocks = jnp.stack(
            [padded[:, i * c : i * c + m] for i in range(k)], axis=1
        ).reshape(b * k, m)
        conv = inner(blocks, kernel, kernel_len, m, None)
        valid = conv[:, halo : halo + c].reshape(b, k * c)
        return valid[:, :length]

    return convolve, k, m


def main():
    rng = np.random.default_rng(0)
    for b, length, kernel_len, tag in (
        (16, 88064, 44100, "train-shape"),
        (1, 2646016, 44100, "60s-render"),
    ):
        sig = jnp.asarray(
            0.1 * rng.standard_normal((b, length)).astype(np.float32)
        )
        ker = jnp.asarray(
            (
                rng.standard_normal((1, kernel_len))
                * np.exp(-np.arange(kernel_len) / 8000)
            ).astype(np.float32)
        )
        x0 = {"sig": sig, "ker": ker}
        fns = {}
        for impl in ("old", "new"):
            conv, k, m = make_convolve(impl, length, kernel_len)
            if impl == "old" and (b * k) % 2:
                conv_old_shape = None  # odd rows: old path had no packed form

            def fwd(x, conv=conv):
                return jnp.sum(jnp.sin(conv(x["sig"], x["ker"])))

            def fwdbwd(x, conv=conv):
                def loss(s, kk):
                    return jnp.sum(jnp.sin(conv(s, kk)))

                l, (gs, gk) = jax.value_and_grad(loss, argnums=(0, 1))(
                    x["sig"], x["ker"]
                )
                return l + jnp.sum(gs) + jnp.sum(gk)

            fns[impl] = (fwd, fwdbwd)
        print(f"[{tag}] plan k={k} m={m}", flush=True)
        # interleaved: old fwd, new fwd, old fwdbwd, new fwdbwd
        for label, idx in (("fwd", 0), ("fwd+bwd", 1)):
            for impl in ("old", "new"):
                if (b * _overlap_save_plan(length, kernel_len)) % 2 and impl == "old":
                    print(f"  {impl} {label}: skipped (odd rows)", flush=True)
                    continue
                t = marginal_time(fns[impl][idx], x0)
                print(f"  {impl} {label:8s} {t * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
