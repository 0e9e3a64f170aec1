"""A/B forced overlap-save chunk counts for the training-shape reverb conv.

The plan (ops/fft._overlap_save_plan) minimizes matmul-FFT MACs, but the
measured reverb conv runs >2x its MAC bound -- the Cooley-Tukey path's
twiddle multiplies and pack/unpack movement scale with total transform
POINTS (k*m), which smaller-m plans reduce even when their MAC count is
higher.  This forces k in {1,2,3,4,6,8} at (B=16, L=88064, K=44100) and
measures forward and fwd+bwd, interleaved in one run.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_reverb_chunks.py
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
    _fft_row_cost,
    _rfft_convolve_overlap_save,
    next_fft_size,
)

B, L, K = 16, 88064, 44100


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray((0.1 * rng.standard_normal((B, L))).astype(np.float32))
    ker = jnp.asarray(
        (0.01 * rng.standard_normal((1, K))).astype(np.float32)
    )

    for k in (1, 2, 3, 4, 6, 8):
        m = next_fft_size(-(-L // k) + K - 1)
        macs = k * _fft_row_cost(m)

        def fwd(x, k=k):
            return jnp.sum(_rfft_convolve_overlap_save(x, ker, K, k))

        def fwdbwd(x, k=k):
            def loss(x, h):
                y = _rfft_convolve_overlap_save(x, h, K, k)
                return jnp.sum(y * jnp.sin(y))

            l, (gx, gh) = jax.value_and_grad(loss, argnums=(0, 1))(x, ker)
            return l + jnp.sum(gx) + jnp.sum(gh)

        t_f = marginal_time(fwd, x)
        t_fb = marginal_time(fwdbwd, x)
        print(
            f"k={k}  m={m:7d}  relMACs={macs/1e9:6.2f}G  "
            f"fwd {t_f*1e3:6.3f} ms   fwd+bwd {t_fb*1e3:6.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
