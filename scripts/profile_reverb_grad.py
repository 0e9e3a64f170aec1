"""A/B the reverb fwd+bwd: f32 autodiff vs the bf16 transpose VJP.

Round-4: the reverb stage measured 1.93 ms fwd+bwd against a 0.76 ms
bound (scripts/profile_train_stages.py).  ops/fir.fft_convolve now has a
hand-written VJP that transposes the bf16-matmul forward
(jax.linear_transpose), tripling the backward DFT matmul rate.  This
measures d(sum(reverb(x)))/dx+params at production shape for both
precisions, interleaved in one run.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_reverb_grad.py
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
from ddsp_tpu.models.synths import reverb_apply, reverb_init


def main():
    conf32 = Config(reverb_grad_matmul_dtype="float32")
    confbf = Config(reverb_grad_matmul_dtype="bfloat16")
    params = reverb_init(jax.random.PRNGKey(0), conf32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (0.1 * rng.standard_normal((16, conf32.example_length))).astype(np.float32)
    )

    results = {}
    for name, conf in (("f32_autodiff", conf32), ("bf16_transpose", confbf)):
        def fwdbwd(x, conf=conf):
            def loss(x, p):
                y = reverb_apply(p, x, conf)
                return jnp.sum(y * jnp.sin(y))

            l, (gx, gp) = jax.value_and_grad(loss, argnums=(0, 1))(x, params)
            return l + jnp.sum(gx) + sum(jnp.sum(v) for v in jax.tree.leaves(gp))

        results[name] = marginal_time(fwdbwd, x)
        print(f"{name:16s} {results[name] * 1e3:7.3f} ms", flush=True)

    def fwd_only(x):
        return jnp.sum(reverb_apply(params, x, conf32))

    results["fwd_only"] = marginal_time(fwd_only, x)
    print(f"{'fwd_only':16s} {results['fwd_only'] * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
