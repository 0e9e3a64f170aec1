"""Per-stage value+grad timing on the real chip (marginal chained method)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.losses import mss_loss
from ddsp_tpu.models.controller import controller_apply, decoder_init
from ddsp_tpu.models.synths import noise_apply, oscillator_apply, reverb_apply
from scripts.profile_stages import marginal_time


def main():
    conf = Config()
    b, t = 16, conf.frames_per_example
    rng = np.random.default_rng(0)
    batch = {
        "f0": jnp.asarray(rng.uniform(100, 600, (b, t, 1)).astype(np.float32)),
        "normalized_cents": jnp.asarray(rng.uniform(0, 1, (b, t, 1)).astype(np.float32)),
        "loudness": jnp.asarray(rng.uniform(0, 1, (b, t, 1)).astype(np.float32)),
    }
    params = decoder_init(jax.random.PRNGKey(0), conf)
    key = jax.random.PRNGKey(1)
    controls, _ = jax.jit(lambda p, bt: controller_apply(p, bt))(
        params["controller"], batch
    )
    audio = jnp.asarray(
        (0.1 * rng.standard_normal((b, conf.example_length))).astype(np.float32)
    )

    def rec(name, fn, x0):
        print(f"{name:18s} {marginal_time(fn, x0)*1e3:8.3f} ms", flush=True)

    # osc fwd+bwd
    def osc_vg(cs):
        def f(cs):
            out, _ = oscillator_apply(cs, conf)
            return jnp.sum(out * out)
        v, g = jax.value_and_grad(f)(cs)
        return v + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    rec("osc_fwd+bwd", osc_vg, controls)

    # mss fwd+bwd (bf16 + f32)
    for name, dt in (("mss_fwd+bwd_bf16", jnp.bfloat16), ("mss_fwd+bwd_f32", None)):
        def loss_vg(x, dt=dt):
            def f(x):
                return mss_loss(x, audio, conf.mss_ffts, conf.mss_alpha,
                                conf.mss_overlap, matmul_dtype=dt)
            v, g = jax.value_and_grad(f)(x)
            return v + jnp.sum(g)

        rec(name, loss_vg, audio)

    # reverb fwd+bwd (wrt signal and params)
    def reverb_vg(x):
        def f(x, rp):
            return jnp.sum(reverb_apply(rp, x, conf) ** 2)
        v, g = jax.value_and_grad(f, argnums=(0, 1))(x, params["reverb"])
        return v + jnp.sum(g[0]) + sum(jnp.sum(l) for l in jax.tree.leaves(g[1]))

    rec("reverb_fwd+bwd", reverb_vg, audio)

    # noise fwd+bwd
    def noise_vg(cs):
        def f(cs):
            return jnp.sum(noise_apply(cs, conf, key) ** 2)
        v, g = jax.value_and_grad(f)(cs)
        return v + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    rec("noise_fwd+bwd", noise_vg, controls)

    # controller fwd+bwd (wrt params)
    def ctrl_vg(bt):
        def f(p):
            c, _ = controller_apply(p, bt)
            return jnp.sum(c["c"] ** 2) + jnp.sum(c["H"] ** 2) + jnp.sum(c["a"] ** 2)
        v, g = jax.value_and_grad(f)(params["controller"])
        return v + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    rec("controller_f+b", ctrl_vg, batch)


if __name__ == "__main__":
    main()
