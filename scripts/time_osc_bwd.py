"""Quick chained-scan device timing of oscillator fwd+bwd at train shape."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import controller_apply, decoder_init
from ddsp_tpu.models.synths import oscillator_apply


def main():
    conf = Config()
    b, t = 16, conf.frames_per_example
    rng = np.random.default_rng(0)
    batch = {
        "f0": jnp.asarray(rng.uniform(100, 600, (b, t, 1)).astype(np.float32)),
        "normalized_cents": jnp.asarray(
            rng.uniform(0, 1, (b, t, 1)).astype(np.float32)
        ),
        "loudness": jnp.asarray(rng.uniform(0, 1, (b, t, 1)).astype(np.float32)),
    }
    params = decoder_init(jax.random.PRNGKey(0), conf)
    controls, _ = jax.jit(lambda p, bt: controller_apply(p, bt))(
        params["controller"], batch
    )
    controls = jax.block_until_ready(controls)

    def f(cs):
        out, _ = oscillator_apply(cs, conf)
        return jnp.sum(out * out)

    def make_run(iters):
        @jax.jit
        def run(cs):
            def body(c, _):
                cs, acc = c
                v, g = jax.value_and_grad(f)(cs)
                cs = jax.tree.map(lambda a, da: a + 1e-30 * da, cs, g)
                return (cs, acc + v), None

            (_, acc), _ = jax.lax.scan(body, (cs, 0.0), None, length=iters)
            return acc

        return run

    lo, hi = 4, 12
    runs = {}
    for n in (lo, hi):
        t0 = time.time()
        runs[n] = make_run(n)
        float(runs[n](controls))
        print(f"compile+warm n={n}: {time.time()-t0:.1f}s", flush=True)
    per = []
    for trial in range(4):
        cs = jax.tree.map(
            lambda a: a.at[(0,) * a.ndim].set(0.25 + 0.125 * trial), controls
        )
        jax.block_until_ready(cs)
        ts = {}
        for n in (lo, hi):
            t0 = time.perf_counter()
            float(runs[n](cs))
            ts[n] = time.perf_counter() - t0
        per.append((ts[hi] - ts[lo]) / (hi - lo))
        print(f"trial {trial}: {per[-1]*1e3:.3f} ms", flush=True)
    print(f"osc fwd+bwd median(last 3): {np.median(per[1:])*1e3:.3f} ms")


if __name__ == "__main__":
    main()
