"""Per-stage device timing on the real chip (tunnel-safe).

Marginal device time = (T_HI - T_LO) / (HI - LO) with HI/LO iterations
chained inside one jit; every iteration's checksum is accumulated into the
returned scalar so no execution can be elided, constant-folded, or served
from the tunnel's identical-execution cache (see CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ddsp_tpu.config import Config
from ddsp_tpu.losses import mss_loss
from ddsp_tpu.models.controller import (
    controller_apply,
    decoder_apply,
    decoder_init,
)
from ddsp_tpu.models.synths import noise_apply, oscillator_apply, reverb_apply
from ddsp_tpu.training.trainer import init_state, make_train_step

LO, HI = 10, 40
TRIALS = 4


def marginal_time(fn, x0, lo=LO, hi=HI):
    """fn: pytree -> scalar checksum.  Returns median marginal s/call."""

    def make_run(iters):
        @jax.jit
        def run(x):
            def body(c, _):
                x, acc = c
                s = fn(x)
                eps = 1e-30 * s
                x = jax.tree.map(
                    lambda a: a + eps
                    if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                    else a,
                    x,
                )
                return (x, acc + s), None

            (_, acc), _ = jax.lax.scan(run_body := body, (x, 0.0), None, length=iters)
            return acc

        return run

    runs = {n: make_run(n) for n in (lo, hi)}
    for n in (lo, hi):
        float(runs[n](x0))  # compile + warm
    per_iter = []
    for trial in range(TRIALS):
        x = jax.tree.map(
            lambda a: a.at[(0,) * a.ndim].set(0.25 + 0.125 * trial)
            if hasattr(a, "ndim") and a.ndim > 0 and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x0,
        )
        jax.block_until_ready(x)
        ts = {}
        for n in (lo, hi):
            t0 = time.perf_counter()
            # float() forces the value INSIDE the timed region -- the
            # tunnel can report spuriously-early completion for repeated
            # runs of one executable even with varied inputs (CLAUDE.md,
            # round-5 diagnosis); the fixed fetch cost cancels in the
            # marginal.
            v = float(runs[n](x))
            ts[n] = time.perf_counter() - t0
            assert np.isfinite(v)
        per_iter.append((ts[hi] - ts[lo]) / (hi - lo))
    return float(np.median(per_iter[1:]))


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

    results = {}

    def record(name, value):
        results[name] = value
        print(f"{name:14s} {value * 1e3:8.3f} ms", flush=True)

    record("controller", marginal_time(
        lambda bt: jnp.sum(controller_apply(params["controller"], bt)[0]["c"]), batch
    ))
    for impl in ("pallas", "xla"):
        cimpl = conf.replace(osc_impl=impl)
        record(f"osc_{impl}", marginal_time(
            lambda cs, cimpl=cimpl: jnp.sum(oscillator_apply(cs, cimpl)[0]), controls
        ))
    record("noise", marginal_time(
        lambda cs: jnp.sum(noise_apply(cs, conf, key)), controls
    ))
    record("reverb", marginal_time(
        lambda x: jnp.sum(reverb_apply(params["reverb"], x, conf)), audio
    ))
    record("forward", marginal_time(
        lambda bt: jnp.sum(decoder_apply(params, bt, conf, key)), batch
    ))
    record("mss_fwd", marginal_time(
        lambda x: mss_loss(x, audio, conf.mss_ffts, conf.mss_alpha, conf.mss_overlap),
        audio,
    ))
    record("mss_fwd_bf16", marginal_time(
        lambda x: mss_loss(
            x, audio, conf.mss_ffts, conf.mss_alpha, conf.mss_overlap,
            matmul_dtype=jnp.bfloat16,
        ),
        audio,
    ))

    # train step chains through state naturally; accumulate the loss metric
    tb = dict(batch)
    tb["audio"] = audio
    step = make_train_step(conf)

    def make_train_run(iters):
        @jax.jit
        def run(state):
            def body(s, _):
                s2, m = step(s, tb)
                return s2, m["loss"]

            _, losses = jax.lax.scan(body, state, None, length=iters)
            return jnp.sum(losses)

        return run

    lo, hi = 5, 20
    runs = {n: make_train_run(n) for n in (lo, hi)}
    state0 = init_state(jax.random.PRNGKey(0), conf)
    for n in (lo, hi):
        float(runs[n](state0))
    per_iter = []
    for trial in range(TRIALS):
        state = init_state(jax.random.PRNGKey(trial + 1), conf)
        jax.block_until_ready(state)
        ts = {}
        for n in (lo, hi):
            t0 = time.perf_counter()
            float(runs[n](state))
            ts[n] = time.perf_counter() - t0
        per_iter.append((ts[hi] - ts[lo]) / (hi - lo))
    record("train_step", float(np.median(per_iter[1:])))


if __name__ == "__main__":
    main()
