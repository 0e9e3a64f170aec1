"""Measured fwd+bwd device time per train-step stage vs its roofline term.

The composed whole-step bound (utils/roofline.train_step_bound_s, round-3
VERDICT #4) says where a 9 ms step *could* be ~4.9 ms; this measures each
stage's value_and_grad in isolation at the production train shapes and
prints measured vs bound so the worst absolute gap is explicit.

All timings are tunnel-safe marginal chains (CLAUDE.md); stages are
measured interleaved in one run (ambient-band rule).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train_stages.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.config import Config
    from ddsp_tpu.losses import mss_loss
    from ddsp_tpu.models.controller import controller_apply, decoder_init
    from ddsp_tpu.models.synths import noise_apply, oscillator_apply, reverb_apply
    from ddsp_tpu.training.trainer import (
        init_state,
        make_optimizer,
        make_train_step,
    )
    from ddsp_tpu.utils.profiling import marginal_chain_time
    from ddsp_tpu.utils.roofline import train_step_bound_s

    conf = Config()
    b, t = conf.batch_size, conf.frames_per_example
    rng = np.random.default_rng(0)
    batch = {
        "f0": jnp.asarray(rng.uniform(100, 600, (b, t, 1)).astype(np.float32)),
        "normalized_cents": jnp.asarray(
            rng.uniform(0, 1, (b, t, 1)).astype(np.float32)
        ),
        "loudness": jnp.asarray(rng.uniform(0, 1, (b, t, 1)).astype(np.float32)),
    }
    params = decoder_init(jax.random.PRNGKey(0), conf)
    key = jax.random.PRNGKey(1)
    controls, _ = jax.jit(lambda p, bt: controller_apply(p, bt))(
        params["controller"], batch
    )
    controls = {k: jax.device_get(v) for k, v in controls.items()}
    controls = {k: jnp.asarray(v) for k, v in controls.items()}
    audio = jnp.asarray(
        (0.1 * rng.standard_normal((b, conf.example_length))).astype(np.float32)
    )

    def grad_chain(loss_of, x0_example):
        """Chain grads of ``loss_of`` (x -> scalar) through x."""

        def make_many(iters):
            @jax.jit
            def many(x):
                def body(carry, i):
                    g = jax.grad(loss_of)(carry)
                    return jax.tree.map(
                        lambda a, ga: a + 1e-12 * ga, carry, g
                    ), None

                final, _ = jax.lax.scan(body, x, jnp.arange(iters))
                return jnp.sum(jax.tree.leaves(final)[0])

            return many

        def args_for_trial(trial):
            return (
                jax.tree.map(
                    lambda a: a * (1.0 + 1e-6 * trial), x0_example
                ),
            )

        return marginal_chain_time(make_many, args_for_trial)

    measured = {}

    # controller fwd+bwd wrt its params (batch fixed)
    measured["controller_mxu"] = grad_chain(
        lambda p: jnp.sum(controller_apply(p, batch)[0]["c"] ** 2),
        params["controller"],
    )

    # oscillator fwd+bwd wrt controls (the kernel pair)
    measured["oscillator_fill_contract"] = grad_chain(
        lambda cs: jnp.sum(oscillator_apply(cs, conf)[0] ** 2),
        {k: controls[k] for k in ("f0", "c", "a")},
    )

    # noise FIR fwd+bwd wrt filter mags
    measured["noise_fir_mxu"] = grad_chain(
        lambda cs: jnp.sum(noise_apply(cs, conf, key) ** 2),
        {"H": controls["H"]},
    )

    # reverb fwd+bwd wrt (params, signal)
    measured["reverb_fft_mxu"] = grad_chain(
        lambda px: jnp.sum(reverb_apply(px[0], px[1], conf) ** 2),
        (params["reverb"], audio),
    )

    # MSS loss fwd+bwd wrt pred
    dtype = jnp.bfloat16 if conf.loss_matmul_dtype == "bfloat16" else None
    measured["mss_loss_mxu"] = grad_chain(
        lambda x: mss_loss(
            x, audio, conf.mss_ffts, conf.mss_alpha, conf.mss_overlap,
            matmul_dtype=dtype,
        ),
        audio,
    )

    # Adam update alone on frozen grads
    tx = make_optimizer(conf)
    state0 = init_state(jax.random.PRNGKey(0), conf)
    fixed_grads = jax.tree.map(lambda a: jnp.full_like(a, 1e-4), state0.params)

    def make_adam_many(iters):
        import optax

        @jax.jit
        def many(params, opt_state):
            def body(carry, i):
                p, os_ = carry
                updates, os_ = tx.update(
                    fixed_grads, os_, p, value=jnp.float32(1.0)
                )
                return (optax.apply_updates(p, updates), os_), None

            (p, _), _ = jax.lax.scan(
                body, (params, opt_state), jnp.arange(iters)
            )
            return jnp.sum(jax.tree.leaves(p)[0])

        return many

    measured["adam_hbm"] = marginal_chain_time(
        make_adam_many,
        lambda trial: (
            jax.tree.map(lambda a: a * (1.0 + 1e-6 * trial), state0.params),
            state0.opt_state,
        ),
    )

    # the full step, for the composed comparison
    step = make_train_step(conf)
    tb = dict(batch, audio=audio)

    def make_step_many(iters):
        @jax.jit
        def many(state, eps):
            def body(carry, i):
                bb = dict(tb, loudness=tb["loudness"] + eps * 1e-12)
                s2, m = step(carry, bb)
                return s2, m["loss"]

            s, losses = jax.lax.scan(body, state, jnp.arange(iters))
            return losses[-1]

        return many

    measured["full_step"] = marginal_chain_time(
        make_step_many, lambda trial: (state0, jnp.float32(trial + 1))
    )

    bound_s, breakdown = train_step_bound_s(conf, b)
    # the measured controller chain includes the GRU's serial latency; fold
    # the two bound terms together for the comparison
    bounds = dict(breakdown)
    bounds["controller_mxu"] += bounds.pop("gru_serial_latency")
    print(f"\n{'stage':26s} {'measured':>10s} {'bound':>10s} {'gap':>9s} {'m/b':>6s}")
    total_meas = 0.0
    for k, bnd in bounds.items():
        m = measured[k]
        total_meas += m
        print(
            f"{k:26s} {1e3*m:9.3f}m {1e3*bnd:9.3f}m {1e3*(m-bnd):8.3f}m"
            f" {m/bnd:6.2f}"
        )
    print(f"{'sum of stages':26s} {1e3*total_meas:9.3f}m {1e3*bound_s:9.3f}m")
    print(
        f"{'full step':26s} {1e3*measured['full_step']:9.3f}m"
        f" {1e3*bound_s:9.3f}m  frac {bound_s/measured['full_step']:.3f}"
    )
    glue = measured["full_step"] - total_meas
    print(f"{'step minus stage sum':26s} {1e3*glue:9.3f}m  (glue / re-fusion)")
    # A near-zero/negative stage marginal is physically impossible for a
    # real chain -- it is the tunnel's documented spurious-early-completion
    # mode hitting that chain (CLAUDE.md).  Flag it: the run's glue number
    # is then mis-attributed and the run should be repeated.
    suspect = [k for k, m in measured.items() if k != "full_step" and m < 5e-5]
    if suspect:
        print(
            f"SUSPECT RUN: stage chains {suspect} returned ~0 marginal "
            "(tunnel spurious-completion); repeat before trusting the "
            "attribution"
        )


if __name__ == "__main__":
    main()
