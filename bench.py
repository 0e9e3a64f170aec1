"""Benchmark suite: one JSON line per metric on the real chip.

Each line is {"metric": ..., "value": N, "unit": ..., "vs_baseline": N},
covering every headline row of BASELINE.md (round-1 VERDICT Weak #1 asked
for driver-verifiable evidence beyond the single synth-forward number):

  synth_forward_samples_per_s_per_chip  full decoder forward, batch 16 x 2 s
  train_step_ms                         decoder->synth->6-scale MSS->Adam
  train_step_fraction_of_bound          measured vs composed whole-step bound
  stream_hop_ms                         the reference's whole JACK callback
  encode_samples_per_s_per_chip         CREPE-tiny f0 + loudness extraction
  encode_mfu / encode_mfu_full          tiny (shape-capped) + 'full' capacity
  long_render_samples_per_s             one 60 s stream, batch 1 (serving)
  osc_kernel_speedup_vs_xla             fused Pallas sine-bank vs XLA einsum
  osc_fwd_fraction_of_speed_of_light    measured vs ideal fill+contract bound
  osc_fwd_fraction_of_achievable        vs store/issue-charged (reachable) bound
  mss_loss_fwdbwd_mfu                   STFT matmuls vs v5e bf16 MXU peak
  multistream_{256,1024,2048}_hop_ms    N-client serving step vs RT deadline
  multistream_frontier_slots            largest slot count inside the deadline

Baselines (the reference publishes no numbers, SURVEY.md section 6, so each
vs_baseline is against its implicit requirement or the BASELINE.json north
star):

* throughput metrics: 100x realtime per chip = 4.41 M audio samples/s
  (vs_baseline > 1 beats the north star; for train_step_ms the ratio is
  audio-samples *learned* per second vs the same target).
* stream_hop_ms: the reference's real-time deadline hop/44100 s = 11.6 ms
  (reference rt/synth.py:53-55); vs_baseline = deadline / measured
  (the headroom factor, > 1 means real-time safe).
* osc_kernel_speedup_vs_xla: the XLA einsum path on identical inputs
  (ratio, > 1 means the hand kernel beats the compiler).
* roofline metrics: osc_fwd_fraction_of_speed_of_light and
  mss_loss_fwdbwd_mfu report measured time against the v5e hardware
  ceilings (op accounting in ddsp_tpu/utils/roofline.py; the full
  report incl. osc fwd+bwd is scripts/roofline.py + docs/PERFORMANCE.md).

Measurement method (CLAUDE.md): N executions chained inside one jit with a
real output->input dependency (lax.scan), so the tunnel's 100-400 ms
synchronous round trip and any caching cannot distort device time; median
of varied-input trials after a compile+warm-up call.  Throughput chains use
the marginal (T_HI - T_LO)/(HI - LO) between two chain lengths to subtract
the fixed per-call cost.

Robustness against tunnel wedges (round-2 VERDICT Weak #1: the r02 run
exited 1 because one watchdog timeout fired during a transient outage):
a trivial-jit probe runs before the suite; a watchdog timeout abandons the
worker but the next task first drains it (no two concurrent device jobs on
this 2-CPU host); failed/timed-out tasks get one retry pass after a fresh
probe; the last stdout line is a summary JSON carrying every measured
value (the driver keeps only the last line); exit status is 0 exactly when
every task's metrics were ultimately measured.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

RT_TARGET = 100  # x realtime per chip (BASELINE.json north star)
V5E_BF16_PEAK = 197e12  # FLOP/s


def _note(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


# Every emitted metric is also recorded here so the suite can (a) decide
# which tasks need the retry pass, (b) print one final summary line carrying
# all values (the driver's tail-parse only keeps the last JSON line), and
# (c) exit 0 exactly when everything was ultimately measured.
RESULTS = {}


def _emit(metric, value, unit, vs_baseline):
    rec = {
        "metric": metric,
        "value": round(float(value), 4),
        "unit": unit,
        "vs_baseline": round(float(vs_baseline), 4),
    }
    RESULTS[metric] = rec
    print(json.dumps(rec), flush=True)


def _marginal_time(make_many, args_for_trial):
    """Adaptive marginal-chain device time (ddsp_tpu.utils.profiling)."""
    from ddsp_tpu.utils.profiling import marginal_chain_time

    return marginal_chain_time(make_many, args_for_trial)


def bench_synth_forward(conf):
    """Full decoder forward at production shape, marginal-chain method."""
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.models.controller import decoder_apply, decoder_init

    batch_size = 16
    rng = np.random.default_rng(0)
    t = conf.frames_per_example
    batch = {
        "f0": jnp.asarray(rng.uniform(100, 600, (batch_size, t, 1)).astype(np.float32)),
        "normalized_cents": jnp.asarray(
            rng.uniform(0, 1, (batch_size, t, 1)).astype(np.float32)
        ),
        "loudness": jnp.asarray(
            rng.uniform(0, 1, (batch_size, t, 1)).astype(np.float32)
        ),
    }
    params = decoder_init(jax.random.PRNGKey(0), conf)
    key = jax.random.PRNGKey(1)

    def make_many(iters):
        @jax.jit
        def many(params, batch, key):
            def body(carry, i):
                b2 = dict(batch, loudness=batch["loudness"] + carry * 1e-12)
                out = decoder_apply(params, b2, conf, jax.random.fold_in(key, i))
                return jnp.sum(out * out), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc

        return many

    dt = _marginal_time(
        make_many,
        lambda trial: (params, batch, jax.random.fold_in(key, 1000 + trial)),
    )
    sps = batch_size * conf.example_length / dt
    _emit(
        "synth_forward_samples_per_s_per_chip",
        round(sps, 1),
        "audio samples/s",
        sps / (RT_TARGET * conf.sample_rate),
    )


def bench_train_step(conf):
    """Jitted train step (full loss incl. target STFTs), batch 16."""
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.training.trainer import init_state, make_train_step

    batch_size = conf.batch_size
    step = make_train_step(conf)
    rng = np.random.default_rng(0)
    t = conf.frames_per_example
    batch = {
        "f0": jnp.asarray(rng.uniform(100, 600, (batch_size, t, 1)).astype(np.float32)),
        "normalized_cents": jnp.asarray(
            rng.uniform(0, 1, (batch_size, t, 1)).astype(np.float32)
        ),
        "loudness": jnp.asarray(
            rng.uniform(0, 1, (batch_size, t, 1)).astype(np.float32)
        ),
        "audio": jnp.asarray(
            (0.1 * rng.standard_normal((batch_size, conf.example_length))).astype(
                np.float32
            )
        ),
    }

    def make_many(iters):
        @jax.jit
        def many(state, batch, eps):
            def body(carry, i):
                b = dict(batch, loudness=batch["loudness"] + eps * 1e-12)
                st, metrics = step(carry, b)
                return st, metrics["loss"]

            st, losses = jax.lax.scan(body, state, jnp.arange(iters))
            return losses[-1]

        return many

    state = init_state(jax.random.PRNGKey(0), conf)
    dt = _marginal_time(
        make_many, lambda trial: (state, batch, jnp.float32(trial + 1))
    )
    learned_sps = batch_size * conf.example_length / dt
    _emit(
        "train_step_ms",
        1e3 * dt,
        "ms/step",
        learned_sps / (RT_TARGET * conf.sample_rate),
    )
    # Whole-step roofline (round-3 VERDICT #4): measured time vs the
    # composed per-stage speed-of-light bound (controller MXU + GRU serial
    # latency + oscillator fill/contract + noise FIR + reverb FFT + MSS
    # matmuls + Adam HBM; accounting in utils/roofline.train_step_bound_s).
    from ddsp_tpu.utils.roofline import train_step_bound_s

    bound_s, _ = train_step_bound_s(conf, batch_size)
    _emit(
        "train_step_fraction_of_bound",
        bound_s / dt,
        "fraction of composed stage bound",
        bound_s / dt,
    )
    # The bound itself, so the artifact records when the denominator moves
    # (round 5 tightened it 4.92 -> 4.29 ms: bf16 reverb gradients + the
    # measured single-pass Mosaic DEFAULT rate for the osc backward); the
    # fraction is only comparable across rounds at a fixed bound.
    _emit(
        "train_step_bound_ms",
        1e3 * bound_s,
        "ms (composed speed-of-light bound)",
        1.0,
    )
    # The production scan trainer (trainer.make_train_scan) precomputes the
    # target spectrograms once per dataset; the per-step loss then skips
    # the target-side STFTs (losses.mss_loss_per_scale_cached).  Measure
    # that step too -- it is what sustained training actually runs.
    from ddsp_tpu.losses import target_spectrograms

    cached = dict(batch)
    del cached["audio"]
    cached.update(
        target_spectrograms(
            batch["audio"],
            conf.mss_ffts,
            conf.mss_overlap,
            matmul_dtype=None
            if conf.loss_matmul_dtype == "float32"
            else jnp.dtype(conf.loss_matmul_dtype),
        )
    )
    dt_c = _marginal_time(
        make_many, lambda trial: (state, cached, jnp.float32(trial + 1))
    )
    learned_c = batch_size * conf.example_length / dt_c
    _emit(
        "train_step_cached_targets_ms",
        1e3 * dt_c,
        "ms/step (scan-trainer path)",
        learned_c / (RT_TARGET * conf.sample_rate),
    )


def bench_stream_hop(conf, crepe_params):
    """Whole streaming hop: mic block -> CREPE f0 + loudness -> controller
    -> osc/noise/reverb -> audio block (the reference JACK callback)."""
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.models.controller import decoder_init
    from ddsp_tpu.runtime.streaming import (
        feature_stream_init,
        make_feature_stream_step,
        make_synth_stream_step,
        synth_stream_init,
    )

    dec_params = decoder_init(jax.random.PRNGKey(0), conf)

    def make_many(iters):
        @jax.jit
        def many(dec_params, crepe_params, key, seed_block):
            feat_step = make_feature_stream_step(crepe_params, conf)
            synth_step = make_synth_stream_step(dec_params, conf, key)

            def body(carry, i):
                fs, ss, block = carry
                frame, fs = feat_step(fs, block)
                out, ss = synth_step(ss, frame)
                return (fs, ss, jnp.tanh(out)), None  # feedback dependency

            carry, _ = jax.lax.scan(
                body,
                (feature_stream_init(conf), synth_stream_init(conf), seed_block),
                jnp.arange(iters),
            )
            return jnp.sum(carry[2])

        return many

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    dt = _marginal_time(
        make_many,
        lambda trial: (
            dec_params,
            crepe_params,
            key,
            jnp.asarray(0.1 * rng.standard_normal((1, conf.hop_length)), jnp.float32),
        ),
    )
    deadline = conf.hop_length / conf.sample_rate
    _emit("stream_hop_ms", 1e3 * dt, "ms/hop", deadline / dt)


def bench_encode(conf, crepe_params):
    """Offline feature extraction (dataset build), batch 16 x 2 s."""
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.models.autoencoder import feature_pad
    from ddsp_tpu.models.encoder import encoder_apply

    batch = 16

    def make_many(iters):
        @jax.jit
        def many(crepe_params, audio):
            def body(carry, i):
                feats = encoder_apply(crepe_params, feature_pad(carry, conf), conf)
                eps = 1e-12 * jnp.mean(feats["loudness"])
                return carry + eps, feats["f0"][:, 0, 0]

            final, f0s = jax.lax.scan(body, audio, jnp.arange(iters))
            return jnp.sum(f0s) + jnp.sum(final * 1e-20)

        return many

    rng = np.random.default_rng(0)
    t = np.arange(conf.example_length) / conf.sample_rate
    audio = jnp.asarray(
        0.3 * np.sin(2 * np.pi * 220 * t)[None] * np.ones((batch, 1)), jnp.float32
    )

    def trial_args(trial):
        noisy = audio + 0.01 * jnp.asarray(
            rng.standard_normal(audio.shape), jnp.float32
        )
        return (crepe_params, noisy)

    dt = _marginal_time(make_many, trial_args)
    sps = batch * conf.example_length / dt
    _emit(
        "encode_samples_per_s_per_chip",
        round(sps, 1),
        "audio samples/s",
        sps / (RT_TARGET * conf.sample_rate),
    )
    # Encoder roofline (round-2 VERDICT Weak #6): achieved CREPE-conv +
    # loudness-STFT FLOP/s vs the bf16 MXU peak (accounting in
    # ddsp_tpu/utils/roofline.encode_flops; the convs run f32-DEFAULT =
    # 3 bf16 passes, so 1/3 is this path's precision ceiling).
    from ddsp_tpu.utils.roofline import MXU_BF16, encode_flops

    flops = encode_flops(batch, conf.frames_per_example, conf)
    _emit(
        "encode_mfu",
        flops / dt / MXU_BF16,
        "fraction of v5e bf16 MXU peak",
        flops / dt / MXU_BF16,
    )
    # tiny's encode_mfu ceiling is set by its 16-64-wide channel counts,
    # not by code headroom; the SAME conv stack at CREPE-'full' capacity
    # (128-1024-wide stages) is the honest capability number, measured here
    # in the same run so the artifact explains itself (round-4 VERDICT #8).
    # Weights are randomly initialized -- throughput is value-independent.
    from ddsp_tpu.models.crepe import crepe_init

    conf_full = conf.replace(crepe_capacity="full")
    full_params = crepe_init(jax.random.PRNGKey(3), capacity="full")

    def make_many_full(iters):
        @jax.jit
        def many(crepe_params, audio):
            def body(carry, i):
                feats = encoder_apply(
                    crepe_params, feature_pad(carry, conf_full), conf_full
                )
                eps = 1e-12 * jnp.mean(feats["loudness"])
                return carry + eps, feats["f0"][:, 0, 0]

            final, f0s = jax.lax.scan(body, audio, jnp.arange(iters))
            return jnp.sum(f0s) + jnp.sum(final * 1e-20)

        return many

    def trial_args_full(trial):
        noisy = audio + 0.01 * jnp.asarray(
            rng.standard_normal(audio.shape), jnp.float32
        )
        return (full_params, noisy)

    dt_full = _marginal_time(make_many_full, trial_args_full)
    flops_full = encode_flops(batch, conf_full.frames_per_example, conf_full)
    _emit(
        "encode_mfu_full",
        flops_full / dt_full / MXU_BF16,
        "fraction of v5e bf16 MXU peak (CREPE-'full' capacity)",
        flops_full / dt_full / MXU_BF16,
    )


def bench_long_render(conf):
    """One 60 s single-stream render (serving latency; GRU runs ~5.2k
    sequential frame steps)."""
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.models.controller import decoder_apply, decoder_init

    frames = int(60 * conf.sample_rate) // conf.hop_length  # 5168
    rng = np.random.default_rng(0)
    batch = {
        "f0": jnp.asarray(rng.uniform(100, 600, (1, frames, 1)).astype(np.float32)),
        "normalized_cents": jnp.asarray(
            rng.uniform(0, 1, (1, frames, 1)).astype(np.float32)
        ),
        "loudness": jnp.asarray(rng.uniform(0, 1, (1, frames, 1)).astype(np.float32)),
    }
    params = decoder_init(jax.random.PRNGKey(0), conf)
    key = jax.random.PRNGKey(1)

    def make_many(iters):
        @jax.jit
        def many(params, batch, key):
            def body(carry, i):
                b2 = dict(batch, loudness=batch["loudness"] + carry * 1e-12)
                out = decoder_apply(params, b2, conf, jax.random.fold_in(key, i))
                return jnp.sum(out * out), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc

        return many

    dt = _marginal_time(
        make_many,
        lambda trial: (params, batch, jax.random.fold_in(key, 1000 + trial)),
    )
    sps = frames * conf.hop_length / dt
    _emit(
        "long_render_samples_per_s",
        round(sps, 1),
        "audio samples/s",
        sps / (RT_TARGET * conf.sample_rate),
    )


def bench_osc_kernel(conf):
    """Pallas sine-bank kernel vs the XLA einsum path at production shape.

    Both consume the same precomputed phase/amps/loudness, so the ratio
    isolates the audio-rate stage (the arithmetic core, reference
    harmonic_oscillator.py:45-50).  Baseline = the XLA path (ratio 1.0);
    the full roofline (MXU contraction FLOP/s, VPU bank-fill bound, MFU)
    lives in scripts/roofline.py + docs/PERFORMANCE.md.
    """
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.ops.oscillator import _render_from_phase
    from ddsp_tpu.ops.pallas.oscillator import pallas_render_from_phase

    if jax.default_backend() != "tpu":
        return  # interpreter numbers would be meaningless
    from ddsp_tpu.utils.roofline import osc_speed_of_light_s

    b, t, hop, h = 16, conf.frames_per_example, conf.hop_length, conf.n_harmonics
    rng = np.random.default_rng(0)
    amps = jnp.asarray(
        rng.uniform(0, 1, (b, t + 2, h)).astype(np.float32) / h
    )
    loud = jnp.asarray(rng.uniform(0, 1, (b, t + 2)).astype(np.float32))

    def chain(render):
        def make_many(iters):
            @jax.jit
            def many(phase, amps, loud):
                def body(carry, i):
                    out = render(carry, amps, loud)
                    p = carry + 1e-12 * jnp.mean(out)
                    return p - jnp.floor(p), None

                final, _ = jax.lax.scan(body, phase, jnp.arange(iters))
                return jnp.sum(final)

            return many

        return make_many

    def trial_args(trial):
        return (
            jnp.asarray(rng.uniform(0, 1, (b, t, hop)).astype(np.float32)),
            amps,
            loud,
        )

    dts = {}
    for name, render in (
        ("pallas", lambda p, a, l: pallas_render_from_phase(p, a, l)),
        ("xla", lambda p, a, l: _render_from_phase(p, a, l, h)),
    ):
        dts[name] = _marginal_time(chain(render), trial_args)
    _emit(
        "osc_kernel_speedup_vs_xla",
        dts["xla"] / dts["pallas"],
        "x (same inputs, fwd)",
        dts["xla"] / dts["pallas"],
    )
    # Roofline: measured vs the kernel's fill+contract speed-of-light bound
    # (ddsp_tpu/utils/roofline.py documents the op accounting; 1.0 would be
    # the v5e's VPU+MXU light speed for this op).
    _emit(
        "osc_fwd_fraction_of_speed_of_light",
        osc_speed_of_light_s(b, t, hop, h) / dts["pallas"],
        "fraction of v5e fill+contract bound",
        osc_speed_of_light_s(b, t, hop, h) / dts["pallas"],
    )
    # The ideal bound above charges the bank fill ZERO store cost, which
    # rounds 3-4 established is structurally unreachable (every rescheduling
    # ties or loses; the fill must store each bank element once).  The
    # achievable bound charges the measured store/issue factor
    # (roofline.OSC_FILL_STORE_ISSUE_FACTOR) -- this is the fraction that
    # honestly reads "how close is the kernel to what this algorithm can
    # reach on this hardware" (round-4 VERDICT #6).
    ach = osc_speed_of_light_s(b, t, hop, h, achievable=True)
    _emit(
        "osc_fwd_fraction_of_achievable",
        ach / dts["pallas"],
        "fraction of achievable (store/issue-charged) bound",
        ach / dts["pallas"],
    )


def bench_mss_mfu(conf):
    """MSS-loss fwd+bwd MFU: achieved STFT-matmul FLOP/s vs the v5e bf16
    MXU peak (the training loss's compute core; accounting in
    ddsp_tpu/utils/roofline.py)."""
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.losses import mss_loss
    from ddsp_tpu.utils.roofline import MXU_BF16, mss_flops

    b, length = 16, conf.example_length
    dtype = jnp.bfloat16 if conf.loss_matmul_dtype == "bfloat16" else None
    rng = np.random.default_rng(0)
    true = jnp.asarray(0.1 * rng.standard_normal((b, length)), jnp.float32)

    def make_many(iters):
        @jax.jit
        def many(pred, true):
            def loss(p):
                return mss_loss(
                    p, true, conf.mss_ffts, conf.mss_alpha, conf.mss_overlap,
                    matmul_dtype=dtype,
                )

            def body(carry, i):
                return carry + 1e-12 * jax.grad(loss)(carry), None

            final, _ = jax.lax.scan(body, pred, jnp.arange(iters))
            return jnp.sum(final)

        return many

    dt = _marginal_time(
        make_many,
        lambda trial: (
            jnp.asarray(0.1 * rng.standard_normal((b, length)), jnp.float32),
            true,
        ),
    )
    flops = mss_flops(b, length, conf.mss_ffts, conf.mss_overlap, backward=True)
    _emit(
        "mss_loss_fwdbwd_mfu",
        flops / dt / MXU_BF16,
        "fraction of v5e bf16 MXU peak",
        flops / dt / MXU_BF16,
    )


def bench_multistream(conf, crepe_params):
    """Serving capacity: per-hop device time of the fused multi-stream
    pipeline (features + controller + synths for every slot) at 256 and
    1024 slots.  Baseline = the 11.6 ms real-time deadline; vs_baseline > 1
    means that many concurrent real-time clients fit on one chip.  The
    round-3 frequency-delay-line reverb (models/synths.reverb_live) took
    the 256-slot hop from 6.8 to ~1.5 ms and made 1024 slots real-time
    (docs/PERFORMANCE.md round-3 profile)."""
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.models.controller import decoder_init
    from ddsp_tpu.runtime.multistream import (
        make_multistream_step,
        multistream_init,
    )

    params = decoder_init(jax.random.PRNGKey(0), conf)
    rng = np.random.default_rng(0)
    deadline = conf.hop_length / conf.sample_rate
    hops = {}
    for n in (256, 1024, 2048):
        step = make_multistream_step(
            params, crepe_params, conf, jax.random.PRNGKey(2)
        )
        state0 = multistream_init(conf, n)

        def make_many(iters, step=step):
            @jax.jit
            def many(state, seed_blocks):
                def body(carry, i):
                    st, blocks = carry
                    out, st = step(st, blocks)  # nested jit inlines
                    return (st, jnp.tanh(out)), None  # feedback dependency

                (st, last), _ = jax.lax.scan(
                    body, (state, seed_blocks), jnp.arange(iters)
                )
                return jnp.sum(last)

            return many

        dt = _marginal_time(
            make_many,
            lambda trial: (
                state0,
                jnp.asarray(
                    0.1 * rng.standard_normal((n, conf.hop_length)),
                    jnp.float32,
                ),
            ),
        )
        hops[n] = dt
        _emit(
            f"multistream_{n}_hop_ms",
            1e3 * dt,
            f"ms/hop ({n} slots)",
            deadline / dt,
        )
    # Serving-capacity frontier: the largest measured slot count whose hop
    # fits the reference's 11.6 ms deadline (round-4 full sweep
    # 1024..3072 in scripts/multistream_frontier.py: 2048 fits at
    # ~10.3 ms, 2560 misses at ~12.8).
    fit = [n for n, dt in hops.items() if dt < deadline]
    _emit(
        "multistream_frontier_slots",
        max(fit) if fit else 0,
        "concurrent real-time streams/chip",
        (max(fit) if fit else 0) / 1.0,
    )


import threading

# Workers abandoned by a watchdog timeout (daemon threads can't be killed).
# They are drained before any later device work so two TPU jobs never run
# concurrently on this 2-CPU host (round-2 ADVICE: a reviving worker would
# contaminate every later metric).
_ABANDONED = []


def _drain_abandoned(grace_s: float) -> bool:
    """Join abandoned workers; True when none are left running."""
    global _ABANDONED
    deadline = time.monotonic() + grace_s
    still = []
    for name, thread in _ABANDONED:
        thread.join(timeout=max(0.0, deadline - time.monotonic()))
        if thread.is_alive():
            still.append((name, thread))
        else:
            _note(f"{name}: abandoned worker finished late")
    _ABANDONED = still
    return not still


def _tunnel_probe(timeout_s: float = 150.0) -> bool:
    """Trivial-jit device probe (CLAUDE.md: the tunnel occasionally goes
    unresponsive for ~30+ min; probe before long drives)."""
    import jax
    import jax.numpy as jnp

    ok = []
    done = threading.Event()
    salt = time.monotonic_ns() % 1000  # new values -> a real device execution

    def work():
        try:
            x = jnp.full((128, 128), 1.0 + 1e-6 * salt, jnp.float32)
            jax.block_until_ready(jax.jit(lambda a: (a @ a).sum())(x))
            ok.append(True)
        except Exception as e:  # noqa: BLE001 -- a dead probe is the signal
            _note(f"tunnel probe error: {type(e).__name__}: {e}")
        finally:
            done.set()

    threading.Thread(target=work, daemon=True).start()
    if done.wait(timeout_s) and ok:
        return True
    return False


def _probe_until_alive(attempts: int = 4, wait_s: float = 120.0) -> bool:
    for attempt in range(attempts):
        if _tunnel_probe():
            return True
        _note(
            f"tunnel probe {attempt + 1}/{attempts} failed; "
            f"waiting {wait_s:.0f}s for the link to recover"
        )
        time.sleep(wait_s)
    return False


def _run_with_timeout(name, fn, timeout_s):
    """Run fn on a watchdog thread.  Raises TimeoutError on expiry (the
    worker is recorded in _ABANDONED for draining before later work)."""
    box = []
    done = threading.Event()

    def work():
        try:
            fn()
        except Exception as e:
            box.append(e)
        finally:
            done.set()

    thread = threading.Thread(target=work, daemon=True)
    thread.start()
    if not done.wait(timeout_s):
        _ABANDONED.append((name, thread))
        raise TimeoutError(f"exceeded {timeout_s:.0f}s (tunnel wedged?)")
    if box:
        raise box[0]


def main():
    import jax

    from ddsp_tpu.config import Config
    from ddsp_tpu.models.crepe import crepe_init, load_torch_checkpoint

    conf = Config()
    tiny = "/root/reference/crepe/pretrained/tiny.pth"
    crepe_params = (
        load_torch_checkpoint(tiny)
        if os.path.exists(tiny)
        else crepe_init(jax.random.PRNGKey(2), capacity=conf.crepe_capacity)
    )

    timeout_s = float(os.environ.get("BENCH_METRIC_TIMEOUT", "900"))
    tasks = [
        # (name, fn, metrics the task emits when it completes)
        ("synth_forward", lambda: bench_synth_forward(conf),
         ("synth_forward_samples_per_s_per_chip",)),
        ("train_step", lambda: bench_train_step(conf),
         ("train_step_ms", "train_step_fraction_of_bound",
          "train_step_bound_ms")),
        ("stream_hop", lambda: bench_stream_hop(conf, crepe_params),
         ("stream_hop_ms",)),
        ("encode", lambda: bench_encode(conf, crepe_params),
         ("encode_samples_per_s_per_chip", "encode_mfu", "encode_mfu_full")),
        ("long_render", lambda: bench_long_render(conf),
         ("long_render_samples_per_s",)),
        ("osc_kernel", lambda: bench_osc_kernel(conf),
         ("osc_kernel_speedup_vs_xla", "osc_fwd_fraction_of_speed_of_light",
          "osc_fwd_fraction_of_achievable")),
        ("mss_mfu", lambda: bench_mss_mfu(conf), ("mss_loss_fwdbwd_mfu",)),
        ("multistream", lambda: bench_multistream(conf, crepe_params),
         ("multistream_256_hop_ms", "multistream_1024_hop_ms",
          "multistream_2048_hop_ms", "multistream_frontier_slots")),
    ]
    done = {name: False for name, _, _ in tasks}

    def attempt(name, fn, expected):
        """One guarded run; marks the task done on success.  A task that
        returns without emitting (e.g. osc_kernel off-TPU) is a deliberate
        skip and counts as done."""
        if _ABANDONED and not _drain_abandoned(grace_s=120.0):
            _note(
                f"{name}: an abandoned worker is still running; probing the "
                "link before risking a concurrent device job"
            )
            if not _probe_until_alive():
                _note(f"{name}: SKIPPED this attempt (link down)")
                return
            _note(
                f"{name}: link is back but the old worker never exited; "
                "timings below may be contaminated (suspect)"
            )
        try:
            _run_with_timeout(name, fn, timeout_s)
        except Exception as e:
            _note(f"{name}: FAILED: {type(e).__name__}: {e}")
        else:
            done[name] = True
            _note(f"{name}: done")

    _note("pre-suite tunnel probe...")
    if not _probe_until_alive():
        _note("tunnel unresponsive; proceeding anyway (metrics will retry)")
    for name, fn, expected in tasks:
        _note(f"{name}: compiling + measuring...")
        attempt(name, fn, expected)

    # Retry pass: the round-2 wedge resolved itself minutes later, so every
    # timed-out/failed metric gets one more chance after a fresh probe.
    _drain_abandoned(grace_s=60.0)
    for name, fn, expected in tasks:
        if not done[name] and all(m in RESULTS for m in expected):
            done[name] = True  # abandoned worker delivered late
    missing = [t for t in tasks if not done[t[0]]]
    if missing:
        _note(f"retry pass over {[t[0] for t in missing]}...")
        if _probe_until_alive():
            for name, fn, expected in missing:
                _note(f"{name}: retrying...")
                attempt(name, fn, expected)
        else:
            _note("tunnel still unresponsive; skipping the retry pass")

    for name, fn, expected in tasks:
        if not done[name] and all(m in RESULTS for m in expected):
            done[name] = True
    n_done = sum(done.values())
    # One line carrying every measured value: the driver's `parsed` field
    # keeps only the LAST JSON line of stdout.
    print(
        json.dumps(
            {
                "metric": "summary",
                "value": n_done,
                "unit": f"of {len(tasks)} tasks measured",
                "vs_baseline": n_done / len(tasks),
                "values": {m: r["value"] for m, r in RESULTS.items()},
                "vs": {m: r["vs_baseline"] for m, r in RESULTS.items()},
            }
        ),
        flush=True,
    )
    if n_done < len(tasks):
        _note(f"incomplete: {[n for n, d in done.items() if not d]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
