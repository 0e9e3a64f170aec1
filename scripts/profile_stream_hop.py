"""Measure the FULL streaming hop on the real chip: mic block -> CREPE f0 +
A-weighted loudness -> controller/GRU -> osc+noise+reverb -> audio block.

The reference's implicit real-time benchmark is the JACK callback deadline
(reference rt/synth.py:53-55): encoder + decoder must finish one block in
block/44100 s (11.6 ms at hop 512).  BASELINE.md's 0.49 ms/hop row covers
the synth side only; this script times the whole chain.

Tunnel-safe method (CLAUDE.md): N hops chained inside one jit with a real
feedback dependency -- each synthesized output block is fed back as the
next mic block -- so remote-dispatch latency and caching cannot distort
device time.  Params enter as jit arguments (closure constants would be
rejected as oversized HLO by the remote-compile service).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.config import Config
    from ddsp_tpu.models.controller import decoder_init
    from ddsp_tpu.models.crepe import crepe_init, load_torch_checkpoint
    from ddsp_tpu.runtime.streaming import (
        feature_stream_init,
        make_feature_stream_step,
        make_synth_stream_step,
        synth_stream_init,
    )

    conf = Config()
    tiny = "/root/reference/crepe/pretrained/tiny.pth"
    if os.path.exists(tiny):
        crepe_params = load_torch_checkpoint(tiny)
        conf = conf.replace(crepe_capacity="tiny")
    else:
        crepe_params = crepe_init(jax.random.PRNGKey(2), capacity=conf.crepe_capacity)
    dec_params = decoder_init(jax.random.PRNGKey(0), conf)
    iters = 100

    @jax.jit
    def many(dec_params, crepe_params, key, seed_block):
        # Factories are called at trace time with traced params, so the
        # weights are jit *arguments*, not HLO constants.
        feat_step = make_feature_stream_step(crepe_params, conf)
        synth_step = make_synth_stream_step(dec_params, conf, key)

        def body(carry, i):
            fs, ss, block = carry
            frame, fs = feat_step(fs, block)
            out, ss = synth_step(ss, frame)
            # feedback: synthesized block becomes the next mic block
            return (fs, ss, jnp.tanh(out)), None

        carry, _ = jax.lax.scan(
            body,
            (feature_stream_init(conf), synth_stream_init(conf), seed_block),
            jnp.arange(iters),
        )
        return carry[2]

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    seed = jnp.asarray(0.1 * rng.standard_normal((1, conf.hop_length)), jnp.float32)
    out = many(dec_params, crepe_params, key, seed)
    jax.block_until_ready(out)  # compile + warm up
    times = []
    for trial in range(4):
        s = jnp.asarray(
            0.1 * rng.standard_normal((1, conf.hop_length)), jnp.float32
        )
        t0 = time.perf_counter()
        out = many(dec_params, crepe_params, key, s)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
        assert np.isfinite(np.asarray(out)).all()
    ms = 1e3 * float(np.median(times))
    deadline_ms = 1e3 * conf.hop_length / conf.sample_rate
    print(
        f"full streaming hop (CREPE-{conf.crepe_capacity} f0 + loudness + "
        f"controller + osc/noise/reverb): {ms:.3f} ms/hop on "
        f"{jax.devices()[0].platform}; RT deadline {deadline_ms:.1f} ms "
        f"({deadline_ms / ms:.1f}x headroom)"
    )


if __name__ == "__main__":
    main()
