"""A/B the encode path's CREPE layout/dtype variants on the real chip.

Round-3 VERDICT #5: the encoder sat at 0.28 MFU with two diagnosed but
untried structural costs -- the C_in=1 512-tap stride-4 first conv the MXU
cannot fill from, and the elementwise BN/ReLU/pool stages in the NCH
layout.  Round 4 adds a channels-last (NLC) stack with a space-to-depth
first conv (models/crepe._layer_nlc / _first_layer_nlc_s2d).  This sweeps
all four (layout x dtype) combinations through the FULL encode path
(resample + CREPE + loudness + decode), interleaved within one run per the
ambient-band rule (docs/PERFORMANCE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_encode_variants.py
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
    from ddsp_tpu.models.autoencoder import feature_pad
    from ddsp_tpu.models.crepe import crepe_init, load_torch_checkpoint
    from ddsp_tpu.models.encoder import encoder_apply
    from ddsp_tpu.utils.roofline import MXU_BF16, encode_flops

    tiny = "/root/reference/crepe/pretrained/tiny.pth"
    crepe_params = (
        load_torch_checkpoint(tiny)
        if os.path.exists(tiny)
        else crepe_init(jax.random.PRNGKey(2))
    )
    batch, iters = 16, 20

    variants = {
        "nch_f32": dict(crepe_layout="nch", crepe_compute_dtype="float32"),
        "nlc_f32": dict(crepe_layout="nlc", crepe_compute_dtype="float32"),
        "nch_bf16": dict(crepe_layout="nch", crepe_compute_dtype="bfloat16"),
        "nlc_bf16": dict(crepe_layout="nlc", crepe_compute_dtype="bfloat16"),
    }

    fns = {}
    for name, kw in variants.items():
        conf = Config(**kw)

        @jax.jit
        def many(crepe_params, audio, conf=conf):
            def body(carry, i):
                feats = encoder_apply(crepe_params, feature_pad(carry, conf), conf)
                eps = 1e-12 * jnp.mean(feats["loudness"])
                return carry + eps, feats["f0"][:, 0, 0]

            final, f0s = jax.lax.scan(body, audio, jnp.arange(iters))
            return jnp.sum(f0s) + jnp.sum(final * 1e-20)

        fns[name] = (many, conf)

    rng = np.random.default_rng(0)
    t = np.arange(Config().example_length) / 44100.0
    audio = jnp.asarray(
        0.3 * np.sin(2 * np.pi * 220 * t)[None] * np.ones((batch, 1)),
        jnp.float32,
    )

    # compile + warm all variants first
    f0_ref = {}
    for name, (fn, conf) in fns.items():
        r = fn(crepe_params, audio)
        jax.block_until_ready(r)
        f0_ref[name] = float(r)
    # layouts must agree numerically (same math)
    print("checksums:", {k: round(v, 2) for k, v in f0_ref.items()}, flush=True)

    results = {n: [] for n in fns}
    for trial in range(4):
        a = audio + 0.01 * jnp.asarray(
            rng.standard_normal(audio.shape), jnp.float32
        )
        for name, (fn, conf) in fns.items():  # interleaved A/B
            t0 = time.perf_counter()
            r = fn(crepe_params, a)
            jax.block_until_ready(r)
            results[name].append((time.perf_counter() - t0) / iters)

    conf0 = Config()
    flops = encode_flops(batch, conf0.frames_per_example, conf0)
    for name in fns:
        dt = float(np.median(results[name][1:]))
        sps = batch * conf0.example_length / dt
        print(
            f"{name:10s} {dt * 1e3:7.2f} ms/batch  {sps / 1e6:7.1f} M samples/s"
            f"  encode_mfu={flops / dt / MXU_BF16:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
