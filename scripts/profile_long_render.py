"""Per-stage profile + overlap experiment for the 60 s batch-1 render.

Round-3 VERDICT #2: the 9.17 ms render = 3.06 ms serial GRU + ~6.1 ms of
parallel synth work; if synthesis of chunk k could execute concurrently
with the GRU scan of chunk k+1 the ceiling is ~430 M samples/s.  This
script measures, at the long-render shape (B=1, T=5168):

1. per-stage marginals (controller / GRU scan / phase / oscillator /
   noise / reverb) to localize the non-GRU time;
2. a chunk-PIPELINED decode that is numerically identical to
   ``decoder_apply`` but schedules the Pallas oscillator + noise FIR of
   chunk k-2 inside the same scan body as the GRU of chunk k, giving
   XLA maximal freedom to interleave the (independent) synth ops with
   the recurrence's latency bubbles;
3. ablations of the remaining stages (bf16 controller matmuls, noise
   RNG vs matmuls) to find cheaper levers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_long_render.py
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
from ddsp_tpu.models import nn
from ddsp_tpu.models.controller import (
    controller_apply,
    decoder_apply,
    decoder_init,
    modified_sigmoid,
)
from ddsp_tpu.models.synths import noise_apply, oscillator_apply, reverb_apply
from ddsp_tpu.ops.oscillator import (
    _fundamental_phase_cycles,
    nyquist_normalized_amps,
)

FRAMES = 5168  # 60 s at hop 512 / 44.1 kHz


def long_batch(conf, b=1, frames=FRAMES, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "f0": jnp.asarray(rng.uniform(100, 600, (b, frames, 1)).astype(np.float32)),
        "normalized_cents": jnp.asarray(
            rng.uniform(0, 1, (b, frames, 1)).astype(np.float32)
        ),
        "loudness": jnp.asarray(rng.uniform(0, 1, (b, frames, 1)).astype(np.float32)),
    }


def decode_pipelined(params, batch, conf, key, n_chunks):
    """decoder_apply, restructured as a chunk pipeline (exact semantics).

    The fundamental phase depends only on f0 (an input), so the whole
    (B, T, hop) phase is computed up front; the GRU is the only
    sequentially-constrained producer.  An outer scan then runs, per step
    k: the GRU + heads of chunk k, AND the oscillator/noise synthesis of
    chunk k-2 (whose amp-interpolation context -- one frame each side --
    is fully available from chunks k-3..k-1).  Inside one scan body the
    two computations share no data dependency, so any compute-compute
    overlap XLA/Mosaic can express is available to it.  Outputs are
    bit-identical to decoder_apply (same phase, same per-frame controls,
    same frame-indexed noise RNG, same reverb).
    """
    ctrl = params["controller"]
    b, t, _ = batch["f0"].shape
    assert t % n_chunks == 0
    fc = t // n_chunks

    # --- parallel (non-recurrent) prefix: latents + GRU input projection
    lat_f0 = nn.mlp_apply(ctrl["mlp_f0"], batch["normalized_cents"])
    lat_ld = nn.mlp_apply(ctrl["mlp_loudness"], batch["loudness"])
    latent = jnp.concatenate([lat_f0, lat_ld], axis=-1)
    lp = ctrl["gru"]["layers"][0]
    gi = latent @ lp["w_ih"].T + lp["b_ih"]  # (B, T, 3H)

    # --- full-length phase from f0 (independent of the GRU)
    f0 = batch["f0"][..., 0]
    f0_pad = jnp.concatenate([f0[:, :1], f0, f0[:, -1:]], axis=1)
    phase1 = _fundamental_phase_cycles(
        f0_pad, conf.hop_length, conf.sample_rate, jnp.zeros((b,), jnp.float32)
    )  # (B, T, hop)

    nh = lp["w_hh"].shape[-1]
    h0 = jnp.zeros((b, nh), jnp.float32)

    def gru_chunk(h, k):
        gik = jax.lax.dynamic_slice_in_dim(gi, k * fc, fc, 1)

        def step(h, gi_t):
            hn = nn._gru_recurrence(lp, h, gi_t)
            return hn, hn

        hT, ys = jax.lax.scan(step, h, jnp.moveaxis(gik, 0, 1), unroll=4)
        return hT, jnp.moveaxis(ys, 0, 1)

    def body(carry, k):
        h, c_m1, c_m2, tail_m3 = carry
        # GRU + heads for chunk k (sequential dependency on h)
        hT, ys = gru_chunk(h, k)
        lat_sl_f0 = jax.lax.dynamic_slice_in_dim(lat_f0, k * fc, fc, 1)
        lat_sl_ld = jax.lax.dynamic_slice_in_dim(lat_ld, k * fc, fc, 1)
        lat2 = jnp.concatenate([ys, lat_sl_f0, lat_sl_ld], axis=-1)
        lat2 = nn.mlp_apply(ctrl["mlp_gru"], lat2)
        c_k = (
            modified_sigmoid(nn.dense_apply(ctrl["dense_harmonic"], lat2)),
            modified_sigmoid(nn.dense_apply(ctrl["dense_loudness"], lat2))[..., 0],
            modified_sigmoid(nn.dense_apply(ctrl["dense_filter"], lat2)),
        )
        # Synthesis of chunk k-2 (independent of this body's GRU).  Chunk 0's
        # left context is its own first frame (edge replication, matching
        # edge_pad_frames); later chunks use the carried last frame of k-3.
        head_m1 = (c_m1[0][:, :1], c_m1[1][:, :1], None)
        first = k == 2
        tail_use = (
            jnp.where(first, c_m2[0][:, :1], tail_m3[0]),
            jnp.where(first, c_m2[1][:, :1], tail_m3[1]),
            None,
        )
        audio = synth_chunk_idx(k - 2, tail_use, c_m2, head_m1)
        new_tail = (c_m2[0][:, -1:], c_m2[1][:, -1:], None)
        return (hT, c_k, c_m1, new_tail), audio

    def synth_chunk_idx(k, tail, c_cur, head_next):
        cat = lambda p, x, n: jnp.concatenate([p, x, n], axis=1)
        f0k = jax.lax.dynamic_slice_in_dim(
            f0_pad, jnp.maximum(k, 0) * fc, fc + 2, 1
        )
        amps = cat(tail[0], c_cur[0], head_next[0])
        loud = cat(tail[1], c_cur[1], head_next[1])
        amps = nyquist_normalized_amps(f0k[..., None], amps, conf.sample_rate)
        ph = jax.lax.dynamic_slice_in_dim(
            phase1, jnp.maximum(k, 0) * fc, fc, 1
        )
        from ddsp_tpu.ops.pallas.oscillator import pallas_render_from_phase

        harm = pallas_render_from_phase(ph, amps, loud)
        noise = noise_apply(
            {"H": c_cur[2]}, conf, key, frame_offset=jnp.maximum(k, 0) * fc
        )
        return harm + noise

    zero_c = (
        jnp.zeros((b, fc, conf.n_harmonics)),
        jnp.zeros((b, fc)),
        jnp.zeros((b, fc, conf.n_noise_filters)),
    )
    zero_tail = (
        jnp.zeros((b, 1, conf.n_harmonics)),
        jnp.zeros((b, 1)),
        None,
    )
    (hT, c_last, c_last1, tail), audio_chunks = jax.lax.scan(
        body, (h0, zero_c, zero_c, zero_tail), jnp.arange(n_chunks)
    )
    # audio_chunks[k] holds chunk k-2 (garbage for k<2); render the final two.
    head_last = (c_last[0][:, :1], c_last[1][:, :1], None)
    a_m2 = synth_chunk_idx(n_chunks - 2, tail, c_last1, head_last)
    edge = (c_last[0][:, -1:], c_last[1][:, -1:], None)
    tail_m1 = (c_last1[0][:, -1:], c_last1[1][:, -1:], None)
    a_m1 = synth_chunk_idx(n_chunks - 1, tail_m1, c_last, edge)

    mid = jnp.moveaxis(audio_chunks[2:], 0, 1).reshape(b, (n_chunks - 2) * fc * conf.hop_length)
    dry = jnp.concatenate([mid, a_m2, a_m1], axis=-1)
    return reverb_apply(params["reverb"], dry, conf)


def main():
    conf = Config()
    params = decoder_init(jax.random.PRNGKey(0), conf)
    key = jax.random.PRNGKey(1)
    batch = long_batch(conf)

    results = {}
    only = sys.argv[1:]  # substring filters: run only matching stages

    def record(name, thunk):
        if only and not any(s in name for s in only):
            return
        seconds = thunk()
        results[name] = seconds
        sps = FRAMES * conf.hop_length / seconds
        print(f"{name:26s} {seconds * 1e3:8.3f} ms   ({sps / 1e6:6.1f} M samp/s)", flush=True)

    # --- baseline + stages
    record("full_decode", lambda: marginal_time(
        lambda bt: jnp.sum(decoder_apply(params, bt, conf, key)), batch
    ))
    confbf = conf.replace(compute_dtype="bfloat16")
    record("full_decode_bf16mlp", lambda: marginal_time(
        lambda bt: jnp.sum(decoder_apply(params, bt, confbf, key)), batch
    ))
    record("controller", lambda: marginal_time(
        lambda bt: jnp.sum(controller_apply(params["controller"], bt)[0]["c"]),
        batch,
    ))

    # GRU scan alone (input projection precomputed outside the timed fn)
    lp = params["controller"]["gru"]["layers"][0]
    rngl = np.random.default_rng(3)
    latent = jnp.asarray(rngl.standard_normal((1, FRAMES, 1024)).astype(np.float32) * 0.1)

    def gru_only(lat):
        gi = lat @ lp["w_ih"].T + lp["b_ih"]

        def step(h, gi_t):
            hn = nn._gru_recurrence(lp, h, gi_t)
            return hn, hn

        hT, ys = jax.lax.scan(
            step, jnp.zeros((1, 512), jnp.float32), jnp.moveaxis(gi, 0, 1), unroll=4
        )
        return jnp.sum(ys) + jnp.sum(hT)

    record("gru_proj_plus_scan", lambda: marginal_time(gru_only, latent))

    controls, _ = jax.jit(lambda p, bt: controller_apply(p, bt))(
        params["controller"], batch
    )
    record("osc_pallas", lambda: marginal_time(
        lambda cs: jnp.sum(oscillator_apply(cs, conf)[0]), controls
    ))
    record("noise", lambda: marginal_time(
        lambda cs: jnp.sum(noise_apply(cs, conf, key)), controls
    ))
    audio = jnp.asarray(
        (0.1 * np.random.default_rng(4).standard_normal((1, FRAMES * conf.hop_length))).astype(np.float32)
    )
    record("reverb", lambda: marginal_time(
        lambda x: jnp.sum(reverb_apply(params["reverb"], x, conf)), audio
    ))

    # phase alone
    f0 = batch["f0"][..., 0]
    f0_pad = jnp.concatenate([f0[:, :1], f0, f0[:, -1:]], axis=1)
    record("phase", lambda: marginal_time(
        lambda fp: jnp.sum(
            _fundamental_phase_cycles(fp, conf.hop_length, conf.sample_rate,
                                      jnp.zeros((1,), jnp.float32))
        ),
        f0_pad,
    ))

    # noise ablation: matmuls with FIXED noise (no RNG)
    from ddsp_tpu.ops.fir import frame_noise

    fixed_noise = frame_noise(key, 1, FRAMES, conf.hop_length)

    def noise_fixed(cs):
        from ddsp_tpu.ops.fir import convolve_designed_fir

        return jnp.sum(convolve_designed_fir(cs["H"], fixed_noise))

    record("noise_fixed_rng", lambda: marginal_time(noise_fixed, controls))

    # --- pipelined decode: equality then timing
    for n_chunks in (8, 16):
        if only and not any(s in f"pipelined_{n_chunks}" for s in only):
            continue
        fn = jax.jit(
            lambda p, bt, nc=n_chunks: decode_pipelined(p, bt, conf, key, nc)
        )
        ref = jax.jit(lambda p, bt: decoder_apply(p, bt, conf, key))
        out_p = np.asarray(fn(params, batch))
        out_r = np.asarray(ref(params, batch))
        err = np.max(np.abs(out_p - out_r)) / max(np.max(np.abs(out_r)), 1e-9)
        print(f"pipelined({n_chunks}) rel max err vs decoder_apply: {err:.2e}")
        record(f"pipelined_{n_chunks}", lambda: marginal_time(
            lambda bt, nc=n_chunks: jnp.sum(decode_pipelined(params, bt, conf, key, nc)),
            batch,
        ))

    print("\nsummary:", {k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
