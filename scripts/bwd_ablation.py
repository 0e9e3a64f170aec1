"""Ablate the Pallas backward kernel: bank fill vs matmul section cost."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddsp_tpu.config import Config
from ddsp_tpu.ops.interp import hop_weights
from ddsp_tpu.ops.oscillator import (
    _fundamental_phase_cycles,
    nyquist_normalized_amps,
)
from ddsp_tpu.ops.pallas import oscillator as po
from scripts.profile_stages import marginal_time


def _kernel_fill_only(
    g_ref, phase_ref, amps_l_ref, amps_m_ref, amps_r_ref, loud_ref, w_ref,
    w_big_ref, dphase_ref, da_l_ref, da_m_ref, da_r_ref, dloud_ref,
    sin_ref, cos_ref,
    *, ft, hop, hp, hb, n_h,
):
    length = ft * hop
    phase = phase_ref[0]
    x = phase.reshape(1, length)
    po._fill_sine_banks_cat(sin_ref, cos_ref, x, hb)
    # touch the banks cheaply so the fill cannot be elided
    dphase_ref[0] = (sin_ref[0:1, :] + cos_ref[hb - 1 : hb, :]).reshape(ft, hop)
    da_l_ref[0] = amps_l_ref[0]
    da_m_ref[0] = amps_m_ref[0]
    da_r_ref[0] = amps_r_ref[0]
    dloud_ref[0] = jnp.zeros((ft, 3), jnp.float32)


def run_variant(kernel_fn, phase1, amps_pad, loud_pad, g,
                frames_per_block=4):
    b, t, hop = phase1.shape
    h = amps_pad.shape[-1]
    hp = po._round_up(h, po.LANE)
    hb = po._round_up(h, 8)
    ft = max(8, po._round_up(frames_per_block, 8))
    t_pad = po._round_up(t, ft)
    g3 = g.reshape(b, t, hop)
    if t_pad != t:
        grow = lambda x: jnp.pad(x, ((0, 0), (0, t_pad - t)) + ((0, 0),) * (x.ndim - 2))
        phase1, g3 = grow(phase1), grow(g3)
        amps_pad = jnp.pad(amps_pad, ((0, 0), (0, t_pad - t), (0, 0)))
        loud_pad = jnp.pad(loud_pad, ((0, 0), (0, t_pad - t)))
    amps_p = jnp.pad(amps_pad, ((0, 0), (0, 0), (0, hp - h)))
    amps_l, amps_m, amps_r = amps_p[:, :-2], amps_p[:, 1:-1], amps_p[:, 2:]
    loud_trip = jnp.stack([loud_pad[:, :-2], loud_pad[:, 1:-1], loud_pad[:, 2:]], -1)
    loud_p = jnp.repeat(loud_trip, po.LANE, axis=-1)
    w_np = np.asarray(hop_weights(hop))
    w = jnp.pad(jnp.asarray(w_np), ((0, 0), (0, 1)))
    w_big = jnp.asarray(
        np.pad(np.tile(w_np.T, (1, ft)), ((0, 5), (0, 0))).astype(np.float32)
    )
    t = t_pad
    grid = (b, t // ft)
    spec_hop = pl.BlockSpec((1, ft, hop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    spec_amp = pl.BlockSpec((1, ft, hp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        kernel_fn, ft=ft, hop=hop, hp=hp, hb=hb, n_h=h
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, t, hop), jnp.float32),
            jax.ShapeDtypeStruct((b, t, hp), jnp.float32),
            jax.ShapeDtypeStruct((b, t, hp), jnp.float32),
            jax.ShapeDtypeStruct((b, t, hp), jnp.float32),
            jax.ShapeDtypeStruct((b, t, 3), jnp.float32),
        ),
        grid=grid,
        in_specs=[spec_hop, spec_hop, spec_amp, spec_amp, spec_amp,
                  pl.BlockSpec((1, ft, 3 * po.LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((hop, 4), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, ft * hop), lambda i, j: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=(spec_hop, spec_amp, spec_amp, spec_amp,
                   pl.BlockSpec((1, ft, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((hb, ft * hop), jnp.float32),
            pltpu.VMEM((hb, ft * hop), jnp.float32),
        ],
    )(g3, phase1, amps_l, amps_m, amps_r, loud_p, w, w_big)
    return outs


def main():
    conf = Config()
    b, t, hop, h = 16, conf.frames_per_example, conf.hop_length, conf.n_harmonics
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.uniform(100, 600, (b, t + 2, 1)).astype(np.float32))
    amps = jnp.asarray(rng.uniform(0, 1, (b, t + 2, h)).astype(np.float32))
    loud = jnp.asarray(rng.uniform(0, 1, (b, t + 2)).astype(np.float32))
    amps = nyquist_normalized_amps(f0, amps, conf.sample_rate)
    phase1 = _fundamental_phase_cycles(
        f0[..., 0], hop, conf.sample_rate, jnp.zeros((b,), jnp.float32)
    )
    g = jnp.asarray(rng.standard_normal((b, t * hop)).astype(np.float32))
    phase1, amps, loud, g = jax.block_until_ready((phase1, amps, loud, g))

    for name, kfn in (("fill_only", _kernel_fill_only), ("full", po._kernel_cheb_bwd)):
        def fn(x, kfn=kfn):
            p, a, l, gg = x
            outs = run_variant(kfn, p, a, l, gg)
            return sum(jnp.sum(o) for o in outs)

        dt = marginal_time(lambda xs, kfn=kfn: fn(xs), (phase1, amps, loud, g))
        print(f"{name:10s} {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
