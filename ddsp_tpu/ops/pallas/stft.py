"""Fused Pallas power-STFT for the MSS loss scales.

Why a kernel (round-4 VERDICT #2): the XLA hop-blocked STFT
(ops/spectral._spectrogram_hopblocked) is mathematically minimal -- the
Hann window is folded into the DFT matrices and no framed tensor is
materialized -- but each of its n_fft/hop accumulation matmuls is a
separate XLA dot whose (T, bins) f32 partial round-trips HBM, and the
magnitude is another full-tensor elementwise pass.  Per MSS scale that
fixed ~0.2 ms of HBM traffic dominates the small scales (measured flat
per-scale cost while MACs scale with n; scripts/profile_mss.py).  Two
pure-XLA restructurings (phase-decimated full-depth matmuls; the classic
framed-matmul form) were built and measured SLOWER or tied -- the
movement, not the matmul shape, is the cost (docs/PERFORMANCE.md round 5).

This kernel keeps the whole per-scale pipeline in VMEM: the signal's hop
blocks are resident once per batch row, the n_fft/hop shallow matmuls
accumulate in VMEM scratch, and |S|^2 is computed in the epilogue -- HBM
sees one read of the signal and one write of the magnitudes.

Layout notes (v2, after the first on-chip attempt measured SLOWER than
XLA): hop blocks are lane-padded to 128 so every DMA is dense (a
(rows, 16) bf16 array transfers in 32-byte bursts -- ~8x wasted HBM
cycles); the DFT matrices carry matching zero rows, which adds MACs only
at the small scales where MACs are negligible.  The bin-tile grid axis
is OUTERMOST so weight tiles are fetched bins_pad/ct times total rather
than once per (batch row x bin tile).

The backward is a second kernel over the transposed filterbank: with
dmag and the signal's hop blocks both prepended with (n_fft/hop - 1)
zero rows, dx_blocks[r] = sum_j (2 re dmag)[r+j] @ W_{k-1-j}^T -- the
SAME shifted-row structure as the forward, so each grid cell owns a
disjoint output row range and the frame-overlap scatter needs no
cross-cell accumulation; bin tiles write disjoint partial outputs that
sum outside.  re/im are recomputed in-kernel (2 extra MXU passes beat
materializing them to HBM).

Numerics match the XLA hop-blocked path: bfloat16 matmul inputs, float32
accumulation, float32 magnitudes (the MSS training configuration;
reference trains under fp16 AMP, train/train.py:50).  The float32
exact-eval mode stays on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the 16 MB core VMEM


def _ru(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=None)
def _wmats(n_fft: int, hop: int, bins_pad: int):
    """Hann-windowed rDFT matrices in hop-padded block layout: block j of
    the (kb * hop_pad, bins_pad) matrix holds rows [j*hop, (j+1)*hop) of
    the (n_fft, bins) matrix at rows [j*hop_pad, j*hop_pad + hop), zeros
    elsewhere (matching the lane-padded hop blocks).  Also returns the
    transposes (bins_pad, kb * hop_pad) for the backward."""
    kb = n_fft // hop
    hop_pad = _ru(hop, LANE)
    bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(bins)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    cos = (win[:, None] * np.cos(ang)).astype(np.float32)
    sin = (win[:, None] * np.sin(ang)).astype(np.float32)
    cos2 = np.zeros((kb * hop_pad, bins_pad), np.float32)
    sin2 = np.zeros((kb * hop_pad, bins_pad), np.float32)
    for j in range(kb):
        cos2[j * hop_pad : j * hop_pad + hop, :bins] = cos[
            j * hop : (j + 1) * hop
        ]
        sin2[j * hop_pad : j * hop_pad + hop, :bins] = sin[
            j * hop : (j + 1) * hop
        ]
    return cos2, sin2, cos2.T.copy(), sin2.T.copy()


def _pick_tiles(n_fft, hop, t_pad, bins_pad, backward):
    """(frame_tile, bin_tile) under the VMEM budget.  Frame tiles are
    sublane multiples; bin tiles divide bins_pad."""
    kb = n_fft // hop
    hop_pad = _ru(hop, LANE)
    wrows = kb * hop_pad
    for ct in [c for c in range(bins_pad, 0, -LANE) if bins_pad % c == 0]:
        ft = min(t_pad, 2048)
        while ft >= 8:
            w_bytes = 2 * 2 * wrows * ct * 2  # cos+sin, dbl-buffered, bf16
            x_bytes = 2 * (ft + 64) * hop_pad * 2
            if backward:
                w_bytes *= 2  # + transposes
                scratch = 2 * (ft + kb) * ct * 4  # re/im recompute tiles
                out_b = 2 * ft * hop_pad * 4
            else:
                scratch = 2 * ft * ct * 4
                out_b = 2 * ft * ct * 4
            if w_bytes + x_bytes + scratch + out_b <= VMEM_BUDGET:
                return ft, ct
            ft //= 2
    return 8, bins_pad


def _fwd_kernel(kb, ft, hop_pad, x_ref, xtail_ref, wc_ref, ws_ref, o_ref,
                re_ref, im_ref):
    # x arrives as a PER-TILE block plus the next 8 rows (a second input
    # with a shifted index map) so the pipeline can double-buffer frame
    # tiles; Mosaic's sublane-alignment rule is satisfied because the
    # j-shifted frame rows are VALUE slices of the concatenated window.
    xwin = jnp.concatenate([x_ref[0], xtail_ref[0]], axis=0)
    re_ref[:] = jnp.zeros_like(re_ref)
    im_ref[:] = jnp.zeros_like(im_ref)
    for j in range(kb):
        seg = xwin[j : j + ft]
        wc = wc_ref[pl.ds(j * hop_pad, hop_pad), :]
        ws = ws_ref[pl.ds(j * hop_pad, hop_pad), :]
        re_ref[:] += jax.lax.dot_general(
            seg, wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        im_ref[:] += jax.lax.dot_general(
            seg, ws, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    re = re_ref[:]
    im = im_ref[:]
    o_ref[0] = re * re + im * im


def _bwd_kernel(kb, fr, hop_pad, x_ref, dm_ref, wc_ref, ws_ref,
                wct_ref, wst_ref, o_ref, re_ref, im_ref):
    r0 = pl.program_id(2) * fr
    fcnt = fr + kb - 1 if kb > 1 else fr
    # aligned window loads + value slicing (see _fwd_kernel note)
    xwin = x_ref[0, pl.ds(r0, fr + 16), :]
    # recompute re/im for frames g in [r0, r0 + fcnt) at this bin tile
    re_ref[:] = jnp.zeros_like(re_ref)
    im_ref[:] = jnp.zeros_like(im_ref)
    for j in range(kb):
        seg = xwin[j : j + fcnt]
        wc = wc_ref[pl.ds(j * hop_pad, hop_pad), :]
        ws = ws_ref[pl.ds(j * hop_pad, hop_pad), :]
        re_ref[:] += jax.lax.dot_general(
            seg, wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        im_ref[:] += jax.lax.dot_general(
            seg, ws, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dm = dm_ref[0, pl.ds(r0, fr + 8), :][0:fcnt].astype(jnp.float32)
    dre = (2.0 * re_ref[:] * dm).astype(wct_ref.dtype)
    dim = (2.0 * im_ref[:] * dm).astype(wst_ref.dtype)
    acc = None
    for jp in range(kb):
        wct = wct_ref[:, pl.ds((kb - 1 - jp) * hop_pad, hop_pad)]
        wst = wst_ref[:, pl.ds((kb - 1 - jp) * hop_pad, hop_pad)]
        part = jax.lax.dot_general(
            dre[jp : jp + fr], wct, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            dim[jp : jp + fr], wst, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    o_ref[0, 0] = acc


def _stft_pow_impl(xb, n_fft, hop, n_frames, interpret):
    b, n_blocks, _ = xb.shape
    kb = n_fft // hop
    assert kb <= 8, "aligned-window trick needs n_fft/hop <= 8"
    bins = n_fft // 2 + 1
    bins_pad = _ru(bins, LANE)
    hop_pad = _ru(hop, LANE)
    ft, ct = _pick_tiles(n_fft, hop, _ru(n_frames, 8), bins_pad, False)
    t_pad = _ru(n_frames, ft)
    rows = t_pad + 8  # the kernel's aligned window loads ft+8 rows
    xb = jnp.pad(
        xb.astype(jnp.bfloat16),
        ((0, 0), (0, max(0, rows - n_blocks)), (0, hop_pad - hop)),
    )[:, :rows]
    cos, sin, _, _ = _wmats(n_fft, hop, bins_pad)
    wc = jnp.asarray(cos, jnp.bfloat16)
    ws = jnp.asarray(sin, jnp.bfloat16)
    grid = (bins_pad // ct, b, t_pad // ft)  # weights outermost: fetched
    # bins_pad/ct times total, x once per (c, b)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, kb, ft, hop_pad),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, bins_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, ft, hop_pad), lambda c, i, t: (i, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, hop_pad),
                lambda c, i, t: (i, (t + 1) * (ft // 8), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kb * hop_pad, ct), lambda c, i, t: (0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kb * hop_pad, ct), lambda c, i, t: (0, c),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ft, ct), lambda c, i, t: (i, t, c), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((ft, ct), jnp.float32),
            pltpu.VMEM((ft, ct), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * kb * hop_pad * bins_pad * 2,
            bytes_accessed=b * (rows * hop_pad * 2 + t_pad * bins_pad * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xb, xb, wc, ws)
    return out[:, :n_frames, :bins]


def _stft_pow_bwd_impl(xb, dmag, n_fft, hop, n_frames, interpret):
    b, n_blocks, _ = xb.shape
    kb = n_fft // hop
    bins = n_fft // 2 + 1
    bins_pad = _ru(bins, LANE)
    hop_pad = _ru(hop, LANE)
    # zero-prepend (kb-1) rows so every output row's frame sum is in-range
    # (module docstring); pad row counts to the tile grid.
    fr, ct = _pick_tiles(n_fft, hop, _ru(n_blocks, 8), bins_pad, True)
    r_pad = _ru(n_blocks, fr)
    rows_needed = r_pad + 16  # the kernel's aligned window loads fr+16 rows
    x2 = jnp.pad(
        xb.astype(jnp.bfloat16),
        (
            (0, 0),
            (kb - 1, rows_needed - (n_blocks + kb - 1)),
            (0, hop_pad - hop),
        ),
    )
    dm2 = jnp.pad(
        dmag.astype(jnp.bfloat16),
        (
            (0, 0),
            (kb - 1, r_pad + 8 - (n_frames + kb - 1)),
            (0, bins_pad - bins),
        ),
    )
    cos, sin, cosT, sinT = _wmats(n_fft, hop, bins_pad)
    wc = jnp.asarray(cos, jnp.bfloat16)
    ws = jnp.asarray(sin, jnp.bfloat16)
    wct = jnp.asarray(cosT, jnp.bfloat16)
    wst = jnp.asarray(sinT, jnp.bfloat16)
    nc = bins_pad // ct
    fcnt = fr + kb - 1 if kb > 1 else fr
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, kb, fr, hop_pad),
        out_shape=jax.ShapeDtypeStruct((nc, b, r_pad, hop_pad), jnp.float32),
        grid=(nc, b, r_pad // fr),
        in_specs=[
            pl.BlockSpec(
                (1, x2.shape[1], hop_pad), lambda c, i, r: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, dm2.shape[1], ct), lambda c, i, r: (i, 0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kb * hop_pad, ct), lambda c, i, r: (0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kb * hop_pad, ct), lambda c, i, r: (0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ct, kb * hop_pad), lambda c, i, r: (c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ct, kb * hop_pad), lambda c, i, r: (c, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, fr, hop_pad), lambda c, i, r: (c, i, r, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((fcnt, ct), jnp.float32),
            pltpu.VMEM((fcnt, ct), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r_pad * kb * hop_pad * bins_pad * 4,
            bytes_accessed=b
            * (x2.shape[1] * hop_pad * 2 + dm2.shape[1] * bins_pad * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, dm2, wc, ws, wct, wst)
    # With both inputs zero-prepended by (kb-1) rows, out row a pairs
    # DRE[a + (kb-1-j)] with W_j^T -- already dxb[a] in UNSHIFTED block
    # coordinates (see module docstring derivation), so no final shift.
    # Bin-tile partials are disjoint grid cells; sum them here.
    return out.sum(axis=0)[:, :n_blocks, :hop]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def stft_power_blocked(xb, n_fft, hop, n_frames, interpret=False):
    """Fused power-STFT of hop-blocked signals.

    Args:
      xb: (B, Lp/hop, hop) float32 hop blocks of the (center-padded)
        signal -- a free reshape of the padded (B, Lp) signal.
      n_fft / hop / n_frames: scale geometry (hop must divide n_fft).

    Returns:
      (B, n_frames, n_fft//2 + 1) float32 power magnitudes |S|^2,
      bit-comparable to the XLA hop-blocked bf16 path (same bf16-input /
      f32-accumulate contraction, reduction order differs within f32
      rounding).
    """
    return _stft_pow_impl(xb, n_fft, hop, n_frames, interpret)


def _stft_pow_fwd(xb, n_fft, hop, n_frames, interpret):
    return _stft_pow_impl(xb, n_fft, hop, n_frames, interpret), xb


def _stft_pow_bwd(n_fft, hop, n_frames, interpret, xb, dmag):
    dxb = _stft_pow_bwd_impl(xb, dmag, n_fft, hop, n_frames, interpret)
    return (dxb,)


stft_power_blocked.defvjp(_stft_pow_fwd, _stft_pow_bwd)


def spectrogram_power_pallas(
    x: jnp.ndarray, n_fft: int, hop: int, interpret: bool = False
) -> jnp.ndarray:
    """torchaudio-convention power spectrogram via the fused kernel:
    (..., L) -> (..., bins, T).  Drop-in for ops/spectral.spectrogram
    (power=2, matmul_dtype=bfloat16 semantics)."""
    from ddsp_tpu.ops.spectral import reflect_pad

    lead = x.shape[:-1]
    xp = reflect_pad(x, n_fft // 2).reshape(-1, x.shape[-1] + n_fft)
    lp = xp.shape[-1]
    n_frames = 1 + (lp - n_fft) // hop
    lb = _ru(lp, hop)
    if lb > lp:
        xp = jnp.pad(xp, ((0, 0), (0, lb - lp)))
    xb = xp.reshape(xp.shape[0], lb // hop, hop)
    mag = stft_power_blocked(xb, n_fft, hop, n_frames, interpret)
    mag = mag.reshape(*lead, n_frames, n_fft // 2 + 1)
    return jnp.moveaxis(mag, -2, -1)
