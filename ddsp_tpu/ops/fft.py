"""FFTs as MXU matmuls: the TPU-native spectral backbone.

The TPU backend used here exposes **no XLA FFT op** (verified empirically:
``jnp.fft.*`` fails with UNIMPLEMENTED on device).  This is not a loss: on
TPU the fastest way to evaluate the short-to-medium DFTs this framework needs
is the MXU itself.  Two strategies:

* **Direct DFT matmul** for n <= 4096 (every STFT size the MSS loss uses,
  the noise-filter FFTs, the FIR design irfft): a precomputed (n, n/2+1)
  cos/sin matrix pair; a batch of frames becomes a single large matmul that
  the MXU eats at full rate.
* **Four-step Cooley-Tukey** for large power-of-two n (the reverb's
  ~2^18-point convolutions): reshape to (N1, N2), DFT_N1 matmul, twiddle,
  DFT_N2 matmul -- two batched 512x512-class matmuls instead of a serial
  butterfly network, which is exactly how large FFTs are mapped to matrix
  engines.

Complex values are carried as (re, im) float32 pairs throughout -- no
complex dtypes touch the device.  One code path for CPU and TPU; unit tests
verify against numpy's FFT.

Replaces the cuFFT usage implicit in the reference's ``torch.fft`` calls
(reference: model/ddsp/filtered_noise.py:10,29, model/ddsp/reverb.py:36).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DIRECT_MAX = 4096  # largest n evaluated by a single DFT matrix

# Matmul precision for all DFT matmuls.  'tensorfloat32' measures ~1.5x
# faster than full float32 on the MXU at ~87 dB agreement (inaudible);
# ignored on CPU.  Override with set_fft_precision('highest') for
# bit-level verification runs.
_PRECISION = "tensorfloat32"


def set_fft_precision(precision: str) -> None:
    global _PRECISION
    _PRECISION = precision


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_PRECISION)


def dft_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Matmul at the global DFT precision (see ``set_fft_precision``).

    Public hook for callers that fold their own linear maps into the
    spectral pipeline (e.g. the fused FIR-design matrices in ops/fir.py)
    and must track the same precision contract as the DFT matmuls."""
    return _mm(a, b)


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def next_fft_size(n: int) -> int:
    """Smallest supported FFT size >= n: a power of two or 3 * 2^k.

    Allowing the 3*2^k family shaves up to 25% off convolution transform
    sizes (e.g. the reverb's 132163-point requirement: 196608 vs 262144).
    """
    p2 = next_pow2(n)
    p3 = 3 * next_pow2((n + 2) // 3)
    best = min(x for x in (p2, p3) if x >= n)
    return best


# --- precomputed matrices (host, cached, closed over as constants) -----------
@functools.lru_cache(maxsize=None)
def _rdft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin matrices (n, n//2+1): X[k] = sum_t x[t] e^{-2pi i t k / n}."""
    t = np.arange(n)[:, None]
    k = np.arange(n // 2 + 1)[None, :]
    ang = -2.0 * np.pi * t * k / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _irdft_mats(n_bins: int, n_out: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse-rDFT matrices (n_bins, n_out) for irfft(X, n=n_out).

    x[t] = (1/n) [ X[0] + 2 sum_{0<k<n/2} (re cos - im sin) + X[n/2] cos ].
    """
    n = n_out
    k = np.arange(n_bins)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    scale = np.full((n_bins, 1), 2.0 / n)
    scale[0] = 1.0 / n
    if n_bins - 1 == n // 2 and n % 2 == 0:
        scale[-1] = 1.0 / n
    re_mat = np.cos(ang) * scale
    im_mat = -np.sin(ang) * scale
    return re_mat.astype(np.float32), im_mat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Full complex DFT matrices (n, n)."""
    t = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    ang = -2.0 * np.pi * t * k / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _twiddle(n1: int, n2: int) -> Tuple[np.ndarray, np.ndarray]:
    """W_N^{k1 n2} twiddles, shape (n1, n2), N = n1*n2."""
    k1 = np.arange(n1)[:, None]
    n2i = np.arange(n2)[None, :]
    ang = -2.0 * np.pi * k1 * n2i / (n1 * n2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _split_factors(n: int) -> Tuple[int, int]:
    """n = n1 * n2 with both factors <= DIRECT_MAX, balanced for squarish
    matmuls.  Supports any n with a valid divisor pair (powers of two and
    the 3*2^k family in practice)."""
    assert n > DIRECT_MAX
    best = None
    d = 1
    while d * d <= n:
        if n % d == 0:
            n1, n2 = n // d, d
            if n1 <= DIRECT_MAX and n2 <= DIRECT_MAX:
                if best is None or (n1 + n2) < sum(best):
                    best = (n1, n2)
        d += 1
    if best is None:
        raise ValueError(f"FFT size {n} has no two-stage factorization")
    return best


def _cmatmul(ar, ai, br, bi, matmul_dtype=None):
    """(ar+i ai) @ (br+i bi) as four real matmuls.

    ``matmul_dtype`` casts the matmul inputs while accumulating in float32
    (same contract as rfft_pair's parameter).
    """
    if matmul_dtype is not None:
        mm = functools.partial(jnp.matmul, preferred_element_type=jnp.float32)
        ar, ai = ar.astype(matmul_dtype), ai.astype(matmul_dtype)
        br, bi = br.astype(matmul_dtype), bi.astype(matmul_dtype)
        return mm(ar, br) - mm(ai, bi), mm(ar, bi) + mm(ai, br)
    return _mm(ar, br) - _mm(ai, bi), _mm(ar, bi) + _mm(ai, br)


def _fft_ct(xr: jnp.ndarray, xi: jnp.ndarray, n: int, matmul_dtype=None):
    """Four-step Cooley-Tukey complex FFT over the last axis."""
    n1, n2 = _split_factors(n)
    lead = xr.shape[:-1]
    ar = xr.reshape(*lead, n1, n2)
    ai = xi.reshape(*lead, n1, n2)
    # Step 1: DFT over n1 (the slow axis): B[k1, n2] = sum_n1 A[n1, n2] W^{n1 k1}
    d1r, d1i = (jnp.asarray(m) for m in _dft_mats(n1))
    if matmul_dtype is not None:
        ar, ai = ar.astype(matmul_dtype), ai.astype(matmul_dtype)
        d1r, d1i = d1r.astype(matmul_dtype), d1i.astype(matmul_dtype)
        mmfn = functools.partial(jnp.matmul, preferred_element_type=jnp.float32)
    else:
        mmfn = _mm

    def ein(a, d):
        # einsum("...nm,nk->...km") as a last-axis matmul (the einsum form
        # lowers to a batched-dot thunk CPU XLA cannot run for bf16->f32;
        # the transposes fuse away)
        return jnp.swapaxes(mmfn(jnp.swapaxes(a, -1, -2), d), -1, -2)

    br = ein(ar, d1r) - ein(ai, d1i)
    bi = ein(ar, d1i) + ein(ai, d1r)
    # Step 2: twiddle by W_N^{k1 n2} (elementwise, stays float32)
    tr, ti = (jnp.asarray(m) for m in _twiddle(n1, n2))
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    # Step 3: DFT over n2: X[k1, k2] = sum_n2 C[k1, n2] W_{n2}^{n2 k2}
    d2r, d2i = (jnp.asarray(m) for m in _dft_mats(n2))
    er, ei = _cmatmul(
        cr, ci, jnp.asarray(d2r), jnp.asarray(d2i), matmul_dtype
    )
    # X[k1 + n1 k2] = E[k1, k2] -> transpose to (k2, k1) then flatten
    er = jnp.swapaxes(er, -1, -2).reshape(*lead, n)
    ei = jnp.swapaxes(ei, -1, -2).reshape(*lead, n)
    return er, ei


def fft_pair(
    xr: jnp.ndarray, xi: Optional[jnp.ndarray], n: int, matmul_dtype=None
):
    """Complex FFT (re, im) over the last axis, zero-padding to n."""
    if xr.shape[-1] < n:
        pad = [(0, 0)] * (xr.ndim - 1) + [(0, n - xr.shape[-1])]
        xr = jnp.pad(xr, pad)
        xi = None if xi is None else jnp.pad(xi, pad)
    if xi is None:
        xi = jnp.zeros_like(xr)
    if n <= DIRECT_MAX:
        dr, di = (jnp.asarray(m) for m in _dft_mats(n))
        return _cmatmul(xr, xi, dr, di, matmul_dtype)
    return _fft_ct(xr, xi, n, matmul_dtype)


def rfft_pair(x: jnp.ndarray, n: Optional[int] = None, matmul_dtype=None):
    """Real-input FFT over the last axis -> (re, im), each (..., n//2+1).

    ``matmul_dtype`` (e.g. jnp.bfloat16) casts the matmul *inputs* while
    accumulating in float32 -- 2x MXU rate for loss-grade spectra (the
    reference trains its STFT losses under fp16 AMP, train/train.py:50).
    """
    n = n or x.shape[-1]
    if n <= DIRECT_MAX:
        cos, sin = _rdft_mats(n)
        if x.shape[-1] < n:
            # Zero-padding the input would spend half the matmul on zeros
            # (e.g. the noise FIR transforms 512-sample blocks at n=1024);
            # slicing the DFT matrix rows is the same contraction without
            # the dead MACs.
            cos, sin = cos[: x.shape[-1]], sin[: x.shape[-1]]
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        if matmul_dtype is not None:
            x = x.astype(matmul_dtype)
            cos, sin = cos.astype(matmul_dtype), sin.astype(matmul_dtype)
            mm = functools.partial(
                jnp.matmul, preferred_element_type=jnp.float32
            )
            return mm(x, cos), mm(x, sin)
        return _mm(x, cos), _mm(x, sin)
    re, im = fft_pair(x, None, n, matmul_dtype)
    return re[..., : n // 2 + 1], im[..., : n // 2 + 1]


def irfft_pair(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n: Optional[int] = None,
    out_len: Optional[int] = None,
    matmul_dtype=None,
):
    """Inverse of rfft_pair: (..., n//2+1) spectra -> (..., n) real signal.

    ``out_len`` keeps only the first ``out_len`` output samples.  In the
    direct-matmul regime this truncates the inverse-DFT matrix's *columns*
    on the host, halving the matmul when only the causal half of a linear
    convolution is wanted (e.g. the per-frame noise FIR keeps 512 of 1024
    inverse outputs) -- XLA cannot shrink a dot through a downstream slice.
    """
    n_bins = re.shape[-1]
    n = n or 2 * (n_bins - 1)
    if n <= DIRECT_MAX:
        mr, mi = _irdft_mats(n_bins, n)
        if out_len is not None and out_len < n:
            mr, mi = mr[:, :out_len], mi[:, :out_len]
        mr, mi = jnp.asarray(mr), jnp.asarray(mi)
        if matmul_dtype is not None:
            re, im = re.astype(matmul_dtype), im.astype(matmul_dtype)
            mr, mi = mr.astype(matmul_dtype), mi.astype(matmul_dtype)
            mm = functools.partial(
                jnp.matmul, preferred_element_type=jnp.float32
            )
            return mm(re, mr) + mm(im, mi)
        return _mm(re, mr) + _mm(im, mi)
    # Large size: hermitian-extend and run a forward CT FFT with conjugation:
    # ifft(X) = conj(fft(conj(X))) / n; output is real by construction.
    assert n == 2 * (n_bins - 1), "large irfft requires full-bin spectra"
    tail_r = re[..., 1:-1][..., ::-1]
    tail_i = im[..., 1:-1][..., ::-1]
    full_r = jnp.concatenate([re, tail_r], axis=-1)
    full_i = jnp.concatenate([im, -tail_i], axis=-1)
    yr, yi = _fft_ct(full_r, -full_i, n, matmul_dtype)
    del yi  # imaginary residue is numerical noise for hermitian inputs
    out = yr / n
    if out_len is not None and out_len < n:
        out = out[..., :out_len]
    return out


def _reverse_spectrum(a: jnp.ndarray) -> jnp.ndarray:
    """Index map k -> (n - k) mod n over the last axis."""
    return jnp.concatenate([a[..., :1], a[..., 1:][..., ::-1]], axis=-1)


# --- permuted-spectrum Cooley-Tukey (the convolution fast path) --------------
#
# The four-step CT FFT's last move -- de-interleaving X[k1 + n1 k2] =
# E[k1, k2] into natural order -- is pure data movement.  Convolution never
# needs natural order: the spectrum product is elementwise, so as long as
# forward, kernel spectrum, and inverse share ONE (k1, k2) layout, the
# "bit-reversal" cancels.  These transforms keep spectra in the permuted
# (n1, n2) layout and build the inverse directly from the factorization
#
#   y[a n2 + b] = (1/n) sum_k1 W_n1^{-a k1} [ W_n^{-b k1}
#                   sum_k2 P[k1, k2] W_n2^{-b k2} ]
#
# so BOTH directions are (matmul, twiddle-elementwise, matmul) with no
# transposes, no spectrum reversals, and no hermitian pack/unpack (for a
# SHARED real kernel, packing rows (2i, 2i+1) as re+j*im needs no
# separation at all: conv(x + j y, k) = conv(x, k) + j conv(y, k)).
# This removes the proportional data-movement overhead the round-4
# chunk-size A/B proved was bounding the CT path (docs/PERFORMANCE.md).


def _ct_fwd_permuted(xr, xi, n: int, matmul_dtype=None):
    """Complex FFT of (..., n) rows -> permuted spectrum (..., n1, n2),
    P[..., k1, k2] = X[..., k1 + n1*k2]."""
    n1, n2 = _split_factors(n)
    lead = xr.shape[:-1]
    ar = xr.reshape(*lead, n1, n2)
    ai = xi.reshape(*lead, n1, n2)
    d1r, d1i = (jnp.asarray(m) for m in _dft_mats(n1))
    d2r, d2i = (jnp.asarray(m) for m in _dft_mats(n2))
    tr, ti = (jnp.asarray(m) for m in _twiddle(n1, n2))
    if matmul_dtype is not None:
        mm = functools.partial(jnp.matmul, preferred_element_type=jnp.float32)
        ar, ai = ar.astype(matmul_dtype), ai.astype(matmul_dtype)
        d1r, d1i = d1r.astype(matmul_dtype), d1i.astype(matmul_dtype)
        d2r, d2i = d2r.astype(matmul_dtype), d2i.astype(matmul_dtype)
    else:
        mm = _mm
    # Step 1: B[k1, b] = sum_a A[a, b] W_n1^{a k1}  (contract the -2 axis;
    # D1 is symmetric so D1^T == D1)
    br = mm(d1r, ar) - mm(d1i, ai)
    bi = mm(d1r, ai) + mm(d1i, ar)
    # Step 2: twiddle W_n^{k1 b} -- elementwise, float32
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    if matmul_dtype is not None:
        cr, ci = cr.astype(matmul_dtype), ci.astype(matmul_dtype)
    # Step 3: P[k1, k2] = sum_b C[k1, b] W_n2^{b k2}
    pr = mm(cr, d2r) - mm(ci, d2i)
    pi = mm(cr, d2i) + mm(ci, d2r)
    return pr, pi


def _ct_inv_permuted(pr, pi, n: int, matmul_dtype=None):
    """Inverse of :func:`_ct_fwd_permuted`: permuted spectrum
    (..., n1, n2) -> complex time rows (..., n) in natural order."""
    n1, n2 = _split_factors(n)
    lead = pr.shape[:-2]
    d1r, d1i = (jnp.asarray(m) for m in _dft_mats(n1))
    d2r, d2i = (jnp.asarray(m) for m in _dft_mats(n2))
    tr, ti = (jnp.asarray(m) for m in _twiddle(n1, n2))
    if matmul_dtype is not None:
        mm = functools.partial(jnp.matmul, preferred_element_type=jnp.float32)
        pr, pi = pr.astype(matmul_dtype), pi.astype(matmul_dtype)
        d1r, d1i = d1r.astype(matmul_dtype), d1i.astype(matmul_dtype)
        d2r, d2i = d2r.astype(matmul_dtype), d2i.astype(matmul_dtype)
    else:
        mm = _mm
    # Step 1: Q[k1, b] = sum_k2 P[k1, k2] conj(W_n2)^{k2 b}
    qr = mm(pr, d2r) + mm(pi, d2i)
    qi = mm(pi, d2r) - mm(pr, d2i)
    # Step 2: conjugate twiddle
    rr = qr * tr + qi * ti
    ri = qi * tr - qr * ti
    if matmul_dtype is not None:
        rr, ri = rr.astype(matmul_dtype), ri.astype(matmul_dtype)
    # Step 3: y[a, b] = sum_k1 conj(W_n1)^{a k1} R[k1, b]
    yr = mm(d1r, rr) + mm(d1i, ri)
    yi = mm(d1r, ri) - mm(d1i, rr)
    scale = 1.0 / n
    return (yr * scale).reshape(*lead, n), (yi * scale).reshape(*lead, n)


def _rfft_convolve_large_shared(
    signal: jnp.ndarray,
    kernel: jnp.ndarray,
    kernel_len: int,
    n: int,
    matmul_dtype=None,
) -> jnp.ndarray:
    """Large-n causal convolution of real rows with ONE shared real kernel.

    Rows (2i, 2i+1) ride one complex transform as re + j*im; because the
    kernel is shared and real, conv(x + j y) = conv(x) + j conv(y), so the
    spectrum product is a single elementwise complex multiply with the
    kernel's permuted spectrum -- no hermitian separation/repacking (the
    round-4 packed path spent ~30 elementwise ops + two full-spectrum
    reversals per row pair on an algebraic identity).  Odd batches pad one
    zero row instead of falling back to hermitian extension.
    """
    b, length = signal.shape
    rows = (b + 1) // 2
    sig = jnp.pad(signal, ((0, 2 * rows - b), (0, n - length)))
    pr, pi = _ct_fwd_permuted(sig[0::2], sig[1::2], n, matmul_dtype)
    k = jnp.pad(
        kernel[..., :kernel_len], ((0, 0), (0, n - kernel_len))
    )
    kr, ki = _ct_fwd_permuted(k, jnp.zeros_like(k), n, matmul_dtype)
    wr = pr * kr - pi * ki
    wi = pr * ki + pi * kr
    yr, yi = _ct_inv_permuted(wr, wi, n, matmul_dtype)
    out = jnp.stack([yr, yi], axis=1).reshape(2 * rows, n)
    return out[:b, :length]


def _rfft_convolve_large_packed(
    signal: jnp.ndarray,
    kernel: jnp.ndarray,
    kernel_len: int,
    n: int,
    matmul_dtype=None,
) -> jnp.ndarray:
    """Large-n convolution of an even batch of real signals, packed in pairs.

    Classic real-FFT batching: rows (2i, 2i+1) ride one complex FFT as
    re + j*im; the two spectra separate by hermitian (anti)symmetry,
    multiply with the kernel spectrum, re-pack, and one inverse complex FFT
    yields both outputs in its real/imaginary parts.  Halves the Cooley-
    Tukey matmul work of the reverb-scale convolutions vs transforming each
    real row separately.
    """
    length = signal.shape[-1]
    b = signal.shape[0]
    ev, od = signal[0::2], signal[1::2]
    pad = [(0, 0), (0, n - length)]
    zr, zi = _fft_ct(jnp.pad(ev, pad), jnp.pad(od, pad), n, matmul_dtype)
    zr_rev, zi_rev = _reverse_spectrum(zr), _reverse_spectrum(zi)
    x1r = 0.5 * (zr + zr_rev)
    x1i = 0.5 * (zi - zi_rev)
    x2r = 0.5 * (zi + zi_rev)
    x2i = 0.5 * (zr_rev - zr)

    kr, ki = fft_pair(kernel[..., :kernel_len], None, n, matmul_dtype)
    if kernel.shape[0] == 1:
        kr_e = kr_o = kr
        ki_e = ki_o = ki
    else:
        kr_e, kr_o = kr[0::2], kr[1::2]
        ki_e, ki_o = ki[0::2], ki[1::2]
    y1r = x1r * kr_e - x1i * ki_e
    y1i = x1r * ki_e + x1i * kr_e
    y2r = x2r * kr_o - x2i * ki_o
    y2i = x2r * ki_o + x2i * kr_o

    # repack W = Y1 + j*Y2 and invert: ifft(W) = conj(fft(conj(W))) / n
    wr = y1r - y2i
    wi = y1i + y2r
    ur, ui = _fft_ct(wr, -wi, n, matmul_dtype)
    y_ev = ur * (1.0 / n)
    y_od = ui * (-1.0 / n)
    out = jnp.stack([y_ev, y_od], axis=1).reshape(b, n)
    return out[..., :length]


def _fft_row_cost(m: int) -> int:
    """Relative per-row MAC count of an m-point matmul FFT."""
    if m <= DIRECT_MAX:
        return m * m
    n1, n2 = _split_factors(m)
    return m * (n1 + n2)


def _overlap_save_plan(length: int, kernel_len: int, max_chunks: int = None):
    """Pick the chunk count minimizing total matmul-FFT work.

    Matmul-FFT cost grows ~ m^1.5 per row, so overlap-save with k chunks
    (each transformed at next_fft_size(ceil(L/k) + klen - 1)) beats one
    big transform once chunks stay comfortably longer than the kernel --
    e.g. the reverb conv (L=88064, klen=44100): one 196608-point FFT ->
    two 98304-point FFTs, ~29% fewer MACs.  The search range scales with
    length/kernel (a fixed small cap left 40% of the MACs on the table at
    the 60 s render length, round-4 profile); chunks shorter than the
    kernel never win, so the cap is a search bound, not a cost knob.
    """
    if max_chunks is None:
        max_chunks = min(64, max(6, length // max(kernel_len, 1)))
    best_k, best_cost = 1, None
    for k in range(1, max_chunks + 1):
        c = -(-length // k)
        m = next_fft_size(c + kernel_len - 1)
        cost = k * _fft_row_cost(m)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def _rfft_convolve_overlap_save(
    signal: jnp.ndarray,
    kernel: jnp.ndarray,
    kernel_len: int,
    k: int,
    matmul_dtype=None,
) -> jnp.ndarray:
    """Overlap-save chunked causal convolution (shared kernel, 2-D batch)."""
    b, length = signal.shape
    c = -(-length // k)
    m = next_fft_size(c + kernel_len - 1)
    halo = kernel_len - 1
    # Block i covers output samples [i*c, i*c + c); its circular conv at
    # size m over input samples [i*c - halo, i*c - halo + m) has no
    # wraparound inside the valid window [halo, halo + c).
    total = halo + (k - 1) * c + m
    padded = jnp.pad(signal, ((0, 0), (halo, total - halo - length)))
    blocks = jnp.stack(
        [padded[:, i * c : i * c + m] for i in range(k)], axis=1
    ).reshape(b * k, m)
    if kernel.shape[0] == 1 and m > DIRECT_MAX:
        conv = _rfft_convolve_large_shared(
            blocks, kernel, kernel_len, m, matmul_dtype
        )
    elif (b * k) % 2 == 0 and m > DIRECT_MAX:
        conv = _rfft_convolve_large_packed(
            blocks, kernel, kernel_len, m, matmul_dtype
        )
    else:
        sr, si = rfft_pair(blocks, m, matmul_dtype)
        kr, ki = rfft_pair(kernel[..., :kernel_len], m, matmul_dtype)
        conv = irfft_pair(
            sr * kr - si * ki, sr * ki + si * kr, m, matmul_dtype=matmul_dtype
        )
    valid = conv[:, halo : halo + c].reshape(b, k * c)
    return valid[:, :length]


def rfft_convolve_same(
    signal: jnp.ndarray,
    kernel: jnp.ndarray,
    kernel_len: int,
    matmul_dtype=None,
):
    """Causal linear convolution truncated to the signal length.

    ``out[t] = sum_{k<=t, k<kernel_len} kernel[k] * signal[t-k]``
    -- the exact semantics of the reference's pad/crop ``fft_convolve``
    (reference: filtered_noise.py:25-32; see ops/fir.py).  Computed by a
    circular convolution at the next supported size >= L + kernel_len - 1
    (no wraparound), sized for the matmul-FFT machinery.  Large
    (Cooley-Tukey-sized) convolutions with ONE shared kernel row take the
    permuted-spectrum packed path (_rfft_convolve_large_shared: half the
    transform work, no transposes or hermitian packing, any batch
    parity); per-row kernels with even batches keep the hermitian packed
    path; long signals split into overlap-save chunks when that lowers
    total matmul-FFT work.
    """
    length = signal.shape[-1]
    n = next_fft_size(length + kernel_len - 1)
    if (
        n > DIRECT_MAX
        and signal.ndim == 2
        and kernel.ndim == 2
        and kernel.shape[0] == 1
    ):
        k = _overlap_save_plan(length, kernel_len)
        if k > 1:
            return _rfft_convolve_overlap_save(
                signal, kernel, kernel_len, k, matmul_dtype
            )
    if (
        n > DIRECT_MAX
        and signal.ndim == 2
        and kernel.ndim == 2
        and kernel.shape[0] == 1
    ):
        return _rfft_convolve_large_shared(
            signal, kernel, kernel_len, n, matmul_dtype
        )
    if (
        n > DIRECT_MAX
        and signal.ndim == 2
        and signal.shape[0] % 2 == 0
        and kernel.ndim == 2
        and kernel.shape[0] == signal.shape[0]
    ):
        return _rfft_convolve_large_packed(
            signal, kernel, kernel_len, n, matmul_dtype
        )
    sr, si = rfft_pair(signal, n, matmul_dtype)
    kr, ki = rfft_pair(kernel[..., :kernel_len], n, matmul_dtype)
    yr = sr * kr - si * ki
    yi = sr * ki + si * kr
    return irfft_pair(yr, yi, n, out_len=length, matmul_dtype=matmul_dtype)
