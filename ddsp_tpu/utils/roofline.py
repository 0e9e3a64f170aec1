"""Roofline / MFU accounting for the hot kernels.

Shared by scripts/roofline.py (the full report) and bench.py (the driver
metrics) so "speed-of-light per chip" is a computed number, not prose.
Counts model the actual implementations and cite them; see each function.

v5e ceilings (public spec / scaling-book numbers):

* MXU: 197e12 bf16 FLOP/s.  True-f32 matmuls (Precision.HIGHEST) split
  each operand into bf16 hi+lo and take ~6 passes (~1/6 rate); DEFAULT
  f32 ~3 passes (bf16x3).
* VPU: 8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85e12
  elementwise ops/s.
"""

from __future__ import annotations

MXU_BF16 = 197e12  # FLOP/s, v5e peak
MXU_F32_HIGHEST = MXU_BF16 / 6  # 6 bf16 passes per true-f32 matmul
MXU_F32_DEFAULT = MXU_BF16 / 3  # 3 bf16 passes (bf16x3)
VPU_OPS = 8 * 128 * 4 * 0.94e9  # ~3.85e12 elementwise ops/s

OSC_FWD_FRAMES_PER_BLOCK = 16  # banked2 forward default (measured best)
OSC_BWD_FRAMES_PER_BLOCK = 16  # backward default (12 MB of banks still fits)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def osc_counts(b: int, t: int, hop: int, n_h: int):
    """(fill_elements, fwd_contraction_MACs, bwd_contraction_MACs) for a
    production render through the fused Pallas oscillator.

    Models the round-3 'banked2' kernels (ops/pallas/oscillator.py): per
    ft-frame block the kernel fills an (HB, ft*hop) sine bank (HB =
    harmonics padded to a sublane multiple) with the ~6-VPU-op/element
    rotation chain, then runs ONE (ft+2, HB) x (HB, ft*hop) MXU
    contraction forward (_kernel_banked2 -- the ft+2 distinct frame rows
    replace round-2's 3ft redundant window stack) and THREE of that class
    backward (_kernel_banked2_bwd, which also fills a cosine bank: ~8
    ops/element for the joint fill).  T is padded to the block size, as
    the kernel pads it.

    Measured caveat (docs/PERFORMANCE.md round-3 update): the VPU fill
    term assumes all 4 ALU slots issue the rotation chain back-to-back;
    on the chip the serial tile dependency plus bank stores leave the
    fill ~2x above that ideal, which is where the remaining gap to this
    bound lives (contraction passes and bank bytes were measured to be
    minor: DEFAULT-precision and bf16-bank variants save < 10%).
    """
    hb = _round_up(n_h, 8)
    fwd_ft = OSC_FWD_FRAMES_PER_BLOCK
    bwd_ft = OSC_BWD_FRAMES_PER_BLOCK

    def counts(ft):
        t_pad = _round_up(t, ft)
        blocks = b * (t_pad // ft)
        length = ft * hop
        fill = blocks * hb * length
        macs = blocks * (ft + 2) * hb * length
        return fill, macs

    fill_fwd, fwd_macs = counts(fwd_ft)
    fill_bwd, bwd_macs = counts(bwd_ft)
    return fill_fwd, fwd_macs, 3 * bwd_macs


# Measured fill overhead: the rotation fill's bank STORES and issue slots
# cost ~as much again as its 6 arithmetic ops.  Established empirically
# across rounds 3-4 (docs/PERFORMANCE.md): every schedule that changes the
# dependency structure or op count ties or loses (cheb8 fill ~2 ops/elem:
# no faster; rot4 log-depth: 3.7x slower; k-chunked interleave: slower;
# block-shape sweep: flat), so the ~2x gap between the measured fill and
# the pure-ALU ideal is the cost of one store per bank element plus issue
# limits -- structural, not schedulable.  The ACHIEVABLE bound charges it;
# the IDEAL bound (ops only, zero store cost) is kept for the record.
OSC_FILL_STORE_ISSUE_FACTOR = 2.0


def osc_speed_of_light_s(
    b: int, t: int, hop: int, n_h: int, backward=False, achievable=False
):
    """Fill+contract lower bound (seconds) for the oscillator render.

    ``achievable=False``: the ideal bound -- rotation fill at the pure
    4-ALU VPU issue rate (6 ops/element forward, 8 backward) with ZERO
    store cost, plus the MXU contraction passes.  Structurally out of
    reach: the fill must store every bank element once.
    ``achievable=True``: fill charged at the measured store/issue factor
    (see OSC_FILL_STORE_ISSUE_FACTOR) -- what a perfect schedule of the
    shipped algorithm could actually reach on this hardware.
    """
    fill, fwd_macs, bwd_macs = osc_counts(b, t, hop, n_h)
    f = OSC_FILL_STORE_ISSUE_FACTOR if achievable else 1.0
    sol = f * 6 * fill / VPU_OPS + 2 * fwd_macs / MXU_F32_HIGHEST
    if backward:
        # Backward contractions run at the FULL bf16 MXU rate, not bf16x3:
        # inside Mosaic, DEFAULT-precision f32 dots are a single bf16 pass
        # (measured round 5: explicitly casting the three backward dots'
        # operands to bf16 changes the amp gradient by EXACTLY zero and
        # only adds conversion time -- scripts/ab_osc_bwd_contract.py).
        sol += f * 8 * fill / VPU_OPS + 2 * bwd_macs / MXU_BF16
    return sol


def crepe_window_macs(capacity: str = "tiny", window: int = 1024) -> int:
    """MACs for ONE CREPE window through the 6-conv stack + classifier.

    Models models/crepe.py (_layer + crepe_forward): per stage, the padded
    input length runs through a stride-s conv (c_in * c_out * k * out_len
    MACs), then maxpool(2) halves the length; the classifier is an
    (in_features, 360) dense layer.  BN/ReLU/pool elementwise work is
    bandwidth-trivial next to the convs and is not counted.
    """
    from ddsp_tpu.models.crepe import (
        CAPACITIES,
        KERNEL_SIZES,
        PADS,
        PITCH_BINS,
        STRIDES,
    )

    spec = CAPACITIES[capacity]
    length = window
    macs = 0
    for i in range(6):
        padded = length + PADS[i][0] + PADS[i][1]
        out_len = (padded - KERNEL_SIZES[i]) // STRIDES[i] + 1
        macs += (
            spec["in_channels"][i]
            * spec["out_channels"][i]
            * KERNEL_SIZES[i]
            * out_len
        )
        length = out_len // 2
    macs += spec["in_features"] * PITCH_BINS
    return macs


def encode_flops(b: int, frames: int, conf) -> int:
    """Total FLOPs of one batched feature extraction (encode path).

    Counts the CREPE conv stack over ``frames`` windows per example plus
    the loudness STFT (one n_fft x (n_fft/2+1) cos+sin matmul pair per
    frame, ops/spectral.py).  The 44.1k->16k polyphase resample and the
    pitch decode are <1% of this and are not counted.
    """
    crepe = frames * crepe_window_macs(conf.crepe_capacity, conf.crepe_window)
    loud = frames * conf.n_fft * (conf.n_fft // 2 + 1) * 2
    return 2 * b * (crepe + loud)


def stft_macs(length: int, ffts, overlap: float) -> int:
    """Total Hann-rDFT MACs for one signal across all MSS scales.

    Models ops/spectral._spectrogram_hopblocked: per scale n, hop =
    n*(1-overlap), frames = 1 + length/hop (center-padded n/2 each side),
    cos + sin matmuls of (n, n/2+1) per frame.
    """
    total = 0
    for n in ffts:
        hop = int(n * (1 - overlap))
        frames = 1 + length // hop
        total += frames * n * (n // 2 + 1) * 2
    return total


def mss_flops(b: int, length: int, ffts, overlap: float, backward=False):
    """Total STFT-matmul FLOPs of one MSS loss evaluation over a batch.

    Forward = pred + target spectrograms; backward adds ~the pred-side
    transposed matmuls (the target has no gradient).
    """
    per_signal = stft_macs(length, ffts, overlap)
    macs = (3 if backward else 2) * b * per_signal
    return 2 * macs


# --- full train-step bound (round-3 VERDICT #4) ------------------------------
HBM_BYTES_PER_S = 819e9  # v5e HBM bandwidth
GRU_STEP_LATENCY_S = 0.59e-6  # measured serial floor per recurrence step
# (3.06 ms / 5168 steps at B=1, unroll-insensitive; a fused Pallas
# recurrence kernel ties it -- docs/PERFORMANCE.md round-3).


def controller_macs(b: int, t: int, conf) -> int:
    """MXU MACs of one controller forward (models/controller.py):
    two input MLPs -> GRU (input projection + recurrence) -> post-MLP ->
    three heads.  LayerNorm/activation elementwise work is not counted."""
    u = conf.decoder_mlp_units
    layers = conf.decoder_mlp_layers
    g = conf.decoder_gru_units
    heads = conf.n_harmonics + 1 + conf.n_noise_filters

    def mlp(n_in):
        return n_in * u + (layers - 1) * u * u

    per_frame = (
        mlp(1)  # mlp_f0
        + mlp(1)  # mlp_loudness
        + 2 * u * 3 * g  # GRU input projection (in = 2u)
        + g * 3 * g  # GRU recurrence (per layer; n_layers=1 in production)
        + mlp(g + 2 * u)  # post-GRU MLP
        + u * heads  # dense heads
    )
    return b * t * per_frame


def decoder_param_count(conf) -> int:
    """Trainable parameter count of the decoder (controller + reverb)."""
    u = conf.decoder_mlp_units
    layers = conf.decoder_mlp_layers
    g = conf.decoder_gru_units
    heads = conf.n_harmonics + 1 + conf.n_noise_filters

    def mlp(n_in):
        first = n_in * u + u + 2 * u
        rest = (layers - 1) * (u * u + u + 2 * u)
        return first + rest

    gru = conf.decoder_gru_layers * (3 * g * 2 * u + 3 * g * g + 6 * g)
    dense = u * heads + heads
    return mlp(1) * 2 + gru + mlp(g + 2 * u) + dense + conf.ir_length + 2


def noise_fir_macs(b: int, t: int, conf, backward: bool = True) -> int:
    """MACs of the fused filtered-noise stage (ops/fir.convolve_designed_fir):
    per frame, the design-spectrum matmul pair (nf x nbins, twice), the
    noise frames' forward rDFT pair, and the truncated inverse pair.
    Backward adds the design-pair and inverse-pair transposes (the noise
    frames carry no gradient)."""
    from ddsp_tpu.ops.fft import next_fft_size

    nf = conf.n_noise_filters
    block = conf.hop_length
    n = next_fft_size(2 * block - 1)
    nbins = n // 2 + 1
    design = 2 * nf * nbins
    fwd_fft = 2 * block * nbins
    inv = 2 * nbins * block
    per_frame = design + fwd_fft + inv
    if backward:
        per_frame += design + inv
    return b * t * per_frame


def _fft_row_macs(m: int) -> int:
    """Real MACs of one complex m-point matmul FFT row (4*m*(n1+n2) for
    the Cooley-Tukey split, 4*m*m direct)."""
    from ddsp_tpu.ops.fft import DIRECT_MAX, _split_factors

    if m <= DIRECT_MAX:
        return 4 * m * m
    n1, n2 = _split_factors(m)
    return 4 * m * (n1 + n2)


def reverb_conv_macs(b: int, length: int, ir_len: int, backward: bool = True) -> int:
    """MACs of the offline reverb convolution as actually planned by
    ops/fft.rfft_convolve_same: overlap-save chunking + packed-pair complex
    Cooley-Tukey FFTs.  Backward ~2 more convolutions of the same class
    (the aggregate count; :func:`reverb_bound_s` splits the backward for
    mixed-precision accounting)."""
    from ddsp_tpu.ops.fft import _overlap_save_plan, next_fft_size

    k = _overlap_save_plan(length, ir_len)
    c = -(-length // k)
    row = _fft_row_macs(next_fft_size(c + ir_len - 1))
    rows_fwd = b * k // 2  # packed pairs
    rows_inv = b * k // 2
    kernel_row = 1
    one_conv = (rows_fwd + rows_inv + kernel_row) * row
    return one_conv * (3 if backward else 1)


def reverb_bound_s(conf, b: int, length: int) -> float:
    """Speed-of-light seconds for the reverb fwd+bwd at its shipped
    precisions: forward at the DFT layer's DEFAULT-f32 rate; the two
    backward correlations (hand-written VJP, ops/fir.fft_convolve) at
    ``conf.reverb_grad_matmul_dtype`` (bf16 = full MXU rate, the round-5
    default now that the permuted-spectrum CT removed the data movement
    that made bf16 a wash in round 4; 'float32' = exact autodiff at the
    DEFAULT-f32 rate).
    Each backward is the linear transpose of the forward with the other
    operand fixed, so d/dsignal and d/dkernel each cost ~one forward
    convolution class (the d/dkernel transpose recomputes the signal
    spectra but keeps the kernel branch a single FFT row)."""
    ir_len = conf.ir_length
    fwd = reverb_conv_macs(b, length, ir_len, backward=False)
    bwd_rate = (
        MXU_BF16
        if getattr(conf, "reverb_grad_matmul_dtype", None) == "bfloat16"
        else MXU_F32_DEFAULT
    )
    return 2 * fwd / MXU_F32_DEFAULT + 2 * (fwd + fwd) / bwd_rate


def train_step_bound_s(conf, b: int):
    """(bound_seconds, breakdown) -- composed speed-of-light lower bound for
    one full train step at batch ``b`` (decoder forward + MSS loss + full
    backward + Adam).

    Per stage the bound is that stage's own limiting resource (MXU passes
    at its precision, VPU fill, serial recurrence latency, HBM bytes);
    stages are *dependent* (controller -> synths -> loss -> backward ->
    update) so their bounds compose additively.  MXU rates: the controller
    and spectral matmuls run DEFAULT/tensorfloat32 precision (bf16x3); the
    MSS loss casts to bf16 (conf.loss_matmul_dtype); the oscillator kernel
    contracts f32-HIGHEST (its accounting lives in osc_speed_of_light_s).
    Backward matmul work is modeled as 2x forward (dgrad + wgrad).
    """
    t = conf.frames_per_example
    length = conf.example_length

    ctrl = 2 * 3 * controller_macs(b, t, conf) / MXU_F32_DEFAULT
    gru_latency = 2 * t * GRU_STEP_LATENCY_S  # fwd + bwd scans
    osc = osc_speed_of_light_s(
        b, t, conf.hop_length, conf.n_harmonics, backward=True
    )
    noise = 2 * noise_fir_macs(b, t, conf, backward=True) / MXU_F32_DEFAULT
    reverb = reverb_bound_s(conf, b, length)
    mss_rate = (
        MXU_BF16 if conf.loss_matmul_dtype == "bfloat16" else MXU_F32_DEFAULT
    )
    mss = mss_flops(b, length, conf.mss_ffts, conf.mss_overlap, backward=True) / mss_rate
    # Adam: read params/grads/m/v, write params/m/v -> 7 param-sized arrays.
    adam = 7 * 4 * decoder_param_count(conf) / HBM_BYTES_PER_S
    breakdown = {
        "controller_mxu": ctrl,
        "gru_serial_latency": gru_latency,
        "oscillator_fill_contract": osc,
        "noise_fir_mxu": noise,
        "reverb_fft_mxu": reverb,
        "mss_loss_mxu": mss,
        "adam_hbm": adam,
    }
    return sum(breakdown.values()), breakdown
