"""CREPE pitch CNN in JAX, with PyTorch checkpoint conversion.

Parity target: the reference CREPE port (reference: crepe/crepe.py:10-131):
six [pad -> conv(stride 4 then 1) -> ReLU -> BatchNorm(eps=1e-3) -> maxpool
(2,1)] stages over 1024-sample windows, then a sigmoid classifier over 360
pitch bins.  The reference treats audio as a (H, W=1) image; here the conv
stack is expressed natively as 1-D convolutions over time, which XLA lowers
onto the TPU MXU as batched matmuls.

Supports both 'tiny' (shipped, 487k params) and 'full' capacities; weights
convert from the reference ``.pth`` state dicts (convN.weight (O, I, k, 1) ->
(O, I, k), BatchNorm running stats carried as inference constants).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

PITCH_BINS = 360
CENTS_PER_BIN = 20
WINDOW_SIZE = 1024
BN_EPS = 0.0010000000474974513  # MMdnn-converted epsilon (crepe/crepe.py:33-35)

CAPACITIES = {
    "full": {
        "in_channels": [1, 1024, 128, 128, 128, 256],
        "out_channels": [1024, 128, 128, 128, 256, 512],
        "in_features": 2048,
    },
    "tiny": {
        "in_channels": [1, 128, 16, 16, 16, 32],
        "out_channels": [128, 16, 16, 16, 32, 64],
        "in_features": 256,
    },
}
KERNEL_SIZES = [512] + 5 * [64]
STRIDES = [4] + 5 * [1]
PADS = [(254, 254)] + 5 * [(31, 32)]


def crepe_init(key: jax.Array, capacity: str = "tiny") -> Dict:
    """Random init (only used for tests / from-scratch training)."""
    spec = CAPACITIES[capacity]
    layers: List[Dict] = []
    for i in range(6):
        key, kw, kb = jax.random.split(key, 3)
        c_in, c_out, k = spec["in_channels"][i], spec["out_channels"][i], KERNEL_SIZES[i]
        bound = 1.0 / np.sqrt(c_in * k)
        layers.append(
            {
                "weight": jax.random.uniform(kw, (c_out, c_in, k), jnp.float32, -bound, bound),
                "bias": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
                "bn": {
                    "weight": jnp.ones((c_out,)),
                    "bias": jnp.zeros((c_out,)),
                    "mean": jnp.zeros((c_out,)),
                    "var": jnp.ones((c_out,)),
                },
            }
        )
    key, kw, kb = jax.random.split(key, 3)
    nf = spec["in_features"]
    bound = 1.0 / np.sqrt(nf)
    classifier = {
        "weight": jax.random.uniform(kw, (PITCH_BINS, nf), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (PITCH_BINS,), jnp.float32, -bound, bound),
    }
    return {"layers": layers, "classifier": classifier}


def load_torch_checkpoint(path: str) -> Dict:
    """Convert a reference CREPE ``.pth`` state dict to a JAX param pytree.

    Handles the key layout of crepe/pretrained/tiny.pth:
    ``convN.{weight,bias}``, ``convN_BN.{weight,bias,running_mean,
    running_var}``, ``classifier.{weight,bias}``.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    to_np = lambda k: sd[k].numpy().astype(np.float32)
    layers = []
    for i in range(1, 7):
        layers.append(
            {
                "weight": jnp.asarray(to_np(f"conv{i}.weight")[..., 0]),  # (O,I,k,1)->(O,I,k)
                "bias": jnp.asarray(to_np(f"conv{i}.bias")),
                "bn": {
                    "weight": jnp.asarray(to_np(f"conv{i}_BN.weight")),
                    "bias": jnp.asarray(to_np(f"conv{i}_BN.bias")),
                    "mean": jnp.asarray(to_np(f"conv{i}_BN.running_mean")),
                    "var": jnp.asarray(to_np(f"conv{i}_BN.running_var")),
                },
            }
        )
    classifier = {
        "weight": jnp.asarray(to_np("classifier.weight")),
        "bias": jnp.asarray(to_np("classifier.bias")),
    }
    return {"layers": layers, "classifier": classifier}


def _layer(x: jnp.ndarray, p: Dict, stride: int, pad, compute_dtype=None) -> jnp.ndarray:
    """pad -> conv1d -> relu -> inference BN -> maxpool(2, stride 2).

    ``compute_dtype=jnp.bfloat16`` casts the conv operands (accumulation
    stays f32 via ``preferred_element_type``) for full-rate MXU passes;
    BN/ReLU/pool remain f32.
    """
    x = jnp.pad(x, ((0, 0), (0, 0), pad))
    w = p["weight"]
    if compute_dtype is not None:
        x, w = x.astype(compute_dtype), w.astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    x = x + p["bias"][None, :, None]
    x = jax.nn.relu(x)
    bn = p["bn"]
    scale = bn["weight"] * jax.lax.rsqrt(bn["var"] + BN_EPS)
    x = (x - bn["mean"][None, :, None]) * scale[None, :, None] + bn["bias"][None, :, None]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2), (1, 1, 2), "VALID"
    )


def _layer_nlc(
    x: jnp.ndarray, p: Dict, stride: int, pad, compute_dtype=None
) -> jnp.ndarray:
    """Channels-LAST variant of :func:`_layer`: (B, L, C) activations.

    Feature-minor is the TPU's native layout -- the conv contracts
    (k * C_in) onto the MXU without the layout transposes the NCH form
    induces, bias/BN broadcast along the lane axis, and the maxpool is a
    free reshape + max instead of a strided ``reduce_window``.  Bit-for-bit
    the same math as :func:`_layer` (same conv, eps, pool); measured ~2x
    encode throughput on the v5e (docs/PERFORMANCE.md round-4).
    """
    x = jnp.pad(x, ((0, 0), pad, (0, 0)))
    w = jnp.transpose(p["weight"], (2, 1, 0))  # (O,I,k) -> (k,I,O) HIO
    if compute_dtype is not None:
        x, w = x.astype(compute_dtype), w.astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    x = x + p["bias"]
    x = jax.nn.relu(x)
    bn = p["bn"]
    scale = bn["weight"] * jax.lax.rsqrt(bn["var"] + BN_EPS)
    x = (x - bn["mean"]) * scale + bn["bias"]
    b, length, c = x.shape
    return jnp.max(x.reshape(b, length // 2, 2, c), axis=2)


def _first_layer_nlc_s2d(
    frames: jnp.ndarray, p: Dict, compute_dtype=None
) -> jnp.ndarray:
    """Stage-1 conv via space-to-depth: (B, 1024) windows -> (B, 128, C1).

    The C_in=1, 512-tap, stride-4 first conv gives the MXU almost nothing
    to contract from in its natural form (round-3 VERDICT #5).  Folding the
    stride into channels -- x[4m+r] -> S2D[m, r], kernel (512,) -> (128
    taps, 4 channels) -- is numerically identical (out[i] = sum_{m,r}
    S2D[i+m, r] w[4m+r]) and presents a k*C_in = 512-deep contraction at
    stride 1, which XLA tiles far better.  BN/ReLU/pool as in _layer_nlc.
    """
    b = frames.shape[0]
    pl, pr = PADS[0]
    x = jnp.pad(frames, ((0, 0), (pl, pr)))  # (B, 1532)
    x = x.reshape(b, -1, 4)  # (B, 383, 4): S2D[m, r] = x[4m + r]
    w = p["weight"][..., 0, :]  # (O, k=512)
    w = jnp.transpose(w.reshape(-1, 128, 4), (1, 2, 0))  # (128, 4, O) HIO
    if compute_dtype is not None:
        x, w = x.astype(compute_dtype), w.astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )  # (B, 256, O)
    x = jax.nn.relu(x + p["bias"])
    bn = p["bn"]
    scale = bn["weight"] * jax.lax.rsqrt(bn["var"] + BN_EPS)
    x = (x - bn["mean"]) * scale + bn["bias"]
    b, length, c = x.shape
    return jnp.max(x.reshape(b, length // 2, 2, c), axis=2)


def crepe_embed(
    params: Dict, frames: jnp.ndarray, compute_dtype=None, layout: str = "nlc"
) -> jnp.ndarray:
    """First five conv stages: (B, 1024) audio windows -> (B, C5, 8) features.

    Matches reference ``Crepe.embed`` (crepe/crepe.py:108-120).  ``layout``:
    'nlc' runs the stack channels-last with the space-to-depth first conv
    (TPU-native, same math); 'nch' keeps the torch-shaped path.
    """
    if layout == "nlc":
        x = _first_layer_nlc_s2d(frames, params["layers"][0], compute_dtype)
        for i in range(1, 5):
            x = _layer_nlc(x, params["layers"][i], STRIDES[i], PADS[i], compute_dtype)
        return jnp.moveaxis(x, 1, 2)  # (B, C5, 8) -- keep the public contract
    x = frames[:, None, :]  # (B, 1, 1024)
    for i in range(5):
        x = _layer(x, params["layers"][i], STRIDES[i], PADS[i], compute_dtype)
    return x


def crepe_forward(
    params: Dict,
    frames: jnp.ndarray,
    embed: bool = False,
    compute_dtype=None,
    layout: str = "nlc",
) -> jnp.ndarray:
    """(B, 1024) windows -> (B, 360) sigmoid pitch-bin probabilities.

    Matches reference ``Crepe.forward`` (crepe/crepe.py:90-104), including the
    h-major flatten order of the final (B, C, H) feature map.
    ``compute_dtype``: see :func:`_layer` (config field
    ``crepe_compute_dtype``).  ``layout``: 'nlc' (TPU-native channels-last,
    default) or 'nch' (torch-shaped); same math either way, h-major flatten
    is the NLC form's natural reshape.
    """
    if layout == "nlc":
        x = _first_layer_nlc_s2d(frames, params["layers"][0], compute_dtype)
        for i in range(1, 6 if not embed else 5):
            x = _layer_nlc(x, params["layers"][i], STRIDES[i], PADS[i], compute_dtype)
        if embed:
            return jnp.moveaxis(x, 1, 2)
        b, h, c = x.shape
        x = x.reshape(b, h * c)  # h-major == torch permute(0,2,1).flatten
    else:
        x = crepe_embed(params, frames, compute_dtype, layout="nch")
        if embed:
            return x
        x = _layer(x, params["layers"][5], STRIDES[5], PADS[5], compute_dtype)
        b, c, h = x.shape
        x = jnp.moveaxis(x, 1, 2).reshape(b, h * c)  # h-major like torch
    cw = params["classifier"]["weight"]
    if compute_dtype is not None:
        x, cw = x.astype(compute_dtype), cw.astype(compute_dtype)
    logits = (
        jnp.dot(x, cw.T, preferred_element_type=jnp.float32)
        + params["classifier"]["bias"]
    )
    return jax.nn.sigmoid(logits)


def crepe_activation(params: Dict, frames: jnp.ndarray, layer_index: int) -> jnp.ndarray:
    """Intermediate activation after conv stage ``layer_index`` (0-based, <6).

    Used by the DeepDream experiment (reference: trajectory.py:18-41 uses a
    forward hook; here the functional stack just returns the activation).
    """
    x = frames[:, None, :]
    for i in range(layer_index + 1):
        x = _layer(x, params["layers"][i], STRIDES[i], PADS[i])
    return x


# --- pitch decoding ----------------------------------------------------------
def cents_map(bins) -> jnp.ndarray:
    """Pitch-bin index -> cents (reference encoder.py:39-41)."""
    return bins * CENTS_PER_BIN + 1997.3794084376191


def freq_map(cents) -> jnp.ndarray:
    """Cents -> Hz (reference encoder.py:46-48)."""
    return 10 * 2 ** (cents / 1200)


def pitch_argmax(probabilities: jnp.ndarray):
    """Argmax pitch decode (reference encoder.py:120-128).

    Args:
      probabilities: (..., 360).

    Returns:
      (freq, harmonicity, normalized_cents), each (..., 1).
    """
    bins = jnp.argmax(probabilities, axis=-1, keepdims=True)
    cents = cents_map(bins.astype(probabilities.dtype))
    freq = freq_map(cents)
    harmonicity = jnp.take_along_axis(probabilities, bins, axis=-1)
    normalized_cents = bins.astype(probabilities.dtype) / 359.0
    return freq, harmonicity, normalized_cents


def pitch_weighted(probabilities: jnp.ndarray):
    """Local weighted-average decode around the argmax bin.

    Parity with the reference's (unused but present) ``pitch_weighted`` /
    ``pitch_centered`` (encoder.py:91-118): average cents of bins within
    +-4 of the argmax, weighted by probability (zero-padded at the edges).

    Implements the evident *intent*, not the reference bug: the reference
    writes ``selection[:, :, idx]`` with idx in -4..4, so negative indices
    permute the cents vector relative to ``masked_select``'s ascending
    values (encoder.py:96-110) and each probability is paired with the
    wrong offset's cents.  Here offsets and values are aligned.
    """
    center = jnp.argmax(probabilities, axis=-1, keepdims=True)  # (..., 1)
    offsets = jnp.arange(-4, 5)
    padded = jnp.pad(
        probabilities, [(0, 0)] * (probabilities.ndim - 1) + [(4, 4)]
    )
    idx = center + offsets + 4  # (..., 9) via broadcast
    values = jnp.take_along_axis(padded, idx, axis=-1)
    cents = cents_map((center + offsets).astype(probabilities.dtype))
    cents = jnp.sum(values * cents, -1, keepdims=True) / jnp.sum(
        values, -1, keepdims=True
    )
    freq = freq_map(cents)
    harmonicity = jnp.take_along_axis(probabilities, center, axis=-1)
    min_c, max_c = cents_map(0.0), cents_map(359.0)
    normalized_cents = (cents - min_c) / (max_c - min_c)
    return freq, harmonicity, normalized_cents


def pitch_centered_ref(probabilities: jnp.ndarray, center=None):
    """BUG-COMPATIBLE replica of the reference's ``pitch_centered``
    (encoder.py:94-117), for exact A/B against reference checkpoints.

    The reference builds ``selection`` with ``selection[:, :, idx]`` for
    idx in -4..4, so Python's negative column indexing stores the offsets
    in the order [0,1,2,3,4,-4,-3,-2,-1] while ``masked_select`` yields the
    probabilities in ascending-bin order [-4..4]; each probability is
    therefore paired with the WRONG offset's cents.  ``pitch_weighted``
    implements the evident intent; this function reproduces the reference
    bit-for-bit (tested against the torch reference in tests/test_crepe.py).
    """
    if center is None:
        center = jnp.argmax(probabilities, axis=-1, keepdims=True)
    value_offsets = jnp.arange(-4, 5)  # masked_select: ascending bins
    cents_offsets = jnp.asarray([0, 1, 2, 3, 4, -4, -3, -2, -1])  # selection
    padded = jnp.pad(
        probabilities, [(0, 0)] * (probabilities.ndim - 1) + [(4, 4)]
    )
    idx = center + value_offsets + 4
    values = jnp.take_along_axis(padded, idx, axis=-1)
    cents_cols = cents_map((center + cents_offsets).astype(probabilities.dtype))
    cents = jnp.sum(values * cents_cols, -1, keepdims=True) / jnp.sum(
        values, -1, keepdims=True
    )
    freq = freq_map(cents)
    harmonicity = jnp.take_along_axis(probabilities, center, axis=-1)
    min_c, max_c = cents_map(0.0), cents_map(359.0)
    normalized_cents = (cents - min_c) / (max_c - min_c)
    return freq, harmonicity, normalized_cents
