"""Minimal functional neural-net core: dense, layernorm, MLP, GRU.

Modules are plain pytrees of arrays plus pure apply functions -- the
idiomatic-JAX functional style (no framework state), which makes every model
trivially `jit`-able, `vmap`-able, and shardable with `jax.sharding`, and
makes PyTorch checkpoint import a direct key mapping.

Parameterization matches PyTorch exactly (weights stored (out, in); GRU uses
torch's r/z/n gate ordering with two bias vectors) so that reference
checkpoints (reference: rt/utils.py:7-24 loading into decoder.py modules)
convert losslessly.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# --- dense -------------------------------------------------------------------
def dense_init(key, n_in: int, n_out: int, dtype=jnp.float32) -> Params:
    """torch.nn.Linear default init: U(+-1/sqrt(fan_in)) for weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(n_in)
    return {
        "weight": _uniform(kw, (n_out, n_in), bound, dtype),
        "bias": _uniform(kb, (n_out,), bound, dtype),
    }


def dense_apply(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    w, b = p["weight"], p["bias"]
    if dtype is not None:
        x, w, b = x.astype(dtype), w.astype(dtype), b.astype(dtype)
    return x @ w.T + b


# --- layer norm --------------------------------------------------------------
def layer_norm_init(n: int, dtype=jnp.float32) -> Params:
    return {"weight": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}


def layer_norm_apply(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * p["weight"] + p["bias"]


# --- MLP block: N x [dense -> LayerNorm -> LeakyReLU] ------------------------
def mlp_init(key, n_in: int, n_units: int, n_layers: int, dtype=jnp.float32) -> Params:
    """Matches the reference MLP block (reference: decoder.py:9-38)."""
    layers = []
    keys = jax.random.split(key, n_layers)
    for i, k in enumerate(keys):
        fan_in = n_in if i == 0 else n_units
        layers.append(
            {
                "dense": dense_init(k, fan_in, n_units, dtype),
                "norm": layer_norm_init(n_units, dtype),
            }
        )
    return {"layers": layers}


def mlp_apply(p: Params, x: jnp.ndarray, negative_slope: float = 0.01, dtype=None) -> jnp.ndarray:
    for layer in p["layers"]:
        x = dense_apply(layer["dense"], x, dtype)
        x = layer_norm_apply(layer["norm"], x)
        x = jax.nn.leaky_relu(x, negative_slope)
    return x


# --- GRU ---------------------------------------------------------------------
def gru_init(key, n_in: int, n_hidden: int, n_layers: int = 1, dtype=jnp.float32) -> Params:
    """torch.nn.GRU parameterization: per layer w_ih (3H, in), w_hh (3H, H),
    b_ih, b_hh (3H,), gates ordered (reset, update, new); init U(+-1/sqrt(H))."""
    layers = []
    for layer in range(n_layers):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        fan_in = n_in if layer == 0 else n_hidden
        bound = 1.0 / math.sqrt(n_hidden)
        layers.append(
            {
                "w_ih": _uniform(k1, (3 * n_hidden, fan_in), bound, dtype),
                "w_hh": _uniform(k2, (3 * n_hidden, n_hidden), bound, dtype),
                "b_ih": _uniform(k3, (3 * n_hidden,), bound, dtype),
                "b_hh": _uniform(k4, (3 * n_hidden,), bound, dtype),
            }
        )
    return {"layers": layers}


def _gru_recurrence(p: Params, h: jnp.ndarray, gi: jnp.ndarray) -> jnp.ndarray:
    """Hidden update given precomputed input projections gi = x W_ih^T + b_ih."""
    nh = h.shape[-1]
    gh = h @ p["w_hh"].T + p["b_hh"]
    i_r, i_z, i_n = gi[..., :nh], gi[..., nh : 2 * nh], gi[..., 2 * nh :]
    h_r, h_z, h_n = gh[..., :nh], gh[..., nh : 2 * nh], gh[..., 2 * nh :]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_cell(p: Params, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """One torch-semantics GRU step.  h, x: (B, H), (B, in)."""
    return _gru_recurrence(p, h, x @ p["w_ih"].T + p["b_ih"])


def gru_apply(
    p: Params, x: jnp.ndarray, h0: jnp.ndarray = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a (stacked) GRU over time with `lax.scan`.

    Args:
      x: (B, T, in).  h0: (n_layers, B, H) or None for zeros.

    Returns:
      (outputs (B, T, H), final hidden (n_layers, B, H)).  Unlike the
      reference's streaming path (decoder.py:106-107, which returns the
      *stale* hidden), the advanced hidden state is always returned.
    """
    n_layers = len(p["layers"])
    b = x.shape[0]
    nh = p["layers"][0]["w_hh"].shape[-1]
    if h0 is None:
        h0 = jnp.zeros((n_layers, b, nh), x.dtype)

    finals = []
    seq = x
    for li, lp in enumerate(p["layers"]):
        # All timesteps' input projections in one MXU matmul; only the
        # hidden-to-hidden recurrence stays inside the sequential scan.
        gi = seq @ lp["w_ih"].T + lp["b_ih"]  # (B, T, 3H)

        def step(h, gi_t, lp=lp):
            hn = _gru_recurrence(lp, h, gi_t)
            return hn, hn

        hT, ys = jax.lax.scan(step, h0[li], jnp.moveaxis(gi, 0, 1), unroll=4)
        seq = jnp.moveaxis(ys, 0, 1)
        finals.append(hT)
    return seq, jnp.stack(finals)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
