"""A/B: bf16-cast backward oscillator contractions vs the f32-bank default.

Round-4 VERDICT #6 asked for this A/B.  Measured outcome (2026-08-21,
interleaved): casting the three backward dots' operands to bf16 changes
the amp-gradient by EXACTLY 0.0 and f0-grad by 6e-4, and reads ~3%
SLOWER (3.75 vs 3.65 ms osc fwd+bwd) -- because Mosaic's DEFAULT
precision already executes f32 dot_generals as a SINGLE bf16 MXU pass
(not bf16x3), so there were never extra passes to remove and the casts
only add conversion work.  utils/roofline.osc_speed_of_light_s now
models the backward contractions at the full bf16 rate accordingly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_osc_bwd_contract.py
"""
import os, sys
sys.path.insert(0, '/root/repo/scripts'); sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from profile_stages import marginal_time
from ddsp_tpu.config import Config
from ddsp_tpu.models.controller import controller_apply, decoder_init
from ddsp_tpu.models.synths import oscillator_apply
import ddsp_tpu.ops.pallas.oscillator as posc

conf = Config()
b, t = 16, conf.frames_per_example
rng = np.random.default_rng(0)
batch = {
    "f0": jnp.asarray(rng.uniform(100, 600, (b, t, 1)).astype(np.float32)),
    "normalized_cents": jnp.asarray(rng.uniform(0, 1, (b, t, 1)).astype(np.float32)),
    "loudness": jnp.asarray(rng.uniform(0, 1, (b, t, 1)).astype(np.float32)),
}
params = decoder_init(jax.random.PRNGKey(0), conf)
controls, _ = jax.jit(lambda p, bt: controller_apply(p, bt))(params["controller"], batch)
controls = jax.block_until_ready(controls)

def f(cs):
    out, _ = oscillator_apply(cs, conf)
    return jnp.sum(out * out)

# gradient accuracy check first
posc.set_osc_bwd_contract_dtype(None)
g32 = jax.grad(f)(controls)
posc.set_osc_bwd_contract_dtype("bfloat16")
gbf = jax.grad(f)(controls)
for k in g32:
    a, b2 = np.asarray(g32[k]).ravel(), np.asarray(gbf[k]).ravel()
    cos = float(np.dot(a, b2) / (np.linalg.norm(a)*np.linalg.norm(b2) + 1e-30))
    rel = np.abs(a-b2).max() / (np.abs(a).max() + 1e-30)
    print(f"grad[{k}] cos {cos:.6f} rel {rel:.2e}", flush=True)

x0 = {"cs": controls}
for dt in (None, "bfloat16", None, "bfloat16"):
    posc.set_osc_bwd_contract_dtype(dt)
    def fb(x):
        l, g = jax.value_and_grad(f)(x["cs"])
        return l + sum(jnp.sum(v) for v in jax.tree.leaves(g))
    print(f"contract={str(dt):9s} fwd+bwd {marginal_time(fb, x0)*1e3:7.3f} ms", flush=True)
