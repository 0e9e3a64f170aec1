"""Data-parallel training: the single-chip train step sharded over a mesh.

Pure-pjit DP (SURVEY.md section 7 step 7): parameters and optimizer state
replicated, the batch sharded over every mesh device; XLA inserts the
gradient all-reduce over ICI automatically.  The step function is the same
pure function as training/trainer.py -- parallelism is only sharding
annotations, no separate code path to keep correct.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh

from ddsp_tpu.config import Config
from ddsp_tpu.parallel.mesh import batch_sharding, replicated
from ddsp_tpu.training.trainer import TrainState, make_train_step


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate params/optimizer over the mesh (DP layout)."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    bs = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, bs), batch)


def make_parallel_train_step(conf: Config, mesh: Mesh):
    """Jitted DP train step: (replicated state, batch-sharded batch) -> same.

    Computation-follows-sharding: place inputs with :func:`shard_state` /
    :func:`shard_batch` once, and jit propagates the layout -- XLA partitions
    the step over the mesh and all-reduces gradients over ICI.  The global
    batch size must be divisible by the mesh size.
    """
    del mesh  # layout travels with the arrays; kept for API clarity
    return jax.jit(make_train_step(conf), donate_argnums=0)
