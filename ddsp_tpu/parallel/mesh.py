"""Device mesh construction and sharding helpers.

The reference is single-GPU with no distributed backend (SURVEY.md section
2, last rows).  Here parallelism is a first-class layer: a ('data', 'time')
mesh where 'data' shards the batch (DP) and 'time' shards the audio sample
axis of long renders (the ring/halo dimension).  XLA lowers the collectives
onto ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TIME_AXIS = "time"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_time: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, TIME_AXIS),
) -> Mesh:
    """Build a 2-axis mesh over the available devices.

    Defaults to ('data', 'time'); the DPxTP path reuses this with
    ('data', 'model') (parallel/tp.make_dp_tp_mesh).
    """
    devices = list(devices if devices is not None else jax.devices())
    second = axis_names[1]
    if n_data is None:
        if len(devices) % n_time:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_{second}={n_time}"
            )
        n_data = len(devices) // n_time
    needed = n_data * n_time
    if needed > len(devices):
        raise ValueError(f"mesh {n_data}x{n_time} needs {needed} devices, have {len(devices)}")
    grid = np.asarray(devices[:needed]).reshape(n_data, n_time)
    return Mesh(grid, tuple(axis_names))


def make_mesh3(
    n_data: int = 1,
    n_time: int = 1,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, TIME_AXIS, MODEL_AXIS),
) -> Mesh:
    """('data', 'time', 'model') mesh: batch x sample-axis x harmonic-bank
    sharding composed on one device grid (the full mesh algebra -- DP, SP,
    and TP collectives each ride their own axis)."""
    devices = list(devices if devices is not None else jax.devices())
    needed = n_data * n_time * n_model
    if needed > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_time}x{n_model} needs {needed} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:needed]).reshape(n_data, n_time, n_model)
    return Mesh(grid, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over every mesh device (DP)."""
    return NamedSharding(mesh, P((DATA_AXIS, TIME_AXIS)))


def time_sharding(mesh: Mesh, axis: int = 1) -> NamedSharding:
    """Shard a time/frame axis over the 'time' mesh axis."""
    spec = [None] * (axis + 1)
    spec[axis] = TIME_AXIS
    return NamedSharding(mesh, P(*spec))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           **kwargs) -> None:
    """Multi-host bring-up: heartbeat/failure detection via jax.distributed.

    On TPU pods JAX discovers the topology from the environment; arguments
    are only needed for manual (e.g. CPU fake multi-host) launches.  A host
    that dies takes the job fail-stop — the coordination service's heartbeat
    (tunable via ``heartbeat_timeout_seconds``) detects the dead peer and
    poisons the run; restart resumes from the latest Orbax checkpoint
    (training/trainer.py), the standard SPMD recovery model.  Exercised for
    real (2 OS processes over localhost) in tests/test_multihost.py.
    """
    # NB: must not touch jax.process_count() here -- that would instantiate
    # the backend before the distributed client, pinning a 1-process view.
    if jax.distributed.is_initialized():
        return  # already initialized by the launcher
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id,
                                   **kwargs)
    elif num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            "127.0.0.1:12321", num_processes, process_id or 0, **kwargs
        )


def is_host0() -> bool:
    return jax.process_index() == 0
