"""Standalone worker for the real multi-process (fake multi-host) tests.

tests/test_multihost.py launches TWO copies of this script as separate OS
processes.  They rendezvous through jax.distributed's coordination service
(gRPC over localhost), form a global 4-device mesh (2 virtual CPU devices
per process), and run DP train steps whose gradient all-reduce crosses the
process boundary — the same code path a real multi-host TPU job takes over
DCN.  The reference has no distributed story at all (SURVEY.md §2 last
rows); this is the TPU-native framework's multi-host bring-up, tested
without a cluster.

Usage: python multihost_worker.py <proc_id> <nproc> <port> <out.json> <mode>
  mode 'normal': run 3 DP steps, write losses + a param checksum.
  mode 'crash':  process 1 dies (os._exit) before step 3; process 0 must
                 *detect* the dead peer (heartbeat/collective failure) and
                 error out rather than hang — fail-stop semantics.
"""

import json
import os
import signal
import sys


# Tiny config mirrored by the test (kept here so the worker is standalone).
CONF_KWARGS = dict(
    sample_rate=4000,
    n_fft=256,
    hop_length=64,
    n_harmonics=16,
    n_noise_filters=17,
    decoder_mlp_units=32,
    decoder_mlp_layers=1,
    decoder_gru_units=32,
    reverb_length=512,
    mss_ffts=(256, 128),
    batch_size=8,
)
GLOBAL_BATCH = 8
NUM_STEPS = 3


def make_batch(conf):
    """Deterministic global batch; every process builds the same one."""
    import numpy as np

    rng = np.random.default_rng(0)
    t = conf.frames_per_example
    return {
        "f0": rng.uniform(100, 400, (GLOBAL_BATCH, t, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (GLOBAL_BATCH, t, 1)).astype(
            np.float32
        ),
        "loudness": rng.uniform(0, 1, (GLOBAL_BATCH, t, 1)).astype(np.float32),
        "audio": (
            0.1 * rng.standard_normal((GLOBAL_BATCH, conf.example_length))
        ).astype(np.float32),
    }


def main():
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path, mode = sys.argv[3], sys.argv[4], sys.argv[5]

    # 2 virtual CPU devices per process; must be set before jax imports xla.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ddsp_tpu.config import Config
    from ddsp_tpu.parallel.mesh import (
        batch_sharding,
        initialize_distributed,
        make_mesh,
        replicated,
    )
    from ddsp_tpu.parallel.train import make_parallel_train_step
    from ddsp_tpu.training.trainer import init_state

    def bail(result):
        with open(out_path, "w") as f:
            json.dump(result, f)

    # Watchdog: a hang (e.g. undetected dead peer) must fail the test, not
    # stall it until the harness timeout.
    def on_alarm(signum, frame):
        bail({"error": "watchdog timeout (hang: dead peer not detected)"})
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(240)

    initialize_distributed(
        f"127.0.0.1:{port}", nproc, proc_id, heartbeat_timeout_seconds=5
    )
    assert jax.process_count() == nproc, jax.process_count()
    conf = Config(**CONF_KWARGS)
    mesh = make_mesh(n_data=len(jax.devices()))

    # Global batch: every process materializes the full batch, hands its
    # local rows to make_array_from_process_local_data.
    batch = make_batch(conf)
    bspec = batch_sharding(mesh)
    rows = GLOBAL_BATCH // nproc
    local = {
        k: v[proc_id * rows : (proc_id + 1) * rows] for k, v in batch.items()
    }
    gbatch = {
        k: jax.make_array_from_process_local_data(bspec, v)
        for k, v in local.items()
    }

    rep = replicated(mesh)
    state = init_state(jax.random.PRNGKey(0), conf)
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state,
    )
    step = make_parallel_train_step(conf, mesh)

    losses = []
    try:
        for i in range(NUM_STEPS):
            if mode == "crash" and proc_id == 1 and i == NUM_STEPS - 1:
                os._exit(17)  # simulated host death: no cleanup, no goodbye
            state, metrics = step(state, gbatch)
            losses.append(float(metrics["loss"]))
    except Exception as e:  # noqa: BLE001 - the *point* is detecting failure
        bail({"losses": losses, "detected_failure": repr(e)[:500]})
        os._exit(4)

    checksum = float(
        sum(
            np.abs(np.asarray(x.addressable_data(0))).sum()
            for x in jax.tree.leaves(state.params)
        )
    )
    bail(
        {
            "losses": losses,
            "checksum": checksum,
            "process_count": jax.process_count(),
            "global_devices": len(jax.devices()),
            "local_devices": len(jax.local_devices()),
        }
    )


if __name__ == "__main__":
    main()
