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
  mode 'sp':     run 3 DP x SP train steps on a (data=2, time=2) global
                 mesh — the STFT-halo psums and phase-carry/reverb-halo
                 ppermutes cross the process boundary (what DCN would
                 carry on real multi-host TPU).  Writes losses + checksum.
  mode 'tp':     run 3 DP x TP train steps on a (data=2, model=2) mesh
                 whose device grid is interleaved so the 'model' axis
                 spans the two processes — the harmonic-bank psums
                 (amp renorm + audio sum) cross the process boundary.
  mode 'sp3':    run 3 DP x SP x TP train steps on a (data=2, time=2,
                 model=2) 8-device mesh (4 virtual devices per process)
                 whose grid is interleaved so BOTH the 'time' collectives
                 (STFT-halo psums, phase-carry/reverb ppermutes) AND the
                 'model' collectives (harmonic-bank psums) cross the
                 process boundary — the fully composed mesh algebra over
                 (fake) DCN.  Writes losses + checksum.
  mode 'render': time-sharded render on a (data=1, time=4) mesh — every
                 'time'-axis hop (phase carry, control halo, reverb
                 overlap-save halo) is a cross-process ppermute for the
                 middle boundary.  Each worker writes the SNR of its
                 addressable output shards vs a locally-computed
                 single-device oracle.
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
    # Sharded reverb backward is exact autodiff; pin the single-process
    # oracle to the same precision (f32 is also the shipped default;
    # pinned so the equality stays exact if that default ever changes).
    reverb_grad_matmul_dtype="float32",
)
GLOBAL_BATCH = 8
NUM_STEPS = 3


def make_batch(conf, t=None):
    """Deterministic global batch; every process builds the same one.

    ``t`` overrides the frame count (the SP mode needs T divisible by the
    'time' axis; audio length is then t*hop, not example_length)."""
    import numpy as np

    rng = np.random.default_rng(0)
    length = conf.example_length if t is None else t * conf.hop_length
    t = conf.frames_per_example if t is None else t
    return {
        "f0": rng.uniform(100, 400, (GLOBAL_BATCH, t, 1)).astype(np.float32),
        "normalized_cents": rng.uniform(0, 1, (GLOBAL_BATCH, t, 1)).astype(
            np.float32
        ),
        "loudness": rng.uniform(0, 1, (GLOBAL_BATCH, t, 1)).astype(np.float32),
        "audio": (
            0.1 * rng.standard_normal((GLOBAL_BATCH, length))
        ).astype(np.float32),
    }


def make_render_controls(conf, b=1, t=64):
    """Deterministic frame-rate synth controls; every process builds the
    same ones (mirrors tests/test_parallel._controls)."""
    import numpy as np

    rng = np.random.default_rng(11)
    return {
        "f0": rng.uniform(80, 500, (b, t, 1)).astype(np.float32),
        "c": rng.uniform(0.01, 1, (b, t, conf.n_harmonics)).astype(np.float32),
        "a": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "H": rng.uniform(0, 1, (b, t, conf.n_noise_filters)).astype(np.float32),
    }


def run_sp(conf, bail):
    """DP x SP training over a (data=2, time=2) cross-process mesh."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddsp_tpu.parallel.mesh import make_mesh, replicated
    from ddsp_tpu.parallel.sp import make_sp_train_step
    from ddsp_tpu.training.trainer import init_state

    mesh = make_mesh(n_data=2, n_time=2)
    batch = make_batch(conf, t=16)  # T divisible by 'time'; shard >= n_fft/2+1
    # Device grid rows ('data') align with processes (2 local devices each),
    # so each process contributes its row's batch entries; 'time' splits the
    # audio-sample / frame axis WITHIN + ACROSS the row as sharded.
    rows = GLOBAL_BATCH // jax.process_count()
    pid = jax.process_index()
    gbatch = {}
    for k, v in batch.items():
        spec = P("data", "time") if k == "audio" else P("data")
        sh = NamedSharding(mesh, spec)
        gbatch[k] = jax.make_array_from_process_local_data(
            sh, v[pid * rows : (pid + 1) * rows]
        )

    rep = replicated(mesh)
    state = init_state(jax.random.PRNGKey(0), conf)
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state,
    )
    step = make_sp_train_step(conf, mesh)

    losses = []
    for _ in range(NUM_STEPS):
        state, metrics = step(state, gbatch)
        losses.append(float(metrics["loss"]))
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
        }
    )


def run_sp3(conf, bail):
    """DP x SP x TP training over a cross-process (2, 2, 2) mesh.

    Grid: cell (di, ti, mi) lives on process (ti + mi) % 2, so flipping
    the 'time' coordinate (halo ppermutes, sharded-MSS psums) or the
    'model' coordinate (harmonic-bank psums) always crosses the process
    boundary, while the 'data' grad all-reduce stays intra-process (that
    crossing is covered by mode 'normal').
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddsp_tpu.parallel.mesh import make_mesh3
    from ddsp_tpu.parallel.sp import make_sp_train_step
    from ddsp_tpu.training.trainer import init_state

    by_proc = {}
    for d in jax.devices():
        by_proc.setdefault(d.process_index, []).append(d)
    assert len(jax.devices()) == 8 and len(by_proc) == 2, jax.devices()
    grid = []
    take = {0: 0, 1: 0}
    for di in range(2):
        for ti in range(2):
            for mi in range(2):
                p = (ti + mi) % 2
                grid.append(by_proc[p][take[p]])
                take[p] += 1
    mesh = make_mesh3(n_data=2, n_time=2, n_model=2, devices=grid)

    batch = make_batch(conf, t=16)  # local time shard 8 frames >= n_fft/2+1

    def to_global(value, spec):
        value = np.asarray(value)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            value.shape, sh, lambda idx: value[idx]
        )

    gbatch = {
        k: to_global(v, P("data", "time") if k == "audio" else P("data"))
        for k, v in batch.items()
    }
    state = init_state(jax.random.PRNGKey(0), conf)
    state = jax.tree.map(lambda x: to_global(x, P()), state)
    step = make_sp_train_step(conf, mesh)

    losses = []
    for _ in range(NUM_STEPS):
        state, metrics = step(state, gbatch)
        losses.append(float(metrics["loss"]))
    # Some updated leaves come back sharded over 'model' (sharding
    # propagation through the harmonic head); gather the global values.
    from jax.experimental import multihost_utils

    params_full = multihost_utils.process_allgather(state.params, tiled=True)
    checksum = float(
        sum(np.abs(x).sum() for x in jax.tree.leaves(params_full))
    )

    # Single-process oracle computed HERE (the worker has the full batch):
    # worst elementwise param delta under the test suite's allclose
    # criterion |a-b| / (atol + rtol|a|) with rtol=2e-3, atol=3e-3 (< 1
    # passes; an aggregate checksum would smear ~lr-sized Adam sign flips
    # on near-zero grads over 50k params).
    from ddsp_tpu.training.trainer import make_train_step

    oracle = init_state(jax.random.PRNGKey(0), conf)
    ostep = jax.jit(make_train_step(conf))
    oracle_losses = []
    for _ in range(NUM_STEPS):
        oracle, ometrics = ostep(
            oracle, {k: jax.numpy.asarray(v) for k, v in batch.items()}
        )
        oracle_losses.append(float(ometrics["loss"]))
    worst = 0.0
    for a, b in zip(
        jax.tree.leaves(oracle.params), jax.tree.leaves(params_full)
    ):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        worst = max(
            worst, float(np.max(np.abs(a - b) / (3e-3 + 2e-3 * np.abs(a))))
        )
    bail(
        {
            "losses": losses,
            "oracle_losses": oracle_losses,
            "worst_param_delta": worst,
            "checksum": checksum,
            "process_count": jax.process_count(),
            "global_devices": len(jax.devices()),
        }
    )


def run_tp(conf, bail):
    """DP x TP training with the 'model' (harmonic) axis spanning the two
    processes: devices are interleaved [d0, d2, d1, d3] so each data row's
    model pair is one device from each process, making every harmonic-bank
    psum a cross-process collective."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddsp_tpu.parallel.mesh import replicated
    from ddsp_tpu.parallel.tp import make_dp_tp_mesh, make_tp_train_step
    from ddsp_tpu.training.trainer import init_state

    devs = jax.devices()
    assert len(devs) == 4, devs
    mesh = make_dp_tp_mesh(
        n_data=2, n_model=2, devices=[devs[0], devs[2], devs[1], devs[3]]
    )
    batch = make_batch(conf, t=16)
    # Each process holds one replica of every batch row (its devices span
    # both 'data' shards), so the process-local portion is the full batch.
    gbatch = {
        k: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), v
        )
        for k, v in batch.items()
    }
    rep = replicated(mesh)
    state = init_state(jax.random.PRNGKey(0), conf)
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state,
    )
    step = make_tp_train_step(conf, mesh)

    losses = []
    for _ in range(NUM_STEPS):
        state, metrics = step(state, gbatch)
        losses.append(float(metrics["loss"]))
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
        }
    )


def run_render(conf, bail):
    """Time-sharded render over a (data=1, time=4) cross-process mesh:
    phase carry + control/reverb halos ppermute across the process
    boundary.  Compares local output shards against a locally-computed
    single-device oracle and reports the worst SNR."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddsp_tpu.models.synths import reverb_impulse
    from ddsp_tpu.ops.fir import fft_convolve, filtered_noise
    from ddsp_tpu.ops.oscillator import oscillator_bank
    from ddsp_tpu.parallel.mesh import make_mesh
    from ddsp_tpu.parallel.render import render_controls_sharded
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=1, n_time=4)
    t = 64
    controls = make_render_controls(conf, t=t)
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(4)
    reverb = {
        "noise": jnp.asarray(
            rng.uniform(-1, 1, (conf.ir_length,)).astype(np.float32)
        ),
        "decay": jnp.asarray(4.0),
        "wet": jnp.asarray(0.5),
    }

    # Single-device oracle on local data (replicated math, no collectives).
    harm, _ = oscillator_bank(
        controls["f0"], controls["c"], controls["a"],
        sample_rate=conf.sample_rate, hop=conf.hop_length,
    )
    noise = filtered_noise(jnp.asarray(controls["H"]), key, conf.hop_length)
    imp = reverb_impulse(reverb, conf)
    want = np.asarray(
        fft_convolve(harm + noise, imp[None, :], kernel_len=imp.shape[-1])
    )

    shard_t = t // 4
    gcontrols = {
        k: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(None, "time", None)),
            v[:, jax.process_index() * 2 * shard_t :][:, : 2 * shard_t],
        )
        for k, v in controls.items()
    }
    rep = NamedSharding(mesh, P())
    greverb, gkey = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        (reverb, key),
    )
    out = render_controls_sharded(greverb, gcontrols, conf, mesh, gkey)

    # SNR of every addressable output shard vs the oracle's same slice.
    worst = float("inf")
    for shard in out.addressable_shards:
        got = np.asarray(shard.data)
        ref = want[shard.index]
        err = ref - got
        snr = 10 * np.log10(
            (np.sum(ref**2) + 1e-20) / (np.sum(err**2) + 1e-20)
        )
        worst = min(worst, float(snr))
    bail(
        {
            "snr_db": worst,
            "n_local_shards": len(out.addressable_shards),
            "process_count": jax.process_count(),
            "global_devices": len(jax.devices()),
        }
    )


def main():
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path, mode = sys.argv[3], sys.argv[4], sys.argv[5]

    # 2 virtual CPU devices per process (4 for the 3-axis mesh); must be
    # set before jax imports xla.
    per_proc = 4 if mode == "sp3" else 2
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={per_proc}"
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
    signal.alarm(420 if mode == "sp3" else 240)

    initialize_distributed(
        f"127.0.0.1:{port}", nproc, proc_id, heartbeat_timeout_seconds=5
    )
    assert jax.process_count() == nproc, jax.process_count()
    conf = Config(**CONF_KWARGS)

    if mode == "sp":
        run_sp(conf, bail)
        return
    if mode == "sp3":
        run_sp3(conf, bail)
        return
    if mode == "tp":
        run_tp(conf, bail)
        return
    if mode == "render":
        run_render(conf, bail)
        return
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
