"""bench.py orchestration mechanics (CPU-safe pieces only).

The measurement bodies run on the chip; what CI can pin down is the
watchdog/retry machinery the driver depends on for a clean rc=0 artifact
(round-2 VERDICT Weak #1): metric recording for the summary line, the
timeout -> abandoned-worker -> drain path, and the trivial-jit probe.
"""

import json
import threading
import time

import pytest

import bench


@pytest.fixture(autouse=True)
def clean_state():
    bench.RESULTS.clear()
    bench._ABANDONED.clear()
    yield
    bench.RESULTS.clear()
    bench._ABANDONED.clear()


def test_emit_records_and_prints(capsys):
    bench._emit("m1", 1.23456, "things/s", 2.0)
    line = capsys.readouterr().out.strip()
    assert json.loads(line) == {
        "metric": "m1",
        "value": 1.2346,
        "unit": "things/s",
        "vs_baseline": 2.0,
    }
    assert bench.RESULTS["m1"]["value"] == 1.2346


def test_run_with_timeout_success_and_error():
    bench._run_with_timeout("ok", lambda: None, timeout_s=5)
    with pytest.raises(ValueError, match="boom"):
        bench._run_with_timeout(
            "bad", lambda: (_ for _ in ()).throw(ValueError("boom")), 5
        )
    assert not bench._ABANDONED


def test_run_with_timeout_abandons_hung_worker():
    release = threading.Event()
    with pytest.raises(TimeoutError):
        bench._run_with_timeout("hung", lambda: release.wait(30), 0.2)
    assert [name for name, _ in bench._ABANDONED] == ["hung"]
    # drain: worker still running -> False, then it finishes -> True
    assert not bench._drain_abandoned(grace_s=0.1)
    release.set()
    deadline = time.monotonic() + 10
    while bench._ABANDONED and time.monotonic() < deadline:
        bench._drain_abandoned(grace_s=0.5)
    assert not bench._ABANDONED


def test_tunnel_probe_on_cpu():
    # conftest forces the CPU backend; the probe's trivial jit must pass.
    assert bench._tunnel_probe(timeout_s=120.0)


def test_encode_flops_accounting():
    """The roofline count matches a hand computation for CREPE-tiny."""
    from ddsp_tpu.config import Config
    from ddsp_tpu.utils.roofline import crepe_window_macs, encode_flops

    # hand-traced layer lengths for a 1024 window (docstring maths):
    # conv outs [256,128,64,32,16,8], pooled [128,64,32,16,8,4]
    want = (
        1 * 128 * 512 * 256
        + 128 * 16 * 64 * 128
        + 16 * 16 * 64 * 64
        + 16 * 16 * 64 * 32
        + 16 * 32 * 64 * 16
        + 32 * 64 * 64 * 8
        + 256 * 360
    )
    assert crepe_window_macs("tiny", 1024) == want
    conf = Config()
    total = encode_flops(16, conf.frames_per_example, conf)
    loud = conf.frames_per_example * conf.n_fft * (conf.n_fft // 2 + 1) * 2
    assert total == 2 * 16 * (172 * want + loud)


def test_claim_tables_match_latest_bench_artifact():
    """BASELINE.md's current-round table and README's headline numbers must
    quote the latest driver-recorded BENCH_rNN.json verbatim (rounds 2-4
    each drifted; round-4 VERDICT Next #3 made this a checked invariant)."""
    import os
    import subprocess
    import sys

    from scripts.check_claims import check

    problems = check()
    assert not problems, "\n".join(problems)
    # the CLI form the docs reference must agree
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "check_claims.py")],
        capture_output=True,
    ).returncode
    assert rc == 0
