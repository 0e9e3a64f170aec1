"""Tracing / profiling utilities.

The reference's only performance artifact is a wall-clock deadline print in
the JACK callback (reference: rt/synth.py:49-55).  Here (SURVEY.md section
5): jax.profiler trace capture viewable in TensorBoard/Perfetto, named
scopes per synth stage, and a microbenchmark harness that reports
samples/s/chip -- used by bench.py and by kernel-level comparisons
(ops/pallas).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax

named_scope = jax.named_scope  # annotate synth stages for trace readability


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace into ``log_dir`` (TensorBoard 'profile' tab)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def microbench(
    fn: Callable[..., Any],
    args: Iterable[Any],
    iters: int = 10,
    warmup: int = 2,
    samples_per_call: Optional[int] = None,
) -> Dict[str, float]:
    """Time a jitted callable: {'seconds_per_call', 'calls_per_s',
    'samples_per_s' (if samples_per_call given)}.

    Blocks on results; the first `warmup` calls absorb compilation.
    """
    args = tuple(args)
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    result = {"seconds_per_call": dt, "calls_per_s": 1.0 / dt}
    if samples_per_call:
        result["samples_per_s"] = samples_per_call / dt
    return result


def marginal_chain_time(
    make_many: Callable[[int], Callable[..., Any]],
    args_for_trial: Callable[[int], tuple],
    trials: int = 5,
    target_s: float = 2.0,
    verbose: bool = False,
) -> float:
    """Tunnel-safe device time per iteration of a chained computation.

    ``make_many(iters)`` must return a jitted callable running ``iters``
    executions chained by a real output->input dependency (``lax.scan``);
    ``args_for_trial(i)`` supplies varied inputs per trial.  Returns the
    median marginal (T_HI - T_LO) / (HI - LO) between two chain lengths
    sized so the HI-LO work difference is ~``target_s`` of device time.

    Why this shape (CLAUDE.md): a synchronous host round trip through the
    serving tunnel costs 100-400 ms, so total/iters smears link latency
    into the kernel time, and an undersized chain drowns a sub-ms kernel
    in the round trip's jitter (observed: a 50-iteration chain reported
    the MSS loss forward at 5x the MXU's peak rate).
    """
    import numpy as np

    probe = make_many(40)
    jax.block_until_ready(probe(*args_for_trial(0)))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(probe(*args_for_trial(0)))
    rough = (time.perf_counter() - t0) / 40  # upper bound (incl. round trip)
    hi = int(min(6000, max(160, 3 * target_s / rough)))
    lo = hi // 4
    if verbose:
        print(
            f"[marginal {time.strftime('%H:%M:%S')}] rough={1e3*rough:.3f} ms"
            f" -> chain lo={lo} hi={hi}",
            flush=True,
        )

    runs = {n: make_many(n) for n in (lo, hi)}
    for n in (lo, hi):
        jax.block_until_ready(runs[n](*args_for_trial(0)))  # compile + warm
    times = []
    for trial in range(trials):
        args = args_for_trial(trial)
        ts = {}
        for n in (lo, hi):
            t0 = time.perf_counter()
            # Force the VALUE inside the timed region: the tunnel can
            # report spuriously-early completion for repeated runs of one
            # executable even through block_until_ready (round-5 diagnosis,
            # CLAUDE.md) -- fetching the scalar is the only reliable
            # barrier, and its fixed round-trip cost cancels in the
            # T_HI - T_LO marginal.
            r = float(np.asarray(runs[n](*args)).ravel()[0])
            ts[n] = time.perf_counter() - t0
            assert np.isfinite(r)
        times.append((ts[hi] - ts[lo]) / (hi - lo))
    return float(np.median(times[1:]))


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans toggle for numeric triage."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


@contextlib.contextmanager
def deoptimized():
    """Scoped jax_disable_most_optimizations: isolates XLA fusion from
    numerics when a kernel misbehaves."""
    name = "jax_disable_most_optimizations"
    old = getattr(jax.config, name)
    jax.config.update(name, True)
    try:
        yield
    finally:
        jax.config.update(name, old)
