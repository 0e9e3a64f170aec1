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
