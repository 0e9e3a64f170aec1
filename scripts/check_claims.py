"""Mechanical BENCH_rNN.json <-> BASELINE.md/README.md claim sync check.

Rounds 2-4 each drifted: a local re-run's number (or a stale previous
round's) survived in the claim tables after the driver artifact recorded
something else (round-4 VERDICT Weak #2 / Next #3).  This makes the sync
a checked invariant instead of a manual discipline:

* The LATEST ``BENCH_rNN.json`` in the repo root is the source of truth.
* ``BASELINE.md`` must contain a "Measured results (round N ...)" section
  for that round whose table quotes every artifact value verbatim (via
  the canonical formatter below).
* ``README.md``'s headline claims must quote the same artifact.

Run modes:
  python scripts/check_claims.py            # check; exit 1 on any drift
  python scripts/check_claims.py --table    # print the canonical table
                                            # rows to paste into BASELINE.md

tests/test_bench_harness.py runs the check, so the suite goes red the
moment a claim and the artifact disagree.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed") or {}
    values = parsed.get("values")
    if values is None:
        # fall back to the last JSON line of the recorded tail
        for line in reversed(doc.get("tail", "").splitlines()):
            line = line.strip()
            if line.startswith("{"):
                values = json.loads(line).get("values", {})
                break
    return values or {}


def all_benches(root: str = ROOT):
    """{round_number: values_dict} for every BENCH_rNN.json."""
    out = {}
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        n = int(re.search(r"BENCH_r(\d+)\.json$", path).group(1))
        out[n] = _load_bench(path)
    return out


def latest_bench(root: str = ROOT):
    """(round_number, values_dict) from the newest BENCH_rNN.json."""
    benches = all_benches(root)
    if not benches:
        return None, {}
    n = max(benches)
    return n, benches[n]


def fmt(key: str, value: float) -> str:
    """Canonical quoted form of an artifact value -- what the claim tables
    must contain, character for character."""
    if key.endswith("_ms"):
        return f"{value:g} ms"
    if key.endswith("samples_per_s") or key.endswith("per_s_per_chip"):
        return f"{value / 1e6:.1f} M"
    if key == "multistream_frontier_slots":
        return f"{int(value):,}"
    if key == "osc_kernel_speedup_vs_xla":
        return f"{value:.2f}×"
    # fractions (MFU, fraction-of-bound)
    return f"{value:.4f}"


# README headline claims: these keys' canonical strings must appear in
# README.md.  (The rest live only in BASELINE.md's table.)
README_KEYS = (
    "synth_forward_samples_per_s_per_chip",
    "train_step_ms",
    "stream_hop_ms",
    "long_render_samples_per_s",
    "multistream_2048_hop_ms",
    "multistream_frontier_slots",
)


def baseline_section(text: str, n: int) -> str | None:
    """The 'Measured results (round N ...)' section body, or None."""
    m = re.search(
        rf"^## Measured results \(round {n}\b.*?$(.*?)(?=^## |\Z)",
        text,
        re.M | re.S,
    )
    return m.group(1) if m else None


def check(root: str = ROOT) -> list[str]:
    """All drift findings (empty = in sync).

    The invariant enforced is the one that actually drifted in rounds
    2-4: every number QUOTED for a round must match that round's
    artifact.  A driver artifact newer than the newest documented round
    is not drift (it appears at the instant a round ends, before anyone
    can write its table) -- the check then validates the newest
    documented round against ITS artifact and notes the pending one.
    """
    benches = all_benches(root)
    if not benches:
        return []  # no artifact yet (fresh clone) -- nothing to check
    problems = []
    with open(os.path.join(root, "BASELINE.md")) as f:
        baseline = f.read()
    n = max(benches)
    section = baseline_section(baseline, n)
    while section is None and n > min(benches):
        n -= 1
        if n in benches:
            section = baseline_section(baseline, n)
    values = benches.get(n, {})
    if section is None:
        problems.append(
            "BASELINE.md has no 'Measured results (round N ...)' section "
            "for any recorded BENCH_rNN.json"
        )
    else:
        for key, value in values.items():
            row = re.search(rf"^\|\s*{re.escape(key)}\b([^\n]*)$", section, re.M)
            want = fmt(key, value)
            if row is None:
                problems.append(
                    f"BASELINE.md round-{n} table has no row for '{key}' "
                    f"(artifact: {want})"
                )
            elif want not in row.group(0):
                problems.append(
                    f"BASELINE.md round-{n} row for '{key}' does not quote "
                    f"the artifact value '{want}': {row.group(0).strip()}"
                )
    with open(os.path.join(root, "README.md")) as f:
        readme = f.read()
    for key in README_KEYS:
        if key not in values:
            continue
        want = fmt(key, values[key])
        if want not in readme:
            problems.append(
                f"README.md headline does not quote BENCH_r{n:02d}'s "
                f"'{key}' = '{want}'"
            )
    return problems


def main(argv):
    n, values = latest_bench()
    if "--table" in argv:
        print(f"<!-- canonical rows for BENCH_r{n:02d}.json -->")
        for key, value in values.items():
            print(f"| {key} | {fmt(key, value)} |")
        return 0
    problems = check()
    if problems:
        print("CLAIM DRIFT:")
        for p in problems:
            print(f"  - {p}")
        return 1
    benches = all_benches()
    documented = n
    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        baseline = f.read()
    while documented and baseline_section(baseline, documented) is None:
        documented -= 1
    print(f"claims in sync with BENCH_r{documented:02d}.json")
    if documented < n:
        print(
            f"note: BENCH_r{n:02d}.json is newer than the newest documented "
            f"round -- add its table to BASELINE.md (scripts/check_claims.py "
            f"--table) and refresh the README headline"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
