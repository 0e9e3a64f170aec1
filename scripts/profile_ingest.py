"""Host-side corpus-ingest throughput: native C++ decoder vs Python.

Generates a synthetic WAV corpus in a temp dir, then times
ddsp_tpu.native.load_corpus_mono in native (threaded) and pure-Python
modes.  Host-only (no TPU).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_ingest.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ddsp_tpu.data.audio_io import write_wav
from ddsp_tpu.native import load_corpus_mono, native_available

N_FILES = 48
SECONDS = 5
RATE = 44100


def main():
    print("native toolchain available:", native_available())
    rng = np.random.default_rng(0)
    d = tempfile.mkdtemp(prefix="ddsp_ingest_")
    paths = []
    for i in range(N_FILES):
        audio = (0.5 * rng.standard_normal((2, RATE * SECONDS))).astype(np.float32)
        p = os.path.join(d, f"f{i}.wav")
        write_wav(p, audio, RATE)
        paths.append(p)

    modes = [("python", dict(force_python=True))]
    if native_available():
        modes += [
            ("native x1", dict(n_threads=1)),
            (f"native x{os.cpu_count()}", dict(n_threads=os.cpu_count())),
        ]
    for name, kw in modes:
        load_corpus_mono(paths[:2], **kw)  # warm caches
        t0 = time.perf_counter()
        out = load_corpus_mono(paths, **kw)
        dt = time.perf_counter() - t0
        total = sum(len(a) for a, _ in out)
        print(f"{name:12s} {dt * 1e3:7.1f} ms  {total / dt / 1e6:7.1f} M samples/s")


if __name__ == "__main__":
    main()
