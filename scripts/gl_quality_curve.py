"""Griffin-Lim inversion quality vs iteration count (round-3 VERDICT #7).

The reference inverts style-transfer spectrograms with
``torchaudio.functional.griffinlim(n_iter=5000, momentum=0.99)``
(reference style_transfer.py:149-154); StyleTransferConfig defaults
``gl_iters=64``.  This measures what that 78x iteration cut costs on the
matmul-FFT Griffin-Lim: for each n_iter, the **spectral convergence**
SC = || |STFT(x_rec)| - M ||_F / || M ||_F
(waveform SNR is meaningless for phase retrieval -- phase is not unique)
plus the dB magnitude-error, on a harmonic-rich fixture.

One jitted scan per iteration budget, tunnel-safe; all budgets measured in
one run.  Results recorded in docs/PERFORMANCE.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/gl_quality_curve.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fixture_audio(sr: int, seconds: float = 3.0) -> np.ndarray:
    """Harmonic-rich deterministic test signal: three gliding sawtooth-ish
    voices + noise floor (the style-transfer regime: broadband music-like
    spectra, not a single tone)."""
    t = np.arange(int(sr * seconds)) / sr
    x = np.zeros_like(t)
    rng = np.random.default_rng(0)
    for f0, vib in ((110.0, 3.0), (164.8, 2.0), (220.0, 5.0)):
        phase = np.cumsum(f0 * (1 + 0.01 * np.sin(2 * np.pi * vib * t)) / sr)
        for h in range(1, 12):
            x += np.sin(2 * np.pi * h * phase) / h
    x += 0.01 * rng.standard_normal(t.size)
    return (0.2 * x / np.max(np.abs(x))).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from ddsp_tpu.ops.griffin_lim import griffin_lim, stft_pair

    sr, n_fft, hop = 44100, 2048, 512
    audio = fixture_audio(sr)
    re, im = jax.jit(lambda a: stft_pair(a, n_fft, hop))(jnp.asarray(audio))
    mag = jnp.sqrt(re**2 + im**2)

    @jax.jit
    def sc_of(x):
        r2, i2 = stft_pair(x, n_fft, hop)
        m2 = jnp.sqrt(r2**2 + i2**2)
        return jnp.linalg.norm(m2 - mag) / jnp.linalg.norm(mag)

    results = {}
    for n_iter in (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 5000):
        t0 = time.time()
        rec = jax.jit(
            lambda m, n_iter=n_iter: griffin_lim(
                m, n_fft, hop, n_iter=n_iter, momentum=0.99, length=audio.size
            )
        )(mag)
        sc = float(sc_of(rec))
        results[n_iter] = sc
        print(
            json.dumps(
                {
                    "n_iter": n_iter,
                    "spectral_convergence": round(sc, 5),
                    "mag_err_db": round(20 * np.log10(sc), 2),
                    "wall_s": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )

    print(
        json.dumps(
            {
                "metric": "gl_quality_curve",
                "sc_by_iter": {str(k): round(v, 5) for k, v in results.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
