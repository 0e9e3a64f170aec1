"""Decoupled real-time synthesis: audio thread <-> model worker thread.

The reference runs GPU inference inside the JACK process callback and
prints 'missed a frame' when it overruns (reference: rt/synth.py:40-56).
Here the audio callback only moves samples through lock-free native ring
buffers (ddsp_tpu/native); a worker thread drains the input ring hop by
hop, runs the accelerator, and fills the output ring.  The callback's cost
is O(block) memcpy -- it can never miss a deadline because of the model;
model overruns surface as measurable underruns instead of audio-thread
stalls.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

import numpy as np

from ddsp_tpu.config import Config
from ddsp_tpu.native import RingBuffer
from ddsp_tpu.runtime.streaming import BlockSynthesizer


class ThreadedSynthesizer:
    """Real-time facade: `push`/`pull` from the audio thread, model inference
    on a background worker.

    Args:
      latency_hops: output buffering target; larger absorbs model jitter at
        the cost of latency (total latency ~ (latency_hops + 1) * hop).
    """

    def __init__(
        self,
        params: Dict,
        crepe_params: Dict,
        conf: Config,
        latency_hops: int = 2,
        ring_hops: int = 64,
        force_python_ring: bool = False,
    ):
        self.conf = conf
        self.hop = conf.hop_length
        self._synth = BlockSynthesizer(params, crepe_params, conf)
        cap = self.hop * ring_hops
        self._in = RingBuffer(cap, force_python=force_python_ring)
        self._out = RingBuffer(cap, force_python=force_python_ring)
        self.underruns = 0
        self.latency_hops = latency_hops
        self._stop = threading.Event()
        self._work = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        # pre-fill output with silence to absorb worker jitter
        self._out.write(np.zeros(latency_hops * self.hop, np.float32))
        self._thread.start()

    # --- audio-thread side (lock-free, constant cost) -----------------------
    def push(self, mic_block: np.ndarray) -> None:
        """Feed captured samples (any length); never blocks."""
        self._in.write(np.asarray(mic_block, np.float32).reshape(-1))
        self._work.set()

    def pull(self, n: int) -> np.ndarray:
        """Fetch n output samples; zero-fills (and counts) underruns."""
        got = self._out.read(n)
        if len(got) < n:
            self.underruns += 1
            got = np.concatenate([got, np.zeros(n - len(got), np.float32)])
        return got

    def process(self, mic_block: np.ndarray) -> np.ndarray:
        """push + pull convenience for callback-style hosts."""
        self.push(mic_block)
        return self.pull(len(mic_block))

    # --- worker side ---------------------------------------------------------
    def _worker(self) -> None:
        hop = self.hop
        while not self._stop.is_set():
            if self._in.readable() < hop:
                self._work.wait(timeout=0.1)
                self._work.clear()
                continue
            block = self._in.read(hop)
            out = self._synth.process(block)
            self._out.write(out)

    def close(self) -> None:
        self._stop.set()
        self._work.set()
        self._thread.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
