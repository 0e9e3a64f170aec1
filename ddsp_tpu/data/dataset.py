"""Dataset pipeline: ingest -> chunk -> offline feature extraction -> cache.

Parity target: reference dataset/audio_dataset.py:14-113 (``AudioData`` and
``PLHDataset``), redesigned:

* caches are ``.npz`` (no pickle), keyed by a content/config hash so stale
  caches are rebuilt instead of silently reused;
* the pad-to-hop-multiple off-by-N quirk (audio_dataset.py:45-47 pads by
  ``len % hop`` instead of the complement) is fixed;
* feature extraction is one jitted batched encoder map on the accelerator;
* iteration is a stateless shuffled batch iterator (pure function of a
  PRNG key) instead of worker processes -- host CPU only touches numpy.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.config import Config
from ddsp_tpu.data.audio_io import have_compressed_backend
from ddsp_tpu.models.autoencoder import feature_pad
from ddsp_tpu.models.encoder import encoder_apply
from ddsp_tpu.ops.resample import resample


def _cache_tag(conf: Config, files, extra: Optional[Dict] = None) -> str:
    """Hash of the ingest-relevant config + file list + mtimes."""
    payload = {
        "sample_rate": conf.sample_rate,
        "example_length": conf.example_length,
        "example_step": conf.example_step,
        "hop_length": conf.hop_length,  # affects pad-to-hop-multiple
        "files": [(f, os.path.getmtime(f)) for f in sorted(files)],
    }
    if extra:
        payload.update(extra)
    return hashlib.sha1(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


def _params_digest(params) -> str:
    """Content hash of a parameter pytree (so caches of features computed
    with different CREPE weights cannot be confused)."""
    h = hashlib.sha1()
    for leaf in jax.tree_util.tree_leaves(params):
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:16]


def list_audio_files(data_dir: str):
    """Glob wav (+ mp3/ogg/flac when a decoder backend is installed).

    Mirrors the reference's wav/mp3/ogg glob (audio_dataset.py:22-24);
    compressed files decode through soundfile/torchaudio/librosa/pygame
    (audio_io.read_audio), and without any such backend they produce a
    clear error instead.
    """
    files = []
    for ext in ("wav", "WAV"):
        files += glob.glob(os.path.join(data_dir, "**", f"*.{ext}"), recursive=True)
    compressed = []
    for ext in ("mp3", "ogg", "flac"):
        compressed += glob.glob(os.path.join(data_dir, "**", f"*.{ext}"), recursive=True)
    if compressed:
        if have_compressed_backend():
            files += compressed
        elif not files:
            raise ValueError(
                f"Only compressed audio found ({compressed[:3]}...) and no "
                "decoder backend (soundfile/torchaudio/librosa/pygame) is "
                "installed; convert to wav"
            )
    if not files:
        raise ValueError(f"No valid audio files found in {data_dir!r}")
    return sorted(files)


def load_examples(conf: Config, clear: bool = False) -> np.ndarray:
    """(N, example_length) float32 overlapping examples, cached to npz.

    Reference behavior (audio_dataset.py:14-71): load, mono-mix, resample to
    ``conf.sample_rate``, pad to a hop multiple, unfold 2 s windows stepped
    by 0.5 s.
    """
    files = list_audio_files(conf.data_dir)
    cache = os.path.join(conf.data_dir, f"audio_dataset_{_cache_tag(conf, files)}.npz")
    if os.path.exists(cache) and not clear:
        return np.load(cache)["examples"]

    from ddsp_tpu.native import load_corpus_mono

    chunks = []
    for y, sr in load_corpus_mono(files):
        if sr != conf.sample_rate:
            y = np.asarray(resample(jnp.asarray(y), sr, conf.sample_rate))
        pad = (-len(y)) % conf.hop_length
        y = np.pad(y, (pad // 2, pad - pad // 2))
        length, step = conf.example_length, conf.example_step
        if len(y) < length:
            y = np.pad(y, (0, length - len(y)))
        n = 1 + (len(y) - length) // step
        idx = np.arange(n)[:, None] * step + np.arange(length)[None, :]
        chunks.append(y[idx].astype(np.float32))
    examples = np.concatenate(chunks, axis=0)
    np.savez_compressed(cache, examples=examples)
    return examples


def extract_features(
    crepe_params: Dict,
    conf: Config,
    examples: Optional[np.ndarray] = None,
    clear: bool = False,
    include_probabilities: bool = True,
    batch_size: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Offline f0/loudness extraction over all examples, cached to npz.

    Reference behavior (audio_dataset.py:74-113): run the (frozen) encoder
    batch-by-batch with the contract padding, collect
    {f0, harmonicity, loudness, probabilities, normalized_cents, audio}.
    """
    files = list_audio_files(conf.data_dir) if examples is None else []
    tag = _cache_tag(
        conf,
        files,
        extra={
            # Everything the extracted features depend on beyond the audio:
            # the loudness/CREPE analysis geometry and the CREPE weights.
            "n_fft": conf.n_fft,
            "crepe_window": conf.crepe_window,
            "crepe_sample_rate": conf.crepe_sample_rate,
            "crepe_capacity": conf.crepe_capacity,
            "crepe_weights": _params_digest(crepe_params),
        },
    )
    cache = os.path.join(
        conf.data_dir, f"features_{conf.crepe_capacity}_{tag}.npz"
    )
    if examples is None and os.path.exists(cache) and not clear:
        return dict(np.load(cache))

    if examples is None:
        examples = load_examples(conf, clear)
    bs = batch_size or conf.batch_size

    @jax.jit
    def encode_batch(batch):
        return encoder_apply(crepe_params, feature_pad(batch, conf), conf)

    outs: Dict[str, list] = {}
    n = examples.shape[0]
    for start in range(0, n, bs):
        batch = examples[start : start + bs]
        pad_rows = 0
        if batch.shape[0] < bs:  # keep one compiled shape
            pad_rows = bs - batch.shape[0]
            batch = np.pad(batch, ((0, pad_rows), (0, 0)))
        feats = jax.device_get(encode_batch(jnp.asarray(batch)))
        if pad_rows:
            feats = {k: v[:-pad_rows] for k, v in feats.items()}
        for k, v in feats.items():
            outs.setdefault(k, []).append(np.asarray(v))
    result = {k: np.concatenate(v, axis=0) for k, v in outs.items()}
    if not include_probabilities:
        result.pop("probabilities", None)
    result["audio"] = examples
    if files:
        np.savez_compressed(cache, **result)
    return result


def batch_iterator(
    data: Dict[str, np.ndarray],
    batch_size: int,
    key: jax.Array,
    shuffle: bool = True,
    drop_last: bool = True,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Shuffled minibatch iterator over a dict-of-arrays dataset.

    Deterministic function of ``key`` (replaces the reference's worker-based
    DataLoader, train/train.py:48).
    """
    n = len(next(iter(data.values())))
    order = (
        np.asarray(jax.random.permutation(key, n)) if shuffle else np.arange(n)
    )
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        idx = order[start : start + batch_size]
        yield {k: jnp.asarray(v[idx]) for k, v in data.items()}
