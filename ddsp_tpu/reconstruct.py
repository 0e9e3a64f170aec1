"""Offline reconstruction: ``python -m ddsp_tpu.reconstruct in.wav out.wav``.

Analysis-by-synthesis of an audio file through a trained checkpoint: CREPE
f0 + A-weighted loudness analysis, then the decoder resynthesizes. This is
the offline counterpart of the reference's ``validation_step`` wav dumps
(reference train/train.py:39-43) and the batch analogue of its real-time
loop (reference rt/synth.py) — the reference ships no standalone
reconstruction entry point; users had to script ``AutoEncoder`` by hand.

Flags: any ``Config`` field plus

  --checkpoint_dir=DIR      Orbax checkpoint dir (also reads its config.json)
  --lightning_ckpt=F.ckpt   reference Lightning checkpoint instead of Orbax
  --crepe_checkpoint=F.pth  CREPE weights (reference crepe/pretrained/*.pth)
  --export_torch=F.ckpt     also write the decoder as a reference-layout
                            Lightning .ckpt (models/torch_export.py)

The whole file renders in one jitted call (time-sharded rendering for
longer-than-memory audio lives in parallel/render.py).
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ddsp_tpu.config import Config


def load_decoder_params(conf: Config, lightning_ckpt: str = ""):
    """Decoder params from a Lightning .ckpt or the newest Orbax checkpoint."""
    if lightning_ckpt:
        from ddsp_tpu.models.torch_import import load_lightning_decoder

        return load_lightning_decoder(lightning_ckpt, conf)
    import jax

    from ddsp_tpu.training.trainer import (
        init_state,
        latest_checkpoint,
        restore_checkpoint,
    )

    ckpt = latest_checkpoint(conf.checkpoint_dir)
    if ckpt is None:
        raise FileNotFoundError(
            f"no finalized checkpoint under {conf.checkpoint_dir!r} "
            "(pass --checkpoint_dir or --lightning_ckpt)"
        )
    template = init_state(jax.random.PRNGKey(conf.seed), conf)
    return restore_checkpoint(ckpt, template).params


def prepare_audio(path: str, conf: Config) -> np.ndarray:
    """Read any supported file -> (1, L) float32 mono at conf.sample_rate,
    center-padded to a hop multiple (the dataset's chunking convention,
    data/dataset.py load_examples)."""
    import jax.numpy as jnp

    from ddsp_tpu.data.audio_io import read_audio
    from ddsp_tpu.ops.resample import resample

    wav, sr = read_audio(path)
    y = wav.mean(axis=0) if wav.ndim == 2 else wav
    if sr != conf.sample_rate:
        y = np.asarray(resample(jnp.asarray(y), sr, conf.sample_rate))
    if len(y) < conf.n_fft:
        y = np.pad(y, (0, conf.n_fft - len(y)))
    pad = (-len(y)) % conf.hop_length
    y = np.pad(y, (pad // 2, pad - pad // 2))
    return y[None, :].astype(np.float32)


def reconstruct_file(
    in_path: str,
    out_path: str,
    conf: Config,
    crepe_checkpoint: str = "",
    lightning_ckpt: str = "",
    decoder_params=None,
) -> dict:
    """Reconstruct one file; returns {'seconds', 'wall_s', 'rms_in', 'rms_out'}.

    ``decoder_params``: pre-loaded decoder pytree; None loads from
    ``conf.checkpoint_dir`` / ``lightning_ckpt`` (callers that also export
    should load once and pass it in).
    """
    import jax

    from ddsp_tpu.data.audio_io import write_wav
    from ddsp_tpu.models.autoencoder import autoencoder_apply
    from ddsp_tpu.models.crepe import crepe_init, load_torch_checkpoint

    decoder = (
        decoder_params
        if decoder_params is not None
        else load_decoder_params(conf, lightning_ckpt)
    )
    if crepe_checkpoint:
        crepe = load_torch_checkpoint(crepe_checkpoint)
    else:
        crepe = crepe_init(jax.random.PRNGKey(1), conf.crepe_capacity)
        print("WARNING: no --crepe_checkpoint given; using random CREPE weights")
    params = {"decoder": decoder, "crepe": crepe}

    audio = prepare_audio(in_path, conf)
    fn = jax.jit(lambda p, a, k: autoencoder_apply(p, a, conf, k))
    t0 = time.time()
    out = np.asarray(
        jax.block_until_ready(fn(params, audio, jax.random.PRNGKey(conf.seed)))
    )[0]
    wall = time.time() - t0
    if not np.isfinite(out).all():
        raise ValueError("non-finite samples in reconstruction")
    write_wav(out_path, out, conf.sample_rate)
    return {
        "seconds": out.shape[-1] / conf.sample_rate,
        "wall_s": wall,
        "rms_in": float(np.sqrt(np.mean(audio**2))),
        "rms_out": float(np.sqrt(np.mean(out**2))),
    }


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if any(a in ("-h", "--help") for a in argv) or len(argv) < 2:
        print(__doc__.strip())
        return
    in_path, out_path, rest = argv[0], argv[1], argv[2:]
    extra = {"crepe_checkpoint": "", "lightning_ckpt": "", "export_torch": ""}
    flags = []
    for a in rest:
        key, sep, value = a[2:].partition("=")
        if key in extra:
            if not sep:
                raise SystemExit(
                    f"expected --{key}=value, got {a!r} (the flag takes a path)"
                )
            extra[key] = value
        else:
            flags.append(a)
    # Base config: the checkpoint's own config.json when present, so a bare
    # --checkpoint_dir reproduces training-time settings exactly.
    import json
    import os

    base = Config()
    for a in flags:
        if a.startswith("--checkpoint_dir="):
            cj = os.path.join(a.split("=", 1)[1], "config.json")
            if os.path.exists(cj):
                with open(cj) as f:
                    base = Config.from_json(f.read())
    conf = Config.from_flags(flags, base=base)

    decoder = load_decoder_params(conf, extra["lightning_ckpt"])
    stats = reconstruct_file(
        in_path,
        out_path,
        conf,
        crepe_checkpoint=extra["crepe_checkpoint"],
        decoder_params=decoder,
    )
    print(json.dumps(stats))
    if extra["export_torch"]:
        from ddsp_tpu.models.torch_export import save_torch_decoder

        save_torch_decoder(decoder, conf, extra["export_torch"])
        print(f"decoder exported to {extra['export_torch']}")


if __name__ == "__main__":
    main()
