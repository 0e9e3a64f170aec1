"""Training entrypoint: ``python -m ddsp_tpu.training.train --data_dir=...``.

Parity target: reference train/train.py:46-55 (dataset -> loader -> trainer),
with CLI-configurable everything instead of hardcoded paths.
"""

from __future__ import annotations

import sys

import jax

from ddsp_tpu.config import Config
from ddsp_tpu.data.dataset import extract_features
from ddsp_tpu.models.crepe import crepe_init, load_torch_checkpoint
from ddsp_tpu.training.trainer import (
    fit,
    init_state,
    latest_checkpoint,
    restore_checkpoint,
)


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    extra = {
        "num_steps": 10000,
        "crepe_checkpoint": "",
        "resume": 1,
        # optimizer steps per host->device call (device-resident scan
        # trainer); 0/1 = classic one-call-per-step loop
        "device_steps": 50,
        # fraction of examples held out for validation; their mean MSS loss
        # is logged as eval_loss (reference: limit_val_batches=0.01)
        "eval_split": 0.0,
        # analysis-by-synthesis steps AFTER the feature-based training:
        # decoder AND CREPE optimized through the encoder (needs
        # --pitch_decode=weighted); the reference only comments on this
        # (encoder.py:32-34)
        "finetune_crepe": 0,
    }
    if any(a in ("-h", "--help") for a in argv):
        import dataclasses

        print(__doc__.strip())
        print("\nTrainer flags (defaults):")
        for k, v in extra.items():
            print(f"  --{k}={v!r}")
        print("\nConfig flags (any Config field, defaults):")
        for f in dataclasses.fields(Config):
            print(f"  --{f.name}={f.default!r}")
        return
    flags = []
    for a in argv:
        key = a[2:].split("=", 1)[0]
        if key in extra:
            extra[key] = type(extra[key])(a.split("=", 1)[1])
        else:
            flags.append(a)
    conf = Config.from_flags(flags)

    if extra["finetune_crepe"]:
        # Validate the finetune precondition BEFORE the (hours-long) main
        # run: make_finetune_step would otherwise raise only at the end.
        from ddsp_tpu.training.trainer import make_finetune_step

        make_finetune_step(conf)

    if extra["crepe_checkpoint"]:
        crepe = load_torch_checkpoint(extra["crepe_checkpoint"])
    else:
        crepe = crepe_init(jax.random.PRNGKey(1), conf.crepe_capacity)
        print("WARNING: no --crepe_checkpoint given; using random CREPE weights")

    print(f"Extracting features from {conf.data_dir} ...")
    features = extract_features(crepe, conf)
    n = len(features["audio"])
    print(f"{n} examples x {conf.example_length} samples")

    eval_features = None
    if extra["eval_split"] > 0:
        import numpy as np

        perm = np.random.default_rng(conf.seed).permutation(n)
        n_eval = max(1, int(round(n * extra["eval_split"])))
        eval_features = {k: v[perm[:n_eval]] for k, v in features.items()}
        features = {k: v[perm[n_eval:]] for k, v in features.items()}
        print(f"held out {n_eval} examples for eval")

    state = None
    ckpt = latest_checkpoint(conf.checkpoint_dir) if extra["resume"] else None
    if ckpt:
        template = init_state(jax.random.PRNGKey(conf.seed), conf)
        state = restore_checkpoint(ckpt, template)
        print(f"Resumed from {ckpt} at step {int(state.step)}")

    state, metrics = fit(
        conf,
        features,
        num_steps=extra["num_steps"],
        state=state,
        log_path=f"{conf.checkpoint_dir}/metrics.jsonl",
        dump_audio_dir=f"{conf.checkpoint_dir}/audio",
        device_steps=extra["device_steps"],
        eval_features=eval_features,
    )
    print("final:", metrics)

    if extra["finetune_crepe"]:
        from ddsp_tpu.training.trainer import (
            finetune,
            save_checkpoint,
            wait_for_checkpoints,
        )

        print(f"finetuning CREPE for {extra['finetune_crepe']} steps ...")
        ft_state, ft_metrics = finetune(
            conf,
            features["audio"],
            extra["finetune_crepe"],
            state.params,
            crepe,
            log_path=f"{conf.checkpoint_dir}/finetune_metrics.jsonl",
        )
        save_checkpoint(
            f"{conf.checkpoint_dir}/finetune", ft_state, conf
        )
        # Surface any background-commit failure before declaring success.
        wait_for_checkpoints()
        print("finetune final:", ft_metrics)


if __name__ == "__main__":
    main()
