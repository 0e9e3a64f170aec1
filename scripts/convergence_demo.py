"""Training-convergence demo with held-out evaluation (real chip).

Trains the decoder on extracted features of a directory of wavs, holding
out a slice of examples, and reports train/held-out MSS loss before and
after -- the quantitative version of the reference's listen-to-the-wavs
validation (reference: train/train.py:39-43).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/convergence_demo.py \
      --data_dir=/tmp/ddsp_demo/data --steps=3000
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ddsp_tpu.config import Config
    from ddsp_tpu.data.dataset import extract_features
    from ddsp_tpu.models.crepe import load_torch_checkpoint
    from ddsp_tpu.training.trainer import fit, init_state, loss_fn

    argv = sys.argv[1:]
    if any("=" not in a for a in argv):
        raise SystemExit(
            "usage: convergence_demo.py --data_dir=DIR [--steps=N] "
            "[--ckpt_dir=DIR] [--crepe=PATH]  (flags take --key=value form)"
        )
    args = dict(a.lstrip("-").split("=", 1) for a in argv)
    steps = int(args.get("steps", 3000))
    conf = Config(
        data_dir=args.get("data_dir", "/tmp/ddsp_demo/data"),
        checkpoint_dir=args.get("ckpt_dir", "/tmp/ddsp_demo/ckpt_conv"),
        checkpoint_every=0,
    )
    crepe = load_torch_checkpoint(
        args.get("crepe", "/root/reference/crepe/pretrained/tiny.pth")
    )
    feats = extract_features(crepe, conf)
    n = len(feats["audio"])
    rng = np.random.default_rng(0)
    order = rng.permutation(n)
    # round the held-out slice to whole eval batches so every held-out
    # example contributes to the metric
    n_val = max(conf.batch_size, n // 8 // conf.batch_size * conf.batch_size)
    val_idx, train_idx = order[:n_val], order[n_val:]
    train = {k: v[train_idx] for k, v in feats.items()}
    val = {k: v[val_idx] for k, v in feats.items()}
    print(f"{len(train_idx)} train / {len(val_idx)} held-out examples")

    @jax.jit
    def eval_loss(params, batch):
        loss, _ = loss_fn(params, batch, conf, jax.random.PRNGKey(0))
        return loss

    def evaluate(params):
        tot, cnt = 0.0, 0
        bs = conf.batch_size
        for s in range(0, len(val_idx) - bs + 1, bs):
            batch = {k: jnp.asarray(v[s : s + bs]) for k, v in val.items()}
            tot += float(eval_loss(params, batch))
            cnt += 1
        return tot / max(cnt, 1)

    state = init_state(jax.random.PRNGKey(conf.seed), conf)
    v0 = evaluate(state.params)
    print(f"held-out MSS loss before training: {v0:.2f}")

    t0 = time.time()
    state, metrics = fit(
        conf,
        train,
        num_steps=steps,
        state=state,
        device_steps=50,
        log_path=os.path.join(conf.checkpoint_dir, "metrics.jsonl"),
        dump_audio_dir=os.path.join(conf.checkpoint_dir, "audio"),
        dump_every=1000000,  # dump only at the end
    )
    wall = time.time() - t0
    v1 = evaluate(state.params)
    print(
        f"after {steps} steps ({wall:.0f}s wall, {steps/wall:.1f} steps/s): "
        f"train loss {metrics['loss_mean']:.2f}, held-out {v1:.2f} "
        f"(was {v0:.2f}, {v0/v1:.1f}x lower)"
    )


if __name__ == "__main__":
    main()
