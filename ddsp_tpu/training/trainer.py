"""Training loop: optax Adam + plateau schedule, Orbax checkpoints, metrics.

Parity target: the reference Lightning module and entrypoint
(reference: train/train.py:15-55): decoder-only training against the
multi-scale STFT loss, Adam(1e-3) with ReduceLROnPlateau(patience=5)
monitoring the train loss, periodic reconstruction dumps for listening.

TPU-native design: one jitted, donate-argnums train step (pure function of
(state, batch, rng)); data parallelism is just sharding the batch axis over
the mesh (parallel/); checkpoints are versioned Orbax directories holding
params + optimizer + step (no filename parsing, cf. rt/utils.py:7-24);
metrics stream to JSONL with per-scale loss terms and grad norms.
"""

from __future__ import annotations

import functools
import json
import os
import re
import time
from typing import Any, Dict, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddsp_tpu.config import Config
from ddsp_tpu.losses import (
    mss_loss_per_scale,
    mss_loss_per_scale_cached,
    target_mag_key,
    target_spectrograms,
)
from ddsp_tpu.models.controller import decoder_apply, decoder_init


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def make_optimizer(conf: Config) -> optax.GradientTransformationExtraArgs:
    """Adam + loss-plateau LR decay.

    Parity note (reference train/train.py:21-30): torch ReduceLROnPlateau
    decays when ``patience`` consecutive *monitor calls* fail to improve
    the raw loss; optax's reduce_on_plateau first averages the loss over
    ``accumulation_size`` steps and counts patience in those windows.  The
    window size is ``conf.lr_plateau_accumulation`` (1 = per-step
    monitoring, the reference's cadence; default 50 ~ an epoch average).
    """
    return optax.chain(
        optax.adam(conf.learning_rate),
        optax.contrib.reduce_on_plateau(
            factor=conf.lr_plateau_factor,
            patience=conf.lr_plateau_patience,
            accumulation_size=max(1, conf.lr_plateau_accumulation),
        ),
    )


def init_state(key: jax.Array, conf: Config) -> TrainState:
    kp, kr = jax.random.split(key)
    params = decoder_init(kp, conf)
    opt_state = make_optimizer(conf).init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state, kr)


def loss_fn(
    params: Any,
    batch: Dict[str, jnp.ndarray],
    conf: Config,
    noise_key: jax.Array,
    decode=decoder_apply,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """MSS reconstruction loss of the decoded controls vs the target audio.

    ``decode`` swaps the decode implementation (e.g. the tensor-parallel
    decoder, parallel/tp.py) while keeping the loss composition single-sourced.
    If the batch carries precomputed target spectrograms
    (losses.target_spectrograms keys, as the scan trainer provides), the
    target-side STFTs are skipped.
    """
    pred = decode(params, batch, conf, noise_key)
    loss_dtype = (
        None
        if conf.loss_matmul_dtype == "float32"
        else jnp.dtype(conf.loss_matmul_dtype)
    )
    if target_mag_key(conf.mss_ffts[0]) in batch:
        scales = mss_loss_per_scale_cached(
            pred,
            batch,
            conf.mss_ffts,
            conf.mss_alpha,
            conf.mss_overlap,
            matmul_dtype=loss_dtype,
        )
    else:
        scales = mss_loss_per_scale(
            pred,
            batch["audio"],
            conf.mss_ffts,
            conf.mss_alpha,
            conf.mss_overlap,
            matmul_dtype=loss_dtype,
        )
    loss = sum(scales.values())
    return loss, scales


def make_train_step(conf: Config, loss=None):
    """Jittable (state, batch) -> (state, metrics) pure training step.

    ``loss`` defaults to the single-device :func:`loss_fn`; parallel layers
    pass their own (e.g. the tensor-parallel decode, parallel/tp.py) and
    reuse this optimizer/metrics plumbing unchanged.
    """
    tx = make_optimizer(conf)
    loss = loss_fn if loss is None else loss

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, noise_key = jax.random.split(state.rng)
        (loss_val, scales), grads = jax.value_and_grad(loss, has_aux=True)(
            state.params, batch, conf, noise_key
        )
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params, value=loss_val
        )
        params = optax.apply_updates(state.params, updates)
        metrics = dict(scales)
        metrics["loss"] = loss_val
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, params, opt_state, rng)
        return new_state, metrics

    return train_step


def loss_fn_e2e(
    params: Any,
    batch: Dict[str, jnp.ndarray],
    conf: Config,
    noise_key: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Analysis-by-synthesis loss: audio -> encoder (CREPE differentiable)
    -> decoder -> MSS vs the same audio.

    ``params`` is the autoencoder pytree {'decoder', 'crepe'} (the offline
    :func:`loss_fn` trains the decoder alone on precomputed features, the
    reference's regime, train/train.py:32-37).
    """
    from ddsp_tpu.models.autoencoder import autoencoder_apply

    pred = autoencoder_apply(
        params, batch["audio"], conf, noise_key, freeze_crepe=False
    )
    loss_dtype = (
        None
        if conf.loss_matmul_dtype == "float32"
        else jnp.dtype(conf.loss_matmul_dtype)
    )
    scales = mss_loss_per_scale(
        pred,
        batch["audio"],
        conf.mss_ffts,
        conf.mss_alpha,
        conf.mss_overlap,
        matmul_dtype=loss_dtype,
    )
    return sum(scales.values()), scales


def init_finetune_state(
    key: jax.Array, conf: Config, crepe_checkpoint: Optional[str] = None
) -> TrainState:
    """TrainState over the full autoencoder pytree {'decoder', 'crepe'}."""
    from ddsp_tpu.models.autoencoder import autoencoder_init

    kp, kr = jax.random.split(key)
    params = autoencoder_init(kp, conf, crepe_checkpoint)
    opt_state = make_optimizer(conf).init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state, kr)


def make_finetune_step(conf: Config):
    """Analysis-by-synthesis train step: CREPE finetunes with the decoder.

    The reference freezes CREPE and leaves finetuning as a comment
    (reference model/autoencoder/encoder.py:32-34); here it is a working
    path.  Requires a differentiable pitch decode: 'argmax' emits hard bins
    (zero gradient into CREPE), so ``conf.pitch_decode`` must be 'weighted'
    or 'centered_ref'.
    """
    if conf.pitch_decode == "argmax":
        raise ValueError(
            "analysis-by-synthesis finetuning needs a differentiable pitch "
            "decode: set pitch_decode='weighted' (or 'centered_ref'); "
            "'argmax' passes zero gradient into CREPE"
        )
    return make_train_step(conf, loss=loss_fn_e2e)


def finetune(
    conf: Config,
    audio: np.ndarray,
    num_steps: int,
    decoder_params: Any,
    crepe_params: Any,
    log_path: Optional[str] = None,
    seed: Optional[int] = None,
) -> Tuple[TrainState, Dict[str, float]]:
    """Analysis-by-synthesis finetune loop over raw (N, L) audio examples.

    Starts from trained decoder params + CREPE weights and optimizes BOTH
    through the encoder (make_finetune_step).  Returns the final state
    (``state.params['crepe']`` holds the finetuned CREPE).
    """
    from ddsp_tpu.data.dataset import batch_iterator

    step_fn = jax.jit(make_finetune_step(conf), donate_argnums=0)
    params = {"decoder": decoder_params, "crepe": crepe_params}
    key = jax.random.PRNGKey(conf.seed if seed is None else seed)
    key, kr = jax.random.split(key)
    state = TrainState(
        jnp.zeros((), jnp.int32), params, make_optimizer(conf).init(params), kr
    )
    logger = MetricsLogger(log_path)
    last: Dict[str, float] = {}
    steps_done = 0
    t0 = time.time()
    while steps_done < num_steps:
        key, ke = jax.random.split(key)
        for batch in batch_iterator({"audio": audio}, conf.batch_size, ke):
            state, metrics = step_fn(state, batch)
            steps_done += 1
            if steps_done % conf.log_every == 0 or steps_done == num_steps:
                last = {k: float(v) for k, v in metrics.items()}
                last["steps_per_s"] = steps_done / (time.time() - t0)
                logger.log(int(state.step), last)
            if steps_done >= num_steps:
                break
    logger.close()
    return state, last


def make_train_scan(conf: Config, steps_per_call: int):
    """Device-resident training: ``steps_per_call`` optimizer steps inside one
    jitted ``lax.scan``, with each minibatch gathered on-device from the full
    feature arrays (batch = a fresh PRNG permutation's first ``batch_size``
    rows). This is the TPU-native replacement for the reference's
    host-side DataLoader loop (reference: train/train.py:48): the host
    dispatches one call per ``steps_per_call`` steps, so wall-clock
    throughput tracks device time even over a high-latency link.

    Returns ``many(state, data, key) -> (state, stacked_metrics)`` where
    ``data`` is a dict of device-resident (N, ...) arrays and
    ``stacked_metrics`` has a leading ``steps_per_call`` axis.
    """
    step = make_train_step(conf)

    def many(state: TrainState, data: Dict[str, jnp.ndarray], key: jax.Array):
        n = next(iter(data.values())).shape[0]

        def body(carry, i):
            idx = jax.random.permutation(jax.random.fold_in(key, i), n)
            batch = {
                k: jnp.take(v, idx[: conf.batch_size], axis=0)
                for k, v in data.items()
            }
            return step(carry, batch)

        return jax.lax.scan(body, state, jnp.arange(steps_per_call))

    return many


# keys the train step actually consumes; the rest of the feature dict
# (probabilities, harmonicity) stays on the host.
TRAIN_KEYS = ("f0", "normalized_cents", "loudness", "audio")


def make_eval_step(conf: Config):
    """Jitted (params, batch, key) -> scalar MSS loss, no optimizer.

    The validation analogue of the reference's ``validation_step``
    (reference train/train.py:39-43 renders wavs; here held-out loss is a
    first-class metric and wav dumps are separate, _dump_reconstructions).
    """

    @jax.jit
    def eval_step(params, batch, noise_key):
        return loss_fn(params, batch, conf, noise_key)[0]

    return eval_step


def _held_out_loss(eval_step, params, eval_data, batch_size, key) -> float:
    """Mean eval loss over full batches (rows tiled up if fewer than one)."""
    n = len(next(iter(eval_data.values())))
    if n < batch_size:  # keep one compiled shape: tile rows up to a batch
        reps = -(-batch_size // n)
        eval_data = {
            k: np.concatenate([np.asarray(v)] * reps)[:batch_size]
            for k, v in eval_data.items()
        }
        n = batch_size
    total, count = 0.0, 0
    for start in range(0, n - batch_size + 1, batch_size):
        batch = {
            k: jnp.asarray(np.asarray(v)[start : start + batch_size])
            for k, v in eval_data.items()
        }
        total += float(eval_step(params, batch, jax.random.fold_in(key, start)))
        count += 1
    return total / count


# --- checkpointing -----------------------------------------------------------
_ASYNC_CKPTR = None


def _async_checkpointer():
    """Process-wide AsyncCheckpointer (one background commit thread)."""
    global _ASYNC_CKPTR
    import orbax.checkpoint as ocp

    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until every in-flight async checkpoint save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _prune_checkpoints(ckpt_dir: str, keep: int, protect: str = "") -> None:
    """Delete the oldest finalized step_* dirs, keeping the newest ``keep``.

    Only exact ``step_N`` names are touched, so an in-flight async save
    (Orbax's ``...orbax-checkpoint-tmp-...`` directory) is never pruned.
    ``protect`` names a checkpoint that counts toward the budget but is
    never deleted, whether its async commit has finalized yet or not --
    checking existence instead would race the background rename and
    transiently retain one checkpoint too few.
    """
    import shutil

    if keep <= 0 or not os.path.isdir(ckpt_dir):
        return
    protect = os.path.basename(protect) if protect else ""
    steps = sorted(
        (
            d
            for d in os.listdir(ckpt_dir)
            if re.fullmatch(r"step_\d+", d) and d != protect
        ),
        key=lambda d: int(d.split("_")[1]),
    )
    if protect:
        keep -= 1  # the protected save occupies one retention slot
    for d in steps[: len(steps) - keep] if len(steps) > keep >= 0 else []:
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


def save_checkpoint(
    ckpt_dir: str, state: TrainState, conf: Config, block: Optional[bool] = None
) -> str:
    """Versioned Orbax checkpoint: ckpt_dir/step_<N>/ holding the full state.

    By default (``conf.checkpoint_async``) the save commits on a background
    thread so the train loop never blocks on checkpoint IO (SURVEY.md
    section 5 names async checkpointing explicitly); ``block=True`` forces
    a synchronous commit.  Old checkpoints beyond ``conf.checkpoint_keep``
    are pruned (oldest first; the previous round kept every step_* dir
    forever).  Call :func:`wait_for_checkpoints` before process exit or
    same-process restore.
    """
    import orbax.checkpoint as ocp

    if block is None:
        block = not conf.checkpoint_async
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{int(state.step):08d}"))
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
    }
    ckptr = _async_checkpointer()
    # Drain the previous async commit first (near-instant in steady state:
    # it was issued checkpoint_every steps ago); only then is an existence
    # check race-free.  A re-save to an existing step_N path (same step
    # saved twice, e.g. the final step right after a periodic save, or a
    # re-run landing on the same step count) OVERWRITES: silently skipping
    # would discard the new state while reporting success, and Orbax
    # refuses to save onto an existing directory.
    wait_for_checkpoints()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, args=ocp.args.StandardSave(payload))
    if block:
        ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        f.write(conf.to_json())
    # Prune to the retention budget; the just-issued save (in flight or
    # already finalized) is protected and counts as one retained slot.
    if conf.checkpoint_keep:
        _prune_checkpoints(ckpt_dir, conf.checkpoint_keep, protect=path)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest *finalized* checkpoint, or None.

    A process killed mid-save leaves Orbax's atomic-rename temp directory
    (``step_N.orbax-checkpoint-tmp-...``) behind; only exact ``step_N``
    names are finalized checkpoints, so anything else is skipped — resume
    after a crash lands on the last complete save.
    """
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        d for d in os.listdir(ckpt_dir) if re.fullmatch(r"step_\d+", d)
    ]
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps, key=lambda d: int(d.split("_")[1])))


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    wait_for_checkpoints()  # same-process restore after an async save
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path),
            {"params": template.params, "opt_state": template.opt_state,
             "step": template.step, "rng": template.rng},
        )
    return TrainState(
        restored["step"], restored["params"], restored["opt_state"], restored["rng"]
    )


# --- metrics -----------------------------------------------------------------
class MetricsLogger:
    """JSONL metrics stream + stdout summary (host-0 only under multi-host)."""

    def __init__(self, path: Optional[str], is_host0: bool = True):
        self.path = path
        self.is_host0 = is_host0
        if path and is_host0:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        if not self.is_host0:
            return
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        if self._f:
            self._f.write(json.dumps(row) + "\n")
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()


# --- fit loop ----------------------------------------------------------------
def fit(
    conf: Config,
    features: Dict[str, np.ndarray],
    num_steps: int,
    state: Optional[TrainState] = None,
    log_path: Optional[str] = None,
    dump_audio_dir: Optional[str] = None,
    dump_every: int = 10,
    seed: Optional[int] = None,
    device_steps: int = 0,
    eval_features: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[TrainState, Dict[str, float]]:
    """Train the decoder on extracted features for ``num_steps`` steps.

    ``device_steps > 1`` switches to the device-resident scan trainer
    (``make_train_scan``): features are uploaded once and each host call
    runs that many optimizer steps on-device. Single-host convenience
    wrapper; the multi-chip path lives in parallel/train (same step
    function, sharded batch).

    ``eval_features``: optional held-out feature rows; their mean MSS loss
    is logged as ``eval_loss`` at every logging point (the reference's
    validation pass, train/train.py:39-43 + limit_val_batches).
    """
    from ddsp_tpu.data.dataset import batch_iterator

    key = jax.random.PRNGKey(conf.seed if seed is None else seed)
    if state is None:
        key, ks = jax.random.split(key)
        state = init_state(ks, conf)
    logger = MetricsLogger(log_path)

    eval_step = make_eval_step(conf) if eval_features is not None else None
    eval_data = (
        {k: eval_features[k] for k in TRAIN_KEYS if k in eval_features}
        if eval_features is not None
        else None
    )

    if device_steps > 1:
        return _fit_scan(
            conf, features, num_steps, state, key, logger,
            dump_audio_dir, dump_every, device_steps,
            eval_step=eval_step, eval_data=eval_data,
        )

    step_fn = jax.jit(make_train_step(conf), donate_argnums=0)
    # Only upload what the step consumes -- 'probabilities' alone is
    # (B, T, 360) of dead weight per batch otherwise (the scan path below
    # does the same subsetting).
    train_features = {k: features[k] for k in TRAIN_KEYS if k in features}
    last: Dict[str, float] = {}
    steps_done = 0
    epoch = 0
    t0 = time.time()
    while steps_done < num_steps:
        key, ke = jax.random.split(key)
        for batch in batch_iterator(train_features, conf.batch_size, ke):
            state, metrics = step_fn(state, batch)
            steps_done += 1
            if steps_done % conf.log_every == 0 or steps_done == num_steps:
                last = {k: float(v) for k, v in metrics.items()}
                last["steps_per_s"] = steps_done / (time.time() - t0)
                if eval_step is not None:
                    last["eval_loss"] = _held_out_loss(
                        eval_step, state.params, eval_data, conf.batch_size, key
                    )
                logger.log(int(state.step), last)
            if conf.checkpoint_every and steps_done % conf.checkpoint_every == 0:
                save_checkpoint(conf.checkpoint_dir, state, conf)
            if steps_done >= num_steps:
                break
        epoch += 1
        if dump_audio_dir and (epoch % dump_every == 0 or steps_done >= num_steps):
            _dump_reconstructions(state, conf, features, dump_audio_dir, epoch)
    logger.close()
    wait_for_checkpoints()
    return state, last


_SPECTRA_CACHE_BYTES = 2 << 30  # cache target spectrograms up to 2 GB


def _maybe_cache_target_spectra(conf: Config, features) -> Dict[str, jnp.ndarray]:
    """Precompute per-example target spectrograms when they fit in HBM.

    Saves the 6 target-side STFTs every step (~10% of the step); falls back
    to per-step computation for datasets whose spectra exceed the budget.
    """
    audio = features["audio"]
    n, length = audio.shape
    bins = 0
    for nf in conf.mss_ffts:
        hop = int(nf * (1 - conf.mss_overlap))
        frames = (length + 2 * (nf // 2) - nf) // hop + 1
        bins += frames * (nf // 2 + 1)
    if n * bins * 4 > _SPECTRA_CACHE_BYTES:
        return {}
    loss_dtype = (
        None
        if conf.loss_matmul_dtype == "float32"
        else jnp.dtype(conf.loss_matmul_dtype)
    )

    @jax.jit
    def mags_of(batch):
        return target_spectrograms(
            batch, conf.mss_ffts, conf.mss_overlap, matmul_dtype=loss_dtype
        )

    outs: Dict[str, list] = {}
    bs = max(1, conf.batch_size)
    for s in range(0, n, bs):
        chunk = audio[s : s + bs]
        pad_rows = bs - chunk.shape[0] if chunk.shape[0] < bs else 0
        if pad_rows:
            chunk = np.pad(chunk, ((0, pad_rows), (0, 0)))
        mags = mags_of(jnp.asarray(chunk))
        for k, v in mags.items():
            outs.setdefault(k, []).append(v[: bs - pad_rows] if pad_rows else v)
    return {k: jnp.concatenate(v, axis=0) for k, v in outs.items()}


def _fit_scan(
    conf, features, num_steps, state, key, logger,
    dump_audio_dir, dump_every, device_steps,
    eval_step=None, eval_data=None,
) -> Tuple[TrainState, Dict[str, float]]:
    data = {
        k: jnp.asarray(features[k]) for k in TRAIN_KEYS if k in features
    }
    spectra = _maybe_cache_target_spectra(conf, features)
    if spectra:
        data.update(spectra)
        del data["audio"]  # the cached loss never reads the raw audio
    # exact step count: full device_steps chunks plus (at most) one
    # shorter jitted scan for the remainder
    scans = {device_steps: jax.jit(make_train_scan(conf, device_steps),
                                   donate_argnums=0)}
    last: Dict[str, float] = {}
    steps_done = 0
    calls = 0
    next_ckpt = conf.checkpoint_every or float("inf")
    t0 = time.time()
    while steps_done < num_steps:
        chunk = min(device_steps, num_steps - steps_done)
        if chunk not in scans:
            scans[chunk] = jax.jit(make_train_scan(conf, chunk),
                                   donate_argnums=0)
        key, ke = jax.random.split(key)
        state, mstack = scans[chunk](state, data, ke)
        steps_done += chunk
        calls += 1
        last = {k: float(v[-1]) for k, v in mstack.items()}
        last["loss_mean"] = float(jnp.mean(mstack["loss"]))
        last["steps_per_s"] = steps_done / (time.time() - t0)
        if eval_step is not None:
            last["eval_loss"] = _held_out_loss(
                eval_step, state.params, eval_data, conf.batch_size, key
            )
        logger.log(int(state.step), last)
        if steps_done >= next_ckpt:
            save_checkpoint(conf.checkpoint_dir, state, conf)
            next_ckpt += conf.checkpoint_every
        if dump_audio_dir and (calls % dump_every == 0 or steps_done >= num_steps):
            _dump_reconstructions(state, conf, features, dump_audio_dir, calls)
    logger.close()
    wait_for_checkpoints()
    return state, last


@functools.lru_cache(maxsize=4)
def _dump_decoder(conf: Config):
    """Jitted decode-for-dumping; cached so repeated dumps (and high-latency
    links, where eager op-by-op dispatch is ruinous) pay one compile."""
    return jax.jit(
        lambda params, batch, key: decoder_apply(params, batch, conf, key)
    )


def _dump_reconstructions(state, conf, features, out_dir, epoch, n=2):
    """Write a few reconstructed examples as wavs (the reference's audible
    validation, train/train.py:39-43, with parameterized paths)."""
    from ddsp_tpu.data.audio_io import write_wav

    os.makedirs(out_dir, exist_ok=True)
    batch = {
        k: jnp.asarray(features[k][:n])
        for k in ("f0", "normalized_cents", "loudness")
    }
    pred = _dump_decoder(conf)(state.params, batch, jax.random.PRNGKey(epoch))
    for i, row in enumerate(np.asarray(pred)):
        write_wav(
            os.path.join(out_dir, f"epoch{epoch:03d}-{i}.wav"),
            row / max(1e-6, np.abs(row).max()),
            conf.sample_rate,
        )
