"""Training loop (SURVEY.md L5, §3.1 rebuild form).

One jitted ``train_step`` (fwd+bwd+update) fed by the host prefetch loader;
the host↔device boundary is a single sharded ``device_put`` per step. Data
parallelism comes from the batch's ``data``-axis sharding (GSPMD) or the
explicit ``shard_map`` step — both validated equal in tests/test_parallel.py.
"""

from __future__ import annotations

import time
from functools import lru_cache
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from runet_tpu.config import Config
from runet_tpu.data.dataset import PreparedCase, prepare_dataset
from runet_tpu.data.pipeline import PatchLoader
from runet_tpu.data.sampler import sample_batch
from runet_tpu.models.unet3d import UNet3D, create_train_model, init_params
from runet_tpu.parallel import comm
from runet_tpu.parallel.dp import (
    make_dp_multi_train_step,
    make_dp_train_step,
    split_key_data,
)
from runet_tpu.train.checkpoint import CheckpointManager
from runet_tpu.train.metrics import MetricsLogger
from runet_tpu.train.state import (
    create_train_state,
    make_eval_step,
    make_multi_train_step,
    make_train_step,
)


def validate_patches(
    eval_step,
    params,
    cases: list[PreparedCase],
    patch_size,
    num_classes: int,
    n_patches: int = 8,
    seed: int = 0,
):
    """Cheap patch-based validation: mean per-class hard Dice over fg-biased
    patches. (Full sliding-window eval lives in eval/evaluate.py.)"""
    rng = np.random.default_rng(seed)
    dices = []
    for _ in range(n_patches):
        images, labels = sample_batch(rng, cases, 1, patch_size, fg_prob=1.0)
        d = eval_step(params, jnp.asarray(images), jnp.asarray(labels))
        dices.append(np.asarray(d))
    mean = np.stack(dices).mean(axis=0)
    fg_mean = float(mean[1:].mean()) if num_classes > 1 else float(mean.mean())
    return fg_mean, mean


@lru_cache(maxsize=8)
def _apply_fn_for(model):
    """One stable ``apply_fn`` per model (flax modules hash by config)."""

    def apply_fn(p, w):
        return model.apply({"params": p}, w)

    return apply_fn


def validate_full(
    model,
    params,
    cases: list[PreparedCase],
    infer_cfg,
    num_classes: int,
) -> float:
    """Full sliding-window validation: mean foreground Dice over whole val
    volumes on the preprocessed grid (SURVEY.md §3.4 "validate + save
    checkpoint" — the reference validated on held-out cases, not patches).
    Returns the low-variance metric that keep-best selection keys on."""
    from runet_tpu.eval.evaluate import evaluate_prediction
    from runet_tpu.infer.sliding_window import sliding_window_predict

    # Per-model cached closure: sliding_window_predict's helpers are jitted
    # with apply_fn STATIC, so a fresh closure per validate_full call would
    # retrace (and grow the jit caches) at every full validation.
    apply_fn = _apply_fn_for(model)

    scores = []
    for case in cases:
        pred = sliding_window_predict(
            apply_fn,
            params,
            case.image,
            tuple(infer_cfg.patch_size),
            num_classes,
            overlap=infer_cfg.overlap,
            sigma_scale=infer_cfg.sigma_scale,
            use_gaussian=infer_cfg.use_gaussian,
            window_batch=infer_cfg.window_batch,
            single_pass_ratio=infer_cfg.single_pass_ratio,
            expand_windows=infer_cfg.expand_windows,
        )
        # Same label-range clamp as training (coarse binarizes multi-class GT).
        gt = np.minimum(np.asarray(case.labels), num_classes - 1)
        scores.append(
            evaluate_prediction(np.asarray(pred), gt, num_classes)["dice_fg_mean"]
        )
    return float(np.mean(scores))


def train(
    cfg: Config,
    data_root: str | Path | None = None,
    out_dir: str | Path = "runs/run0",
    cases: list[PreparedCase] | None = None,
    val_cases: list[PreparedCase] | None = None,
    max_steps: int | None = None,
    mesh=None,
    resume: bool = False,
    log_every: int = 50,
    cache_dir: str | Path | None = None,
):
    """Train a model per config; returns (state, last_metrics)."""
    out_dir = Path(out_dir)
    steps = max_steps if max_steps is not None else cfg.train.steps
    if cfg.train.val_full_every > 0:
        # Full validation only triggers inside the val_every branch; a
        # non-multiple would silently run at LCM cadence (possibly never)
        # and keep-best selection would starve.
        if cfg.train.val_every <= 0:
            raise ValueError(
                f"val_full_every={cfg.train.val_full_every} needs val_every>0"
            )
        if cfg.train.val_full_every % cfg.train.val_every:
            raise ValueError(
                f"val_full_every={cfg.train.val_full_every} must be a multiple "
                f"of val_every={cfg.train.val_every}"
            )

    if cases is None:
        if data_root is None:
            raise ValueError("need data_root or cases")
        cases = prepare_dataset(data_root, cfg.preprocess, cache_dir=cache_dir)
    if not cases:
        raise ValueError("no cases found")
    if val_cases is None:
        if len(cases) >= 5:
            n_val = max(1, len(cases) // 10)
            val_cases, cases = cases[-n_val:], cases[:-n_val]
        else:
            val_cases = cases  # tiny/smoke runs validate on train cases

    batch = cfg.train.batch_size
    if mesh is None:
        # Largest device count that divides the global batch.
        n_avail = len(jax.devices())
        n_dev = max(d for d in range(1, n_avail + 1) if batch % d == 0)
        mesh = comm.make_mesh(n_dev)
    n_dev = mesh.devices.size
    if batch % n_dev != 0:
        raise ValueError(f"global batch {batch} not divisible by {n_dev} devices")

    # Two views of ONE param tree: the step model (fused Pallas off unless
    # fused_blocks_train — the fused vjp regresses training, see ModelConfig)
    # and the full model for eval/full-volume validation (fused forward wins).
    model = UNet3D(cfg.model)
    step_model = create_train_model(cfg.model)
    rng_key = jax.random.key(cfg.train.seed)
    params = init_params(model, rng_key, cfg.train.patch_size)
    state = create_train_state(step_model, params, cfg.train)
    state = comm.replicate(mesh, state)

    ckpt = CheckpointManager(out_dir / "ckpt", keep=cfg.train.keep_checkpoints)
    start_step = 0
    if resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_step = int(state.step)

    logger = MetricsLogger(out_dir)
    logger.write_config(cfg.to_json())

    # Multi-device: the explicit shard_map step (parallel/dp.py) — each
    # device traces at LOCAL shard shapes, so the fused Pallas blocks
    # (opaque custom calls the GSPMD partitioner can't split) compose with
    # DP. Single device: the plain jitted step. Proven grad-identical in
    # tests/test_parallel.py.
    K = max(1, cfg.train.steps_per_dispatch)
    if K > 1:
        intervals = {
            "log_every": log_every,
            "val_every": cfg.train.val_every,
            "ckpt_every": cfg.train.ckpt_every,
        }
        if cfg.train.val_full_every:
            intervals["val_full_every"] = cfg.train.val_full_every
        bad = {n: v for n, v in intervals.items() if v % K}
        if bad:
            # Events trigger on (step+1) % every == 0; a chunk only stops at
            # multiples of K, so misaligned intervals would silently skip
            # their events.
            raise ValueError(
                f"steps_per_dispatch={K} requires intervals divisible by it; "
                f"got {bad}"
            )
    loss_kw = {
        "tversky_alpha": cfg.train.tversky_alpha,
        "tversky_beta": cfg.train.tversky_beta,
    }
    if n_dev > 1:
        train_step = make_dp_train_step(
            step_model, mesh, augment=cfg.train.augment, elastic=cfg.train.elastic,
            loss_kwargs=loss_kw,
        )
        if K > 1:
            multi_step = make_dp_multi_train_step(
                step_model, mesh, K,
                augment=cfg.train.augment, elastic=cfg.train.elastic,
                loss_kwargs=loss_kw,
            )
    else:
        train_step = make_train_step(
            step_model, augment=cfg.train.augment, elastic=cfg.train.elastic,
            loss_kwargs=loss_kw,
        )
        if K > 1:
            multi_step = make_multi_train_step(
                step_model, K,
                augment=cfg.train.augment, elastic=cfg.train.elastic,
                loss_kwargs=loss_kw,
            )
    eval_step = make_eval_step(model, cfg.model.num_classes)

    # Each process samples only its LOCAL share of the global batch;
    # comm.shard_batch assembles the global array (single-process: a plain
    # sharded device_put; multi-host: make_array_from_process_local_data).
    n_proc = jax.process_count()
    if batch % n_proc:
        raise ValueError(f"global batch {batch} not divisible by {n_proc} processes")
    loader = PatchLoader(
        cases,
        batch_size=batch // n_proc,
        patch_size=cfg.train.patch_size,
        fg_prob=cfg.train.fg_prob,
        # Decorrelate patch draws across hosts.
        seed=cfg.train.seed + jax.process_index(),
        # Sharded host→device transfer happens on the PREFETCH thread so it
        # overlaps the previous step's compute (a consumer-side put blocks
        # step dispatch ~10 ms through the tunnel; data/pipeline.py).
        put_fn=lambda t: comm.shard_batch(mesh, t, batch_axis=1 if K > 1 else 0),
        # K > 1: (K, B, ...) superbatches for the multi-step dispatch.
        stack_steps=K,
    )
    local = batch // n_proc
    p0 = jax.process_index() * local

    def local_kd(global_step):
        """This process's slice of the per-sample augmentation key material
        (same draws as the single-device step; parallel/dp.py)."""
        kd = np.asarray(split_key_data(jax.random.fold_in(rng_key, global_step), batch))
        return kd[p0:][:local]

    def run_single(images, labels, global_step):
        if cfg.train.augment:
            if n_dev > 1:
                (kd,) = comm.shard_batch(mesh, (local_kd(global_step),))
                return train_step(state, images, labels, kd)
            return train_step(
                state, images, labels, jax.random.fold_in(rng_key, global_step)
            )
        return train_step(state, images, labels)

    aux = {}
    t_last = time.monotonic()
    steps_since_log = 0

    def post_step(done, aux):
        """Events after global step count ``done`` completed (== the old
        per-step ``step + 1``). In chunked mode events only fire at chunk
        ends; the divisibility validation above guarantees that is exactly
        when their intervals trigger."""
        nonlocal t_last, steps_since_log
        if done % log_every == 0 or done == steps:
            aux_host = {k: float(v) for k, v in jax.device_get(aux).items()}
            dt = time.monotonic() - t_last
            logger.log(done, imgs_per_s=batch * steps_since_log / dt, **aux_host)
            t_last = time.monotonic()
            steps_since_log = 0

        # val_every=0/negative disables validation entirely (like
        # val_full_every=0) instead of a ZeroDivisionError mid-run.
        if cfg.train.val_every > 0 and (
            done % cfg.train.val_every == 0 or done == steps
        ):
            val_dice, per_class = validate_patches(
                eval_step, state.params, val_cases,
                cfg.train.patch_size, cfg.model.num_classes,
            )
            logger.log(
                done,
                val_dice=val_dice,
                **{f"val_dice_c{k}": float(v) for k, v in enumerate(per_class)},
            )
            use_full = cfg.train.val_full_every > 0
            if use_full and (
                done % cfg.train.val_full_every == 0 or done == steps
            ):
                # Keep-best keys on the low-variance full-volume Dice.
                full_dice = validate_full(
                    model, state.params, val_cases,
                    cfg.infer, cfg.model.num_classes,
                )
                logger.log(done, val_full_dice=full_dice)
                ckpt.save(
                    done, jax.device_get(state),
                    metrics={"val_dice": full_dice},
                )
            elif use_full:
                # Patch-val steps between full vals: latest-N retention
                # only — the noisy 8-patch estimate must not compete on
                # the best-K ladder against full-volume scores.
                ckpt.save(done, jax.device_get(state), metrics=None)
            else:
                ckpt.save(
                    done, jax.device_get(state),
                    metrics={"val_dice": val_dice},
                )
        elif done % cfg.train.ckpt_every == 0:
            # metrics=None → retained by LatestN only, never GC'd by best-K
            ckpt.save(done, jax.device_get(state), metrics=None)

    try:
        step = start_step
        while step < steps:
            if K == 1:
                images, labels = next(loader)  # already batch-sharded
                state, aux = run_single(images, labels, step)
                step += 1
                steps_since_log += 1
                post_step(step, aux)
                continue
            # Chunked: one (K, B, ...) superbatch per dispatch. A chunk must
            # start K-aligned and span a full K (intervals are K-multiples,
            # so events land exactly at chunk ends); the K-misaligned resume
            # case and the steps tail fall back to single steps on device-
            # sliced micro-batches of the same superbatch.
            images, labels = next(loader)
            chunk = min(K - step % K, steps - step)
            if chunk == K:
                if cfg.train.augment:
                    if n_dev > 1:
                        kds = np.stack(
                            [local_kd(step + i) for i in range(K)]
                        )
                        (kds,) = comm.shard_batch(mesh, (kds,), batch_axis=1)
                        state, aux = multi_step(state, images, labels, kds)
                    else:
                        state, aux = multi_step(
                            state, images, labels, rng_key,
                            jnp.asarray(step, jnp.int32),
                        )
                else:
                    state, aux = multi_step(state, images, labels)
                step += K
                steps_since_log += K
                post_step(step, aux)
            else:
                for i in range(chunk):
                    state, aux = run_single(images[i], labels[i], step)
                    step += 1
                    steps_since_log += 1
                    post_step(step, aux)
    finally:
        loader.close()
        ckpt.wait()
        logger.close()

    return state, aux
