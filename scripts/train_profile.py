"""Piecewise device-time attribution of the production train step
(NEXT_STEPS round-4 priority 3: "profile before attacking").

The fused train step at fine_kits geometry (128³ b1) measured ~230 ms
dispatched and the per-piece budget known so far (model fwd 46, full grad
~174, augment 1.6, optimizer 3.5 ms) leaves a ~50 ms gap between
grad+aux and the full step. This script splits that gap with the
device-loop protocol (`utils/latency.py::scanned_ms` — host dispatch
through the tunnel floors at ~1 ms/call and inflates sub-ms pieces, so
every row here is a lax.scan chain on device):

  fwd          model.apply only
  loss_fwd     apply + dice_ce loss
  grad         jax.grad(loss) + gnorm (no update)
  step_core    grad + gnorm + apply_gradients (state carry; no augment,
               f32 inputs — the pure compute of the micro-step)
  step_aug     step_core + vmapped augmentation + compact-dtype upcasts
               (== the production micro-step body, state carry)
  augment      vmapped augment_one alone
  optimizer    apply_gradients alone (synthetic grads from params)
  dispatched   the production jitted step driven by host dispatch
               (bench protocol) — delta vs step_aug is host overhead

Run on the TPU host:  python scripts/train_profile.py [preset] [patch]
(`patch` — e.g. 32 — overrides the cube edge for CPU smoke tests; the
artifact of record is the preset geometry.)
Writes TRAIN_PROFILE.json at the repo root.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if not len(sys.argv) > 2:  # chip mode: fail fast if the tunnel is dead
    from runet_tpu.utils.health import probe_backend

    _ok, _detail = probe_backend(tries=2)
    if not _ok:
        sys.exit(f"TPU backend unreachable ({_detail}); not starting")

from runet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from runet_tpu.config import get_config  # noqa: E402
from runet_tpu.data.augment import augment_one  # noqa: E402
from runet_tpu.models.unet3d import create_train_model, init_params  # noqa: E402
from runet_tpu.train.losses import dice_ce_loss  # noqa: E402
from runet_tpu.train.state import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from runet_tpu.utils.latency import scanned_ms  # noqa: E402


def scanned_tree_ms(step, tree0, iters: int = 20, reps: int = 3) -> float:
    """`scanned_ms` for pytree carries (train state): min per-iteration ms
    of a shape-preserving tree->tree step chained inside ONE jitted scan."""

    @jax.jit
    def chain(t):
        out, _ = jax.lax.scan(lambda c, _: (step(c), None), t, None, length=iters)
        return out

    out = chain(tree0)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        out = chain(tree0)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.monotonic() - t0) * 1000.0 / iters)
    return best


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "fine_kits"
    cfg = get_config(preset)
    model = create_train_model(cfg.model)
    B = cfg.train.batch_size
    ps = cfg.train.patch_size
    it_scale = 1.0
    if len(sys.argv) > 2:  # CPU smoke override: tiny patch+model, short scans
        import dataclasses

        e = int(sys.argv[2])
        ps = (e, e, e)
        it_scale = 0.0  # floor of 2 iters per row, 1 rep
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, base_features=4, max_features=8, num_levels=2
            ),
        )
        model = create_train_model(cfg.model)
    nc = cfg.model.num_classes

    key = jax.random.key(0)
    params = init_params(model, key, ps)
    state = create_train_state(model, params, cfg.train)

    kx, kl = jax.random.split(jax.random.key(1))
    imgs = jax.random.normal(kx, (B, *ps, 1), jnp.float32)
    labs = jax.random.randint(kl, (B, *ps), 0, nc, jnp.int32)
    imgs_c = imgs.astype(jnp.float16)  # compact transfer dtypes
    labs_c = labs.astype(jnp.uint8)
    imgs, labs, imgs_c, labs_c = jax.device_put((imgs, labs, imgs_c, labs_c))
    params = jax.device_put(params)
    state = jax.device_put(state)

    reps = 3 if it_scale else 1

    def _ms(fn, x0, iters):
        return scanned_ms(fn, x0, iters=max(2, int(iters * it_scale)), reps=reps)

    def _tms(fn, t0, iters):
        return scanned_tree_ms(fn, t0, iters=max(2, int(iters * it_scale)), reps=reps)

    rows = {}

    def loss_fn(p, im, lb):
        logits = model.apply({"params": p}, im)
        loss, aux = dice_ce_loss(logits, lb)
        return loss, aux

    # fwd: carry = images; fold the logits in via the documented *0 trick.
    def fwd_step(x):
        logits = model.apply({"params": params}, x)
        return x + (jnp.mean(logits) * 0).astype(x.dtype)

    rows["fwd_ms"] = _ms(fwd_step, imgs, 20)

    # loss fwd
    def lossfwd_step(x):
        loss, _ = loss_fn(params, x, labs)
        return x + (loss * 0).astype(x.dtype)

    rows["loss_fwd_ms"] = _ms(lossfwd_step, imgs, 20)

    # grad + gnorm (no update)
    import optax

    def grad_step(x):
        grads, _ = jax.grad(loss_fn, has_aux=True)(params, x, labs)
        g = optax.global_norm(grads)
        return x + (g * 0).astype(x.dtype)

    rows["grad_ms"] = _ms(grad_step, imgs, 12)

    # step_core: the full micro-step body minus augment/upcasts, state carry.
    def core(s):
        grads, aux = jax.grad(loss_fn, has_aux=True)(s.params, imgs, labs)
        g = optax.global_norm(grads)
        s = s.apply_gradients(grads=grads)
        return s.replace(step=s.step + (g * 0).astype(s.step.dtype))

    rows["step_core_ms"] = _tms(core, state, 12)

    # step_aug: production micro-step body (augment + compact upcasts),
    # state carry — device time of what make_train_step dispatches.
    def aug_body(s):
        im = imgs_c.astype(jnp.float32)
        lb = jnp.minimum(labs_c.astype(jnp.int32), nc - 1)
        keys = jax.random.split(jax.random.fold_in(key, s.step), B)
        im, lb = jax.vmap(partial(augment_one, elastic=cfg.train.elastic))(
            keys, im, lb
        )
        grads, aux = jax.grad(loss_fn, has_aux=True)(s.params, im, lb)
        g = optax.global_norm(grads)
        s = s.apply_gradients(grads=grads)
        return s.replace(step=s.step + (g * 0).astype(s.step.dtype))

    rows["step_aug_ms"] = _tms(aug_body, state, 12)

    # augment alone
    def aug_step(x):
        keys = jax.random.split(key, B)
        im, _ = jax.vmap(partial(augment_one, elastic=cfg.train.elastic))(
            keys, x, labs
        )
        return im

    rows["augment_ms"] = _ms(aug_step, imgs, 20)

    # optimizer alone: synthetic data-dependent grads (params * 1e-12).
    def opt_step(s):
        grads = jax.tree_util.tree_map(lambda p: p * 1e-12, s.params)
        return s.apply_gradients(grads=grads)

    rows["optimizer_ms"] = _tms(opt_step, state, 20)

    # host snapshot BEFORE the production step donates the state buffers
    # (the batch/remat A/B below needs a live copy).
    state_host = jax.device_get(state)

    # dispatched: the production jitted step, host-dispatch protocol.
    step = make_train_step(model, augment=True, elastic=cfg.train.elastic)
    st = jax.device_put(state)
    st, aux = step(st, imgs_c, labs_c, jax.random.fold_in(key, 0))
    np.asarray(aux["loss"])  # compile + warm
    n = 10 if it_scale else 2
    t0 = time.monotonic()
    for i in range(n):
        st, aux = step(st, imgs_c, labs_c, jax.random.fold_in(key, i + 1))
    np.asarray(aux["loss"])
    rows["dispatched_ms"] = (time.monotonic() - t0) * 1000.0 / n

    # ---- per-chip batch-2 and remat A/B at the TRAIN step (VERDICT r4
    # item 3: the roi_batch inversion was inference-side evidence only;
    # MXU fill at Cout=32 might reward batching in train even though it
    # regressed in serving) ----
    import dataclasses as _dc

    # fresh state copy: the dispatched section above DONATED the original
    # state buffers to the production step.
    state_ab = jax.device_put(state_host)
    for tag, (b_ab, rm, s2) in {
        "b2": (2, False, False), "b1_remat": (1, True, False),
        "b2_remat": (2, True, False), "b1_s2fused": (1, False, True),
    }.items():
        mcfg_ab = _dc.replace(cfg.model, remat=rm)
        if s2:
            # bypass create_train_model's forced-off: build the serving-
            # routing model directly (the s2 custom_vjp makes it valid).
            from runet_tpu.models.unet3d import UNet3D

            m_ab = UNet3D(_dc.replace(mcfg_ab, fused_downsample=True))
        else:
            m_ab = create_train_model(mcfg_ab)
        im_ab = jnp.concatenate([imgs] * b_ab) if b_ab > 1 else imgs
        lb_ab = jnp.concatenate([labs] * b_ab) if b_ab > 1 else labs

        def core_ab(s, _m=m_ab, _im=im_ab, _lb=lb_ab):
            def lf(p, im, lb):
                logits = _m.apply({"params": p}, im)
                return dice_ce_loss(logits, lb)

            grads, _aux = jax.grad(lf, has_aux=True)(s.params, _im, _lb)
            g = optax.global_norm(grads)
            s = s.apply_gradients(grads=grads)
            return s.replace(step=s.step + (g * 0).astype(s.step.dtype))

        try:
            rows[f"step_core_{tag}_ms"] = _tms(core_ab, state_ab, 8)
        except Exception as e:
            rows[f"step_core_{tag}_error"] = str(e)[:140]

    rows = {k: (round(v, 2) if isinstance(v, float) else v) for k, v in rows.items()}
    out = {
        "preset": preset,
        "patch": list(ps),
        "batch": B,
        "fused_blocks_train": bool(cfg.model.fused_blocks_train),
        "rows": rows,
        "derived": {
            # what augment+upcasts cost inside the step
            "aug_overhead_ms": round(rows["step_aug_ms"] - rows["step_core_ms"], 2),
            # what gnorm+update+aux cost beyond the bare grad
            "update_tail_ms": round(rows["step_core_ms"] - rows["grad_ms"], 2),
            # per-dispatch host overhead through the tunnel
            "dispatch_overhead_ms": round(
                rows["dispatched_ms"] - rows["step_aug_ms"], 2
            ),
            "bwd_minus_fwd_ms": round(rows["grad_ms"] - rows["loss_fwd_ms"], 2),
        },
    }
    if "step_core_b2_ms" in rows:
        out["derived"]["b2_ms_per_patch"] = round(rows["step_core_b2_ms"] / 2, 2)
        out["derived"]["b2_verdict"] = (
            "B=2 wins per patch"
            if rows["step_core_b2_ms"] / 2 < rows["step_core_ms"] * 0.98
            else "B=1 stands (B=2 not >2% better per patch)"
        )
    if "step_core_b1_remat_ms" in rows:
        out["derived"]["remat_overhead_pct"] = round(
            (rows["step_core_b1_remat_ms"] / rows["step_core_ms"] - 1) * 100, 1
        )
    if it_scale:  # smoke runs (patch override) don't write the artifact
        Path(__file__).resolve().parent.parent.joinpath(
            "TRAIN_PROFILE.json"
        ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
