"""Gradient accumulation + rematerialization (SURVEY.md §2.3, §5)."""

import numpy as np

import jax
import jax.numpy as jnp

from runet_tpu.config import ModelConfig, TrainConfig
from runet_tpu.models.unet3d import UNet3D, init_params
from runet_tpu.train.state import create_train_state, make_train_step


def _setup(grad_accum=1, remat=False):
    cfg = ModelConfig(
        num_classes=2, base_features=4, num_levels=2, compute_dtype="float32",
        remat=remat,
    )
    tcfg = TrainConfig(
        lr=1e-2, warmup_steps=0, lr_schedule="const", weight_decay=0.0,
        grad_accum=grad_accum,
    )
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (8, 8, 8))
    state = create_train_state(model, params, tcfg)
    return model, state


def test_grad_accum_matches_full_batch():
    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, 8, 8, 8, 1)).astype(np.float32)
    labels = (rng.uniform(size=(4, 8, 8, 8)) < 0.3).astype(np.int32)

    model, state_full = _setup(grad_accum=1)
    step_full = make_train_step(model)
    state_full, _ = step_full(state_full, jnp.asarray(images), jnp.asarray(labels))

    model2, state_acc = _setup(grad_accum=2)
    step_acc = make_train_step(model2)
    state_acc, _ = step_acc(state_acc, jnp.asarray(images[:2]), jnp.asarray(labels[:2]))
    state_acc, _ = step_acc(state_acc, jnp.asarray(images[2:]), jnp.asarray(labels[2:]))

    # MultiSteps averages micro-grads == full-batch grad (equal halves)...
    # except the dice loss is nonlinear in the batch, so allow tolerance on
    # the CE+dice mix: compare updated params loosely.
    p1 = jax.tree_util.tree_leaves(state_full.params)
    p2 = jax.tree_util.tree_leaves(state_acc.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_grad_accum_only_applies_every_k():
    model, state = _setup(grad_accum=2)
    step = make_train_step(model)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    labels = jnp.asarray((rng.uniform(size=(1, 8, 8, 8)) < 0.3).astype(np.int32))
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = step(state, images, labels)
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    # After the first micro-step params must be UNCHANGED.
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state, _ = step(state, images, labels)
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert np.abs(np.asarray(p2) - np.asarray(p0)).max() > 0


def test_bf16_train_step_differentiable():
    """Regression: the bf16 conv path must be differentiable (a f32
    preferred_element_type on the conv made the transpose-conv see
    mismatched dtypes; caught only on TPU because other tests use f32)."""
    cfg = ModelConfig(num_classes=2, base_features=4, num_levels=2, compute_dtype="bfloat16")
    tcfg = TrainConfig(lr=1e-3, warmup_steps=0, lr_schedule="const")
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (8, 8, 8))
    state = create_train_state(model, params, tcfg)
    step = make_train_step(model, augment=True)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    lab = jnp.asarray((rng.uniform(size=(1, 8, 8, 8)) < 0.3).astype(np.int32))
    state, aux = step(state, img, lab, jax.random.key(1))
    assert np.isfinite(float(aux["loss"]))


def test_out_of_range_labels_clamped():
    """Regression: a 2-class coarse model trained on 3-class ground truth
    (tumor label 2) must binarize, not NaN (OOB take_along_axis is NaN on
    TPU)."""
    model, state = _setup()
    step = make_train_step(model)
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    lab = np.zeros((1, 8, 8, 8), np.int32)
    lab[0, 2:6, 2:6, 2:6] = 1
    lab[0, 3:5, 3:5, 3:5] = 2  # out of range for num_classes=2
    state, aux = step(state, img, jnp.asarray(lab))
    assert np.isfinite(float(aux["loss"]))
    assert np.isfinite(float(aux["ce_loss"]))


def test_remat_same_grads():
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    labels = jnp.asarray((rng.uniform(size=(1, 8, 8, 8)) < 0.3).astype(np.int32))

    # Same init params for both (block names are remat-stable), so grads
    # and losses must match exactly up to float assoc.
    outs = []
    for remat in (False, True):
        model, state = _setup(remat=remat)
        step = make_train_step(model)
        state, aux = step(state, images, labels)
        outs.append((jax.tree_util.tree_leaves(state.params), float(aux["loss"])))
    assert abs(outs[0][1] - outs[1][1]) < 1e-6
    for a, b in zip(outs[0][0], outs[1][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_compact_transfer_dtypes_match_f32():
    """f16-image / uint8-label transfer (data/pipeline.py compact_transfer)
    trains identically to f32/int32 when inputs are f16-representable."""
    rng = np.random.default_rng(3)
    # Round-trip through f16 so both paths see bit-identical values.
    images = rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float16).astype(np.float32)
    labels = (rng.uniform(size=(1, 8, 8, 8)) < 0.3).astype(np.int32)

    model, state_a = _setup()
    step = make_train_step(model)
    state_a, aux_a = step(state_a, jnp.asarray(images), jnp.asarray(labels))

    _, state_b = _setup()
    state_b, aux_b = step(
        state_b,
        jnp.asarray(images.astype(np.float16)),
        jnp.asarray(labels.astype(np.uint8)),
    )
    assert abs(float(aux_a["loss"]) - float(aux_b["loss"])) < 1e-6
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_patch_loader_compact_transfer_dtypes():
    from runet_tpu.data.phantom import make_phantom
    from runet_tpu.data.dataset import PreparedCase
    from runet_tpu.data.pipeline import PatchLoader

    img, seg = make_phantom((24, 24, 16), (1.0, 1.0, 1.0), num_classes=2, seed=0)
    case = PreparedCase(
        case_id="c0", image=img.astype(np.float32), labels=seg.astype(np.uint8),
        native_shape=img.shape, native_spacing=(1.0, 1.0, 1.0),
        affine=np.eye(4), fg_coords=None,
    )
    loader = PatchLoader([case], batch_size=2, patch_size=(8, 8, 8))
    try:
        images, labels = next(loader)
        assert images.dtype == jnp.float16
        assert labels.dtype == jnp.uint8
    finally:
        loader.close()


def test_multi_step_matches_k_single_steps():
    """make_multi_train_step (K micro-steps in one lax.scan dispatch) must
    reproduce K calls of make_train_step exactly — same augmentation draws
    (fold_in(key, step0+i)), same updates, chunk-mean aux."""
    from runet_tpu.train.state import make_multi_train_step

    K = 3
    rng = np.random.default_rng(3)
    images = rng.normal(size=(K, 2, 8, 8, 8, 1)).astype(np.float32)
    labels = (rng.uniform(size=(K, 2, 8, 8, 8)) < 0.3).astype(np.int32)
    key = jax.random.key(7)

    model, state_a = _setup()
    single = make_train_step(model, augment=True)
    losses = []
    for i in range(K):
        state_a, aux = single(
            state_a, jnp.asarray(images[i]), jnp.asarray(labels[i]),
            jax.random.fold_in(key, 5 + i),
        )
        losses.append(float(aux["loss"]))

    model_b, state_b = _setup()
    multi = make_multi_train_step(model_b, K, augment=True)
    state_b, aux_b = multi(
        state_b, jnp.asarray(images), jnp.asarray(labels), key,
        jnp.asarray(5, jnp.int32),
    )

    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(float(aux_b["loss"]), np.mean(losses), rtol=1e-6)


def test_loop_steps_per_dispatch_equivalent(tmp_path):
    """train() with steps_per_dispatch=2 must produce the same params as the
    classic per-step loop (same seed ⇒ same patch draws + same augmentation
    keys), including through a non-K-aligned tail."""
    from pathlib import Path
    import dataclasses

    from runet_tpu.config import Config, PreprocessConfig
    from runet_tpu.data.phantom import write_phantom_dataset
    from runet_tpu.train.loop import train

    data = tmp_path / "data"
    write_phantom_dataset(Path(data), num_cases=1, shape=(24, 24, 16), spacing=(1.0, 1.0, 1.0))
    base = Config(
        model=ModelConfig(num_classes=2, base_features=4, num_levels=2,
                          compute_dtype="float32"),
        preprocess=PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None),
        train=TrainConfig(patch_size=(8, 8, 8), batch_size=1, steps=5,
                          lr=1e-2, warmup_steps=0, lr_schedule="const",
                          val_every=100, ckpt_every=100, seed=11),
    )
    s1, _ = train(base, data_root=data, out_dir=tmp_path / "r1",
                  log_every=100, mesh=None)
    cfg2 = dataclasses.replace(
        base, train=dataclasses.replace(base.train, steps_per_dispatch=2)
    )
    s2, _ = train(cfg2, data_root=data, out_dir=tmp_path / "r2",
                  log_every=100, mesh=None)
    # Same draws and same math, but scan vs per-dispatch programs fuse
    # reductions differently — tiny float drift gets amplified by AdamW's
    # rsqrt normalization over the 5 steps; equivalence is semantic, not
    # bitwise.
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_loop_steps_per_dispatch_validates_intervals(tmp_path):
    import pytest as _pytest
    from pathlib import Path

    from runet_tpu.config import Config, PreprocessConfig
    from runet_tpu.data.phantom import write_phantom_dataset
    from runet_tpu.train.loop import train

    data = tmp_path / "data"
    write_phantom_dataset(Path(data), num_cases=1, shape=(24, 24, 16), spacing=(1.0, 1.0, 1.0))
    cfg = Config(
        model=ModelConfig(num_classes=2, base_features=4, num_levels=2),
        preprocess=PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None),
        train=TrainConfig(patch_size=(8, 8, 8), batch_size=1, steps=4,
                          val_every=3, ckpt_every=3, steps_per_dispatch=2),
    )
    with _pytest.raises(ValueError, match="steps_per_dispatch"):
        train(cfg, data_root=data, out_dir=tmp_path / "r", log_every=2)


def test_loop_steps_per_dispatch_multidevice_tail(tmp_path):
    """Chunked loop on a REAL 2-device mesh with a non-K-aligned step count:
    the tail falls back to single dp steps on axis-0 slices of the
    axis-1-sharded superbatch (train/loop.py) — params must match the
    per-step dp loop draw-for-draw."""
    import dataclasses
    from pathlib import Path

    from runet_tpu.config import Config, PreprocessConfig
    from runet_tpu.data.phantom import write_phantom_dataset
    from runet_tpu.parallel import comm
    from runet_tpu.train.loop import train

    data = tmp_path / "data"
    write_phantom_dataset(Path(data), num_cases=1, shape=(24, 24, 16), spacing=(1.0, 1.0, 1.0))
    base = Config(
        model=ModelConfig(num_classes=2, base_features=4, num_levels=2,
                          compute_dtype="float32"),
        preprocess=PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None),
        train=TrainConfig(patch_size=(8, 8, 8), batch_size=2, steps=3,
                          lr=1e-2, warmup_steps=0, lr_schedule="const",
                          val_every=100, ckpt_every=100, seed=13),
    )
    mesh = comm.make_mesh(2)
    s1, _ = train(base, data_root=data, out_dir=tmp_path / "r1",
                  log_every=100, mesh=mesh)
    cfg2 = dataclasses.replace(
        base, train=dataclasses.replace(base.train, steps_per_dispatch=2)
    )
    mesh2 = comm.make_mesh(2)
    s2, _ = train(cfg2, data_root=data, out_dir=tmp_path / "r2",
                  log_every=100, mesh=mesh2)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_sgd_optimizer_trains(tmp_path):
    """TrainConfig.optimizer='sgd' (Nesterov, nnU-Net lineage): the loop
    runs, the loss is finite and moves, and an unknown name raises."""
    import dataclasses
    from pathlib import Path

    import pytest

    from runet_tpu.config import Config, PreprocessConfig
    from runet_tpu.data.phantom import write_phantom_dataset
    from runet_tpu.train.loop import train
    from runet_tpu.train.state import make_optimizer

    data = tmp_path / "data"
    write_phantom_dataset(Path(data), num_cases=1, shape=(24, 24, 16),
                          spacing=(1.0, 1.0, 1.0))
    cfg = Config(
        model=ModelConfig(num_classes=2, base_features=4, num_levels=2,
                          compute_dtype="float32"),
        preprocess=PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None),
        train=TrainConfig(patch_size=(8, 8, 8), batch_size=2, steps=30,
                          lr=1e-2, warmup_steps=0, lr_schedule="poly",
                          optimizer="sgd", val_every=1000, ckpt_every=1000,
                          seed=3),
    )
    state, aux = train(cfg, data_root=data, out_dir=tmp_path / "run",
                       log_every=1000)
    assert np.isfinite(float(aux["loss"]))
    assert int(state.step) == 30

    with pytest.raises(ValueError, match="unknown optimizer"):
        make_optimizer(dataclasses.replace(cfg.train, optimizer="bogus"))
