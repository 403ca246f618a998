"""DP correctness on a fake 8-device CPU mesh (SURVEY.md §4.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.config import ModelConfig, TrainConfig
from runet_tpu.models.unet3d import UNet3D, init_params
from runet_tpu.parallel import comm
from runet_tpu.parallel.dp import make_dp_train_step
from runet_tpu.train.state import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    cfg = ModelConfig(num_classes=2, base_features=4, num_levels=2, compute_dtype="float32")
    tcfg = TrainConfig(lr=1e-3, warmup_steps=0, lr_schedule="const", weight_decay=0.0)
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (8, 8, 8))
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 8, 8, 8, 1)).astype(np.float32)
    labels = (rng.uniform(size=(8, 8, 8, 8)) < 0.3).astype(np.int32)
    return cfg, tcfg, model, params, images, labels


def test_mesh_helpers():
    mesh = comm.make_mesh(8)
    assert mesh.axis_names == (comm.DATA_AXIS,)
    assert mesh.devices.shape == (8,)
    sh = comm.batch_sharding(mesh, 5)
    assert sh.spec[0] == comm.DATA_AXIS


def test_dp_grads_match_single_device(setup):
    cfg, tcfg, model, params, images, labels = setup

    # Single-device step on the full global batch.
    state1 = create_train_state(model, jax.tree.map(jnp.copy, params), tcfg)
    step1 = make_train_step(model)
    state1, aux1 = step1(state1, jnp.asarray(images), jnp.asarray(labels))

    # shard_map DP over 8 fake devices, same global batch.
    mesh = comm.make_mesh(8)
    state8 = create_train_state(model, jax.tree.map(jnp.copy, params), tcfg)
    state8 = comm.replicate(mesh, state8)
    im8, lab8 = comm.shard_batch(mesh, (images, labels))
    step8 = make_dp_train_step(model, mesh)
    state8, aux8 = step8(state8, im8, lab8)

    p1 = jax.tree_util.tree_leaves(state1.params)
    p8 = jax.tree_util.tree_leaves(jax.device_get(state8.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_hybrid_mesh_helpers():
    """Multi-host-shaped (dcn × ici) mesh on the fake 8-device CPU mesh."""
    mesh = comm.make_hybrid_mesh(2, 4)
    assert mesh.axis_names == (comm.DCN_AXIS, comm.ICI_AXIS)
    assert mesh.devices.shape == (2, 4)
    assert comm.data_axes(mesh) == (comm.DCN_AXIS, comm.ICI_AXIS)
    sh = comm.batch_sharding(mesh, 5)
    assert sh.spec[0] == (comm.DCN_AXIS, comm.ICI_AXIS)
    # Defaults on a single process: (1, n_local) — same program, no DCN hop.
    mesh1 = comm.make_hybrid_mesh()
    assert mesh1.devices.shape == (1, len(jax.devices()))
    with pytest.raises(ValueError):
        comm.make_hybrid_mesh(3, 3)


def test_init_distributed_single_process_noop():
    assert comm.init_distributed() is False  # nothing to coordinate with


def test_dp_on_hybrid_mesh_matches_single_device(setup):
    """The shard_map DP step over a (2, 4) hybrid mesh == single device."""
    cfg, tcfg, model, params, images, labels = setup

    state1 = create_train_state(model, jax.tree.map(jnp.copy, params), tcfg)
    step1 = make_train_step(model)
    state1, aux1 = step1(state1, jnp.asarray(images), jnp.asarray(labels))

    mesh = comm.make_hybrid_mesh(2, 4)
    stateh = create_train_state(model, jax.tree.map(jnp.copy, params), tcfg)
    stateh = comm.replicate(mesh, stateh)
    imh, labh = comm.shard_batch(mesh, (images, labels))
    steph = make_dp_train_step(model, mesh)
    stateh, auxh = steph(stateh, imh, labh)

    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(jax.device_get(stateh.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(
        float(aux1["loss"]), float(auxh["loss"]), atol=1e-5
    )


def test_dp_augmented_step_matches_single_device(setup):
    """The augmented dp step (per-sample key material sharded like the
    batch) draws the SAME augmentations as the single-device step's
    internal split — params match after one step."""
    from runet_tpu.parallel.dp import split_key_data

    cfg, tcfg, model, params, images, labels = setup
    akey = jax.random.key(11)

    state1 = create_train_state(model, jax.tree.map(jnp.copy, params), tcfg)
    step1 = make_train_step(model, augment=True)
    state1, aux1 = step1(state1, jnp.asarray(images), jnp.asarray(labels), akey)

    mesh = comm.make_mesh(8)
    state8 = create_train_state(model, jax.tree.map(jnp.copy, params), tcfg)
    state8 = comm.replicate(mesh, state8)
    kd = np.asarray(split_key_data(akey, images.shape[0]))
    im8, lab8, kd8 = comm.shard_batch(mesh, (images, labels, kd))
    step8 = make_dp_train_step(model, mesh, augment=True)
    state8, aux8 = step8(state8, im8, lab8, kd8)

    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(jax.device_get(state8.params)),
    ):
        # pmean reduction order differs from the single-device mean: tiny
        # f32 drift on top of identical augmentation draws.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]), atol=1e-5)


def test_dp_step_runs_fused_blocks_interpret():
    """Fused Pallas blocks inside the shard_map dp step: each device traces
    the kernel at LOCAL shard shapes (GSPMD cannot partition the custom
    call — this composition is why the loop routes multi-device through
    shard_map). Interpret mode on the fake mesh; geometry satisfies the v2
    gates (W%64, D%2, H%8)."""
    import runet_tpu.kernels.fused_block as fb

    cfg = ModelConfig(
        num_classes=2, base_features=16, num_levels=2, compute_dtype="float32",
        fused_blocks=True, fused_blocks_train=True, fused_kernel="v2",
    )
    tcfg = TrainConfig(lr=1e-3, warmup_steps=0, lr_schedule="const", weight_decay=0.0)
    model = UNet3D(cfg)
    patch = (4, 8, 64)
    params = init_params(model, jax.random.key(0), patch)
    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, *patch, 1)).astype(np.float32)
    labels = (rng.uniform(size=(2, *patch)) < 0.3).astype(np.int32)

    old = fb.FORCE_INTERPRET
    fb.FORCE_INTERPRET = True
    try:
        assert fb.fused_block_applicable((1, *patch, 16), 16)
        mesh = comm.make_mesh(2)
        state = create_train_state(model, params, tcfg)
        state = comm.replicate(mesh, state)
        im, lab = comm.shard_batch(mesh, (images, labels))
        step = make_dp_train_step(model, mesh)
        state, aux = step(state, im, lab)
        assert np.isfinite(float(aux["loss"]))
        assert np.isfinite(float(aux["grad_norm"]))
    finally:
        fb.FORCE_INTERPRET = old


def test_gspmd_jit_matches_shard_map(setup):
    cfg, tcfg, model, params, images, labels = setup
    mesh = comm.make_mesh(8)

    state_g = create_train_state(model, jax.tree.map(jnp.copy, params), tcfg)
    state_g = comm.replicate(mesh, state_g)
    im, lab = comm.shard_batch(mesh, (images, labels))
    step_g = make_train_step(model)
    state_g, aux_g = step_g(state_g, im, lab)

    state_s = create_train_state(model, jax.tree.map(jnp.copy, params), tcfg)
    state_s = comm.replicate(mesh, state_s)
    step_s = make_dp_train_step(model, mesh)
    state_s, aux_s = step_s(state_s, im, lab)

    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_g.params)),
        jax.tree_util.tree_leaves(jax.device_get(state_s.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_multi_step_matches_sequence(setup):
    """make_dp_multi_train_step (K shard_map micro-steps in one lax.scan
    dispatch, superbatch sharded on axis 1) must match K single dp steps,
    including the per-step augmentation key material."""
    from runet_tpu.parallel.dp import make_dp_multi_train_step, split_key_data

    cfg, tcfg, model, params, images, labels = setup
    K = 2
    rng = np.random.default_rng(5)
    ims = rng.normal(size=(K, 8, 8, 8, 8, 1)).astype(np.float32)
    lbs = (rng.uniform(size=(K, 8, 8, 8, 8)) < 0.3).astype(np.int32)
    akey = jax.random.key(13)
    kds = np.stack(
        [np.asarray(split_key_data(jax.random.fold_in(akey, i), 8)) for i in range(K)]
    )

    mesh = comm.make_mesh(8)
    step = make_dp_train_step(model, mesh, augment=True)
    state_a = comm.replicate(
        mesh, create_train_state(model, jax.tree.map(jnp.copy, params), tcfg)
    )
    losses = []
    for i in range(K):
        im, lb, kd = comm.shard_batch(mesh, (ims[i], lbs[i], kds[i]))
        state_a, aux = step(state_a, im, lb, kd)
        losses.append(float(aux["loss"]))

    multi = make_dp_multi_train_step(model, mesh, K, augment=True)
    state_b = comm.replicate(
        mesh, create_train_state(model, jax.tree.map(jnp.copy, params), tcfg)
    )
    im, lb, kd = comm.shard_batch(mesh, (ims, lbs, kds), batch_axis=1)
    state_b, aux_b = multi(state_b, im, lb, kd)

    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_a.params)),
        jax.tree_util.tree_leaves(jax.device_get(state_b.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    np.testing.assert_allclose(float(aux_b["loss"]), np.mean(losses), atol=1e-5)
