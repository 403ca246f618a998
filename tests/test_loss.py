import numpy as np

import jax.numpy as jnp

from runet_tpu.train.losses import (
    cross_entropy_loss,
    dice_ce_loss,
    hard_dice_per_class,
    kits_composite_dice,
    soft_dice_loss,
)


def _logits_for(labels, num_classes, confidence=20.0):
    onehot = np.eye(num_classes)[labels]
    return (onehot * confidence).astype(np.float32)


def test_perfect_prediction_near_zero_loss():
    labels = np.zeros((1, 4, 4, 4), np.int32)
    labels[0, 1:3, 1:3, 1:3] = 1
    logits = _logits_for(labels, 2)
    loss, aux = dice_ce_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert float(loss) < 1e-3
    assert float(aux["ce_loss"]) < 1e-3
    assert float(aux["dice_loss"]) < 1e-3


def test_wrong_prediction_high_loss():
    labels = np.zeros((1, 4, 4, 4), np.int32)
    labels[0, :2] = 1
    wrong = 1 - labels
    logits = _logits_for(wrong, 2)
    loss, _ = dice_ce_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert float(loss) > 1.5


def test_soft_dice_hand_computed():
    # 2 voxels, 2 classes; probs = softmax([[10,0],[0,10]]) ~ [1,0],[0,1]
    labels = np.array([[0, 1]], np.int32)  # (B=1, N=2)
    logits = np.array([[[10.0, 0.0], [0.0, 10.0]]], np.float32)
    # class1: intersect=1, denom=1+1 -> dice=1 -> loss~0
    loss = soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert float(loss) < 1e-3


def test_ce_matches_manual():
    labels = np.array([[0, 1]], np.int32)
    logits = np.array([[[1.0, 0.0], [0.0, 1.0]]], np.float32)
    want = -np.log(np.exp(1) / (np.exp(1) + 1))
    got = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_absent_class_dice_smooth():
    # Classes 1,2 absent in both gt and pred -> dice term ~1, loss ~0.
    # Exact value: smooth/(smooth + Σsoftmax_leak) = 1e-5/(1e-5 + 27·2e-9)
    # ≈ 0.9946 per class -> loss ≈ 0.005.
    labels = np.zeros((1, 3, 3, 3), np.int32)
    logits = _logits_for(labels, 3)
    loss = soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert float(loss) < 0.01


def test_hard_dice_per_class():
    gt = np.zeros((4, 4, 4), np.int32)
    gt[:2] = 1
    pred = np.zeros((4, 4, 4), np.int32)
    pred[:2, :2] = 1
    d = np.asarray(hard_dice_per_class(jnp.asarray(pred), jnp.asarray(gt), 3))
    # class1: inter=16, sums 32+16 -> 2*16/48
    np.testing.assert_allclose(d[1], 2 * 16 / 48, rtol=1e-6)
    assert d[2] == 1.0  # absent everywhere
    assert 0 < d[0] < 1


def test_kits_composite():
    gt = np.zeros((4, 4, 4), np.int32)
    gt[:2] = 1
    gt[0, 0] = 2
    pred = gt.copy()
    out = kits_composite_dice(jnp.asarray(pred), jnp.asarray(gt))
    assert float(out["kidney_composite"]) == 1.0
    assert float(out["tumor"]) == 1.0


def test_kits_composite_excludes_vessel_classes():
    """Composite membership is exactly {1,2}: in the 5-class renal_anatomy
    convention, predicted artery (3) overlapping gt vein (4) must count as
    zero kidney-composite overlap, not a hit."""
    gt = np.zeros((4, 4, 4), np.int32)
    gt[0] = 4  # vein only
    pred = np.zeros_like(gt)
    pred[0] = 3  # artery exactly where the vein is
    out = kits_composite_dice(jnp.asarray(pred), jnp.asarray(gt))
    # no class-{1,2} voxels on either side -> vacuous perfect score
    assert float(out["kidney_composite"]) == 1.0
    # one side has kidney voxels, vessels must not rescue the overlap
    pred2 = np.zeros_like(gt)
    pred2[0] = 1
    out2 = kits_composite_dice(jnp.asarray(pred2), jnp.asarray(gt))
    assert float(out2["kidney_composite"]) == 0.0


def test_dice_ce_matches_gather_reference():
    """The one-pass gather-free dice_ce_loss (train/losses.py — the
    take_along_axis CE measured 27.5 ms vs 1.9 ms at 128³ on v5e) must
    match the textbook gather formulation on random tensors, values AND
    gradients."""
    import jax

    from runet_tpu.train.losses import dice_ce_loss

    def reference(logits, labels, smooth=1e-5):
        logits = logits.astype(jnp.float32)
        K = logits.shape[-1]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
        ce = -jnp.mean(ll)
        probs = jax.nn.softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(labels, K, dtype=jnp.float32)
        axes = tuple(range(1, labels.ndim))
        inter = jnp.sum(probs * onehot, axis=axes)
        denom = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
        dice = (2.0 * inter + smooth) / (denom + smooth)
        return 1.0 - jnp.mean(dice[:, 1:]) + ce

    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.normal(size=(2, 6, 5, 4, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(2, 6, 5, 4)).astype(np.int32))
    l_new, _ = dice_ce_loss(logits, labels)
    l_ref = reference(logits, labels)
    np.testing.assert_allclose(float(l_new), float(l_ref), rtol=1e-6)
    g_new = jax.grad(lambda lg: dice_ce_loss(lg, labels)[0])(logits)
    g_ref = jax.grad(lambda lg: reference(lg, labels))(logits)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-7)


def test_tversky_default_is_exactly_soft_dice():
    """alpha=beta=0.5 must take the bit-identical soft-Dice branch (the
    static default path in dice_ce_loss) — same value, same gradients."""
    import jax

    from runet_tpu.train.losses import dice_ce_loss

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(2, 4, 4, 4)).astype(np.int32))
    l_a, _ = dice_ce_loss(logits, labels)
    l_b, _ = dice_ce_loss(logits, labels, tversky_alpha=0.5, tversky_beta=0.5)
    assert float(l_a) == float(l_b)
    g_a = jax.grad(lambda lg: dice_ce_loss(lg, labels)[0])(logits)
    g_b = jax.grad(
        lambda lg: dice_ce_loss(lg, labels, tversky_alpha=0.5, tversky_beta=0.5)[0]
    )(logits)
    np.testing.assert_array_equal(np.asarray(g_a), np.asarray(g_b))


def test_tversky_beta_weights_false_negatives():
    """With beta > alpha, an under-segmenting prediction (false negatives)
    must cost more than the mirror over-segmenting one (false positives of
    the same count); at 0.5/0.5 the two cost the same by symmetry."""
    from runet_tpu.train.losses import dice_ce_loss

    gt = np.zeros((1, 8, 8, 8), np.int32)
    gt[0, 2:6, 2:6, 2:6] = 1  # 64 fg voxels
    under = gt.copy()
    under[0, 2:6, 2:6, 2:4] = 0  # drop 32 fg -> 32 FN
    over = gt.copy()
    over[0, 2:6, 2:6, 6:8] = 1  # add 32 fg -> 32 FP

    # Analytic (hard one-hot probs, smooth ~ 0): T = I/(I + a*FP + b*FN);
    # under: I=32, FN=32 -> loss = b/(1+b); over: I=64, FP=32 -> a/(2+a).
    gt_j = jnp.asarray(gt)

    def losses(a, b):
        kw = dict(tversky_alpha=a, tversky_beta=b, ce_weight=0.0)
        lu, _ = dice_ce_loss(_logits_for(jnp.asarray(under), 2), gt_j, **kw)
        lo, _ = dice_ce_loss(_logits_for(jnp.asarray(over), 2), gt_j, **kw)
        return float(lu), float(lo)

    lu, lo = losses(0.3, 0.7)
    np.testing.assert_allclose(lu, 0.7 / 1.7, rtol=1e-4)
    np.testing.assert_allclose(lo, 0.3 / 2.3, rtol=1e-4)
    assert lu > lo  # recall-weighted: missing voxels costs more
    lu_f, lo_f = losses(0.7, 0.3)
    assert lo_f > lu_f  # precision-weighted: the ordering flips


def test_tversky_threads_through_train_step():
    """TrainConfig.tversky_* reaches the jitted step via loss_kwargs and
    changes the loss value (same data, same params, different alpha/beta)."""
    import jax

    from runet_tpu.config import ModelConfig
    from runet_tpu.models.unet3d import UNet3D, init_params
    from runet_tpu.train.state import create_train_state, make_train_step
    from runet_tpu.config import TrainConfig

    cfg = ModelConfig(num_classes=2, base_features=4, num_levels=2,
                      compute_dtype="float32")
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (16, 16, 16))
    tcfg = TrainConfig(patch_size=(16, 16, 16), batch_size=1)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    lab = jnp.asarray((rng.random((1, 16, 16, 16)) < 0.2).astype(np.int32))

    losses = {}
    for name, kw in [("dice", None),
                     ("tversky", {"tversky_alpha": 0.3, "tversky_beta": 0.7})]:
        # fresh param copy per state: the jitted step donates the state,
        # which would delete buffers shared with the next iteration
        p = jax.tree_util.tree_map(jnp.array, params)
        state = create_train_state(model, p, tcfg)
        step = make_train_step(model, loss_kwargs=kw)
        _, aux = step(state, img, lab)
        losses[name] = float(aux["loss"])
    assert losses["dice"] != losses["tversky"]
