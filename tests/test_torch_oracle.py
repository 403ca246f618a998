"""Full-model torch oracle (SURVEY.md §4 test strategy: independent-
implementation parity). The 3D U-Net forward — SAME convs (incl. the
asymmetric stride-2 SAME pad), per-sample InstanceNorm with the E[x²]−µ²
variance formula, LeakyReLU, pixelshuffle upsampling, skip concat order,
f32 GEMM head — re-implemented functionally in torch (CPU) from the param
tree alone. Catches semantic drift (padding rules, stat formulas, concat
order, weight layouts) that same-framework tests cannot."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from runet_tpu.config import ModelConfig  # noqa: E402
from runet_tpu.models.unet3d import create_model, init_params, level_features  # noqa: E402

MC = ModelConfig(
    num_classes=3, base_features=4, max_features=8, num_levels=3,
    compute_dtype="float32",  # oracle compares exact math, not bf16 rounding
)


def _t(a) -> "torch.Tensor":
    # np.array (copy) rather than asarray: jax arrays surface as read-only
    # numpy views, and torch warns on non-writable tensors.
    return torch.from_numpy(np.array(a, np.float32))


def t_conv(x, kernel, stride=1):
    """x: (B, D, H, W, C) torch; kernel: flax (3, 3, 3, Cin, Cout)."""
    import torch.nn.functional as F

    w = _t(np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2)))  # OIDHW
    xc = x.permute(0, 4, 1, 2, 3)
    if stride == 1:
        y = F.conv3d(xc, w, padding=1)
    else:
        # XLA SAME, k=3 s=2, even input: pad_total=1 → (lo, hi) = (0, 1).
        xc = F.pad(xc, (0, 1, 0, 1, 0, 1))
        y = F.conv3d(xc, w, stride=2)
    return y.permute(0, 2, 3, 4, 1)


def t_in(x, scale, bias, eps):
    mean = x.mean(dim=(1, 2, 3), keepdim=True)
    sq = (x * x).mean(dim=(1, 2, 3), keepdim=True)
    var = sq - mean * mean  # match models/norm.py (not E[(x-µ)²])
    y = (x - mean) * torch.rsqrt(var + eps)
    return y * _t(scale) + _t(bias)


def t_cna(x, p, stride=1, slope=1e-2, eps=1e-5):
    y = t_conv(x, p["kernel"], stride)
    y = t_in(y, p["InstanceNorm_0"]["scale"], p["InstanceNorm_0"]["bias"], eps)
    return torch.where(y > 0, y, slope * y)


def t_depth_to_space(x, r=2):
    B, D, H, W, C = x.shape
    F_ = C // (r * r * r)
    x = x.reshape(B, D, H, W, r, r, r, F_)
    x = x.permute(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D * r, H * r, W * r, F_)


def torch_forward(params, x_np, cfg: ModelConfig):
    x = _t(x_np)
    feats = level_features(cfg)
    skips = []
    for lvl in range(len(feats)):
        p = params[f"enc{lvl}"]
        x = t_cna(x, p["ConvNormAct_0"], stride=2 if lvl > 0 else 1,
                  slope=cfg.negative_slope, eps=cfg.norm_eps)
        x = t_cna(x, p["ConvNormAct_1"],
                  slope=cfg.negative_slope, eps=cfg.norm_eps)
        if lvl < len(feats) - 1:
            skips.append(x)
    for lvl in reversed(range(len(feats) - 1)):
        p = params[f"dec{lvl}"]
        k1 = np.asarray(p["Conv_0"]["kernel"])  # (1,1,1,C,8F) pixelshuffle GEMM
        up = x @ _t(k1.reshape(k1.shape[-2], k1.shape[-1]))
        up = t_depth_to_space(up, 2)
        x = torch.cat([up, skips[lvl]], dim=-1)
        x = t_cna(x, p["ConvNormAct_0"], slope=cfg.negative_slope, eps=cfg.norm_eps)
        x = t_cna(x, p["ConvNormAct_1"], slope=cfg.negative_slope, eps=cfg.norm_eps)
    kh = np.asarray(params["Conv_0"]["kernel"])
    bh = np.asarray(params["Conv_0"]["bias"])
    y = x @ _t(kh.reshape(kh.shape[-2], kh.shape[-1])) + _t(bh)
    return y.numpy()


def test_unet_forward_matches_torch_oracle():
    model = create_model(MC)
    params = init_params(model, jax.random.key(0), (16, 16, 16))
    x = np.random.default_rng(0).normal(size=(2, 16, 16, 16, 1)).astype(np.float32)

    got = np.asarray(model.apply({"params": params}, x))
    want = torch_forward(jax.device_get(params), x, MC)
    assert got.shape == want.shape == (2, 16, 16, 16, 3)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_unet_convtranspose_matches_torch_oracle():
    """The alternative upsample_mode='convtranspose' against torch's
    ConvTranspose3d (flax kernel (2,2,2,Cin,Cout) → torch (Cin,Cout,2,2,2))."""
    import dataclasses

    import torch.nn.functional as F

    cfg = dataclasses.replace(MC, upsample_mode="convtranspose", num_levels=2)
    model = create_model(cfg)
    params = jax.device_get(init_params(model, jax.random.key(1), (8, 8, 8)))
    x = np.random.default_rng(1).normal(size=(1, 8, 8, 8, 1)).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, x))

    feats = level_features(cfg)
    t = _t(x)
    t = t_cna(t, params["enc0"]["ConvNormAct_0"])
    t = t_cna(t, params["enc0"]["ConvNormAct_1"])
    skip = t
    t = t_cna(t, params["enc1"]["ConvNormAct_0"], stride=2)
    t = t_cna(t, params["enc1"]["ConvNormAct_1"])
    kt = np.asarray(params["dec0"]["ConvTranspose_0"]["kernel"])  # (2,2,2,Cin,Cout)
    # flax ConvTranspose is lax.conv_transpose (UNFLIPPED taps); torch's is
    # the conv gradient (flipped) — flip spatial dims to map between them.
    kt = kt[::-1, ::-1, ::-1].copy()
    wt = _t(np.transpose(kt, (3, 4, 0, 1, 2)))  # torch (Cin,Cout,kD,kH,kW)
    up = F.conv_transpose3d(t.permute(0, 4, 1, 2, 3), wt, stride=2)
    up = up.permute(0, 2, 3, 4, 1)
    t = torch.cat([up, skip], dim=-1)
    t = t_cna(t, params["dec0"]["ConvNormAct_0"])
    t = t_cna(t, params["dec0"]["ConvNormAct_1"])
    kh = np.asarray(params["Conv_0"]["kernel"])
    bh = np.asarray(params["Conv_0"]["bias"])
    want = (t @ _t(kh.reshape(kh.shape[-2], kh.shape[-1])) + _t(bh)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dice_ce_loss_matches_torch_oracle():
    """The one-pass gather-free Dice+CE (train/losses.py) against torch:
    F.cross_entropy for CE and an explicit softmax soft-Dice — values AND
    input gradients."""
    import torch.nn.functional as F

    from runet_tpu.train.losses import dice_ce_loss

    rng = np.random.default_rng(2)
    K = 4
    logits = rng.normal(size=(2, 5, 6, 7, K)).astype(np.float32)
    labels = rng.integers(0, K, size=(2, 5, 6, 7)).astype(np.int32)

    import jax.numpy as jnp

    loss_fn = lambda lg: dice_ce_loss(lg, labels)[0]  # noqa: E731
    loss_j, grad_j = jax.value_and_grad(loss_fn)(jnp.asarray(logits))

    t = torch.from_numpy(logits).requires_grad_(True)
    lb = torch.from_numpy(labels.astype(np.int64))
    ce = F.cross_entropy(t.permute(0, 4, 1, 2, 3), lb)
    probs = torch.softmax(t, dim=-1)
    onehot = F.one_hot(lb, K).float()
    axes = (1, 2, 3)
    smooth = 1e-5
    inter = (probs * onehot).sum(dim=axes)
    denom = probs.sum(dim=axes) + onehot.sum(dim=axes)
    dice = (2 * inter + smooth) / (denom + smooth)
    dl = 1 - dice[:, 1:].mean()
    loss_t = dl + ce
    loss_t.backward()

    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grad_j), t.grad.numpy(), rtol=1e-4, atol=1e-6
    )
