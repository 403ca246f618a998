"""Flax 3D U-Net (SURVEY.md L3, §2.1 "3D U-Net"; BASELINE.json north_star).

Architecture contract (reference form was a torch.nn.Module — provenance
[RECALL], mount empty): encoder-decoder where each resolution block is
(Conv3D → InstanceNorm → LeakyReLU) ×2, downsampling by strided conv,
upsampling by transpose conv, skip concatenation, 1×1×1 head → class logits.

TPU-first choices:
- Public contract is NDHWC in / NDHWC logits out, but INTERNALLY the
  (B, D, C, H, W) layout persists across the whole network (round-4
  rework): W rides the 128-wide lanes for the fused Pallas blocks, XLA
  convs use NDCHW dimension_numbers (chip-measured at parity with NDHWC),
  and the only full-width transposes are one tiny C_in transpose at entry
  and a K-channel einsum head at exit — the per-block NDHWC↔DCHW
  transposes this replaced measured ~0.75 ms each at 128³ level 0.
- bf16 compute / f32 params; the logits head and all norm statistics are f32.
- Channel widths doubled per level and capped (nnU-Net-style), all multiples
  of 8 to keep MXU tiles full.
- No Python control flow on traced values; depth/width are static config.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from runet_tpu.config import ModelConfig
from runet_tpu.models.norm import InstanceNorm


class ConvNormAct(nn.Module):
    features: int
    strides: tuple[int, int, int] = (1, 1, 1)
    negative_slope: float = 1e-2
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    axis_name: str | None = None
    # Which fused Pallas generation serves layout="dchw" ("v2" shifted-slab
    # tap GEMMs, "v2m" M-packed — kernels/fused_block.py).
    fused_kernel: str = "v2"

    @nn.compact
    def __call__(self, x, layout: str = "ndhwc", fused: bool = False):
        """layout="dchw" (production): (B, D, C, H, W) — the layout that
        PERSISTS across the whole network (UNet3D transposes once at entry
        and once at exit). ``fused=True`` routes through the Pallas
        conv+IN-stats kernel; ``fused=False`` runs an XLA conv with NDCHW
        dimension_numbers (chip-measured at parity with NDHWC convs —
        XLA's internal layout assignment absorbs the difference).
        layout="dhcw": v1 A/B kernel. layout="ndhwc": legacy XLA path.
        All paths share the same parameter tree (checkpoint-stable)."""
        # The kernel param is owned here (not by nn.Conv) so the XLA and
        # Pallas paths share one checkpoint-stable parameter.
        cin = {"ndhwc": x.shape[-1], "dhcw": x.shape[-2], "dchw": x.shape[-3]}[layout]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, cin, self.features),
            self.param_dtype,
        )
        if layout == "dhcw" or (layout == "dchw" and fused):
            from runet_tpu.kernels.fused_block import (
                conv_in_stats_dchw_batch,
                conv_in_stats_dhcw_batch,
            )

            if self.strides == (2, 2, 2) and layout == "dchw":
                # Fused stride-2 downsample (kernels/strided_conv.py):
                # v2m-style tap GEMMs dense in W, the lane decimation as 0/1
                # selection matmuls on the MXU. Chip-measured 2.88 vs 4.60
                # ms XLA at the 128³ 32→64 geometry, stats included.
                from runet_tpu.kernels.strided_conv import (
                    conv_s2_stats_dchw_batch,
                )

                y, mean, sqm = conv_s2_stats_dchw_batch(
                    x.astype(self.dtype), kernel
                )
            elif self.strides != (1, 1, 1):
                raise ValueError("fused path: stride-1 or dchw stride-2 only")
            elif layout == "dchw":
                y, mean, sqm = conv_in_stats_dchw_batch(
                    x.astype(self.dtype), kernel, version=self.fused_kernel
                )
            else:
                y, mean, sqm = conv_in_stats_dhcw_batch(x.astype(self.dtype), kernel)
            y = InstanceNorm(
                eps=self.norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                axis_name=self.axis_name,
            )(y, moments=(mean, sqm),
              channel_axis=-2 if layout == "dhcw" else -3)
            return nn.leaky_relu(y, self.negative_slope)
        x = x.astype(self.dtype)
        dn = "NDCHW" if layout == "dchw" else "NDHWC"
        # No preferred_element_type: the MXU accumulates bf16 matmuls in
        # f32 regardless, and a f32 output here makes the autodiff
        # transpose-conv see mismatched (f32 cotangent, bf16 kernel).
        x = jax.lax.conv_general_dilated(
            x,
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding="SAME",
            dimension_numbers=(dn, "DHWIO", dn),
        )
        x = InstanceNorm(
            eps=self.norm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            axis_name=self.axis_name,
        )(x, channel_axis=-3 if layout == "dchw" else -1)
        return nn.leaky_relu(x, self.negative_slope)


def _pair_dchw(cna0, cna1, x, features: int, fused_on: bool, version: str,
               contracting_ok: bool = True):
    """Run one or two stride-1 ConvNormActs on a (B, D, C, H, W) activation.

    The layout persists across the WHOLE network (round-4 rework; UNet3D
    transposes once at entry/exit — the per-block NDHWC↔DCHW transposes
    this replaces measured ~0.75 ms each at 128³ level-0, ~6 ms of a
    46.9 ms forward). Fused applicability is gated here on the
    NDHWC-equivalent shape; the v1 A/B kernel wants (B, D, H, C, W) and
    pays local transposes (it is not the production path)."""
    from runet_tpu.kernels.fused_block import fused_block_applicable

    B, D, C, H, W = x.shape
    fused_ok = fused_on and fused_block_applicable(
        (B, D, H, W, C), features, version
    )
    if fused_ok and version == "v1":
        x = jnp.transpose(x, (0, 1, 3, 2, 4))  # DCHW → (B, D, H, C, W)
        if cna0 is not None:
            x = cna0(x, layout="dhcw")
        x = cna1(x, layout="dhcw")
        return jnp.transpose(x, (0, 1, 3, 2, 4))
    # Contracting convs (Cin > features: the decoder 2F→F concat convs) run
    # XLA unless contracting_ok — chip-measured routing rule, see
    # ModelConfig.fused_contracting.
    fused0 = fused_ok and (contracting_ok or C <= features)
    if cna0 is not None:
        x = cna0(x, layout="dchw", fused=fused0)
    return cna1(x, layout="dchw", fused=fused_ok)


class EncoderBlock(nn.Module):
    features: int
    downsample: bool
    negative_slope: float = 1e-2
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    axis_name: str | None = None

    fused_blocks: bool = False
    fused_kernel: str = "v2"
    fused_contracting: bool = True
    fused_downsample: bool = False

    @nn.compact
    def __call__(self, x):  # x: (B, D, C, H, W)
        stride = (2, 2, 2) if self.downsample else (1, 1, 1)
        kw = dict(
            negative_slope=self.negative_slope,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            axis_name=self.axis_name,
            fused_kernel=self.fused_kernel,
        )
        cna0 = ConvNormAct(self.features, strides=stride, **kw)
        cna1 = ConvNormAct(self.features, **kw)
        if self.downsample:
            s2_ok = False
            if self.fused_blocks and self.fused_downsample:
                from runet_tpu.kernels.strided_conv import (
                    conv3x3_s2_applicable,
                )

                s2_ok = conv3x3_s2_applicable(x.shape, self.features)
            # strided: fused s2 Pallas kernel where applicable, XLA NDCHW
            # conv otherwise
            x = cna0(x, layout="dchw", fused=s2_ok)
            return _pair_dchw(None, cna1, x, self.features,
                              self.fused_blocks, self.fused_kernel,
                              self.fused_contracting)
        return _pair_dchw(cna0, cna1, x, self.features,
                          self.fused_blocks, self.fused_kernel,
                          self.fused_contracting)


def depth_to_space_3d(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, D, H, W, r³·F) -> (B, rD, rH, rW, F)."""
    B, D, H, W, C = x.shape
    F = C // (r * r * r)
    x = x.reshape(B, D, H, W, r, r, r, F)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D * r, H * r, W * r, F)


def depth_to_space_dchw(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, D, r³·F, H, W) -> (B, rD, F, rH, rW) — same channel→sub-voxel
    assignment as ``depth_to_space_3d`` (c = ((rd·r + rh)·r + rw)·F + f),
    so the projection weights are layout-independent."""
    B, D, C, H, W = x.shape
    F = C // (r * r * r)
    x = x.reshape(B, D, r, r, r, F, H, W)
    x = x.transpose(0, 1, 2, 5, 6, 3, 7, 4)  # (B, D, rd, F, H, rh, W, rw)
    return x.reshape(B, D * r, F, H * r, W * r)


class _PixelShuffleProj(nn.Module):
    """1×1×1 projection to r³·F channels on a (B, D, C, H, W) activation —
    the linear half of the pixelshuffle upsample, as a contraction over the
    channel axis. Param name/shape ("kernel", (1, 1, 1, C, out)) replicate
    the nn.Conv this replaces (named "Conv_0" by the caller), so existing
    checkpoints load unchanged."""

    features_out: int
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x):  # (B, D, C, H, W) -> (B, D, features_out, H, W)
        C = x.shape[2]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=-2, out_axis=-1),
            (1, 1, 1, C, self.features_out),
            self.param_dtype,
        )
        return jnp.einsum(
            "bdchw,cf->bdfhw",
            x.astype(self.dtype),
            k.reshape(C, self.features_out).astype(self.dtype),
        )


class DecoderBlock(nn.Module):
    features: int
    negative_slope: float = 1e-2
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    axis_name: str | None = None
    upsample_mode: str = "pixelshuffle"
    fused_blocks: bool = False
    fused_kernel: str = "v2"
    fused_contracting: bool = True

    @nn.compact
    def __call__(self, x, skip):  # both (B, D, C, H, W)
        if self.upsample_mode == "pixelshuffle":
            # Equivalent linear family to ConvTranspose(k=2, s=2): each
            # output voxel is a linear map of exactly one input voxel. As a
            # channel contraction the GEMM has 8F output channels — dense,
            # fills the MXU lanes (F=32 alone uses 32/128). name="Conv_0"
            # pins the param path of the nn.Conv this replaced.
            x = _PixelShuffleProj(
                self.features * 8, dtype=self.dtype,
                param_dtype=self.param_dtype, name="Conv_0",
            )(x)
            x = depth_to_space_dchw(x, 2)
        else:
            # Legacy A/B mode: flax ConvTranspose wants NDHWC — local
            # transposes, paid only when explicitly selected.
            x = jnp.transpose(x, (0, 1, 3, 4, 2))
            x = nn.ConvTranspose(
                self.features,
                kernel_size=(2, 2, 2),
                strides=(2, 2, 2),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
            x = jnp.transpose(x, (0, 1, 4, 2, 3))
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=2)
        kw = dict(
            negative_slope=self.negative_slope,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            axis_name=self.axis_name,
            fused_kernel=self.fused_kernel,
        )
        cna0 = ConvNormAct(self.features, **kw)
        cna1 = ConvNormAct(self.features, **kw)
        return _pair_dchw(cna0, cna1, x, self.features,
                          self.fused_blocks, self.fused_kernel,
                          self.fused_contracting)


def level_features(cfg: ModelConfig) -> Sequence[int]:
    return [min(cfg.base_features * (2**i), cfg.max_features) for i in range(cfg.num_levels)]


class _Head(nn.Module):
    """Logits head: 1×1×1 conv expressed as a flat (B·D·H·W, C)×(C, K) dot
    in f32. Parameter names ("kernel"/"bias") and shapes ((1,1,1,C,K)/(K,))
    replicate ``nn.Conv(K, (1,1,1))`` so existing checkpoints load
    unchanged; see UNet3D.__call__ for why this is not an nn.Conv."""

    num_classes: int
    param_dtype: object

    @nn.compact
    def __call__(self, x, layout: str = "ndhwc"):
        """(B, D, H, W, C) -> (B, D, H, W, K); layout="dchw" takes
        (B, D, C, H, W) and contracts the channel axis in place, returning
        NDHWC logits — the K-channel transpose (K = 2-5 classes) costs a
        small fraction of transposing the C-channel activation."""
        C = x.shape[2] if layout == "dchw" else x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=-2, out_axis=-1),
            (1, 1, 1, C, self.num_classes),
            self.param_dtype,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.num_classes,), self.param_dtype
        )
        kmat = k.reshape(C, self.num_classes).astype(jnp.float32)
        if layout == "dchw":
            y = jnp.einsum("bdchw,ck->bdhwk", x.astype(jnp.float32), kmat)
            return y + b.astype(jnp.float32)
        B, D, H, W, _ = x.shape
        xf = x.reshape(B * D * H * W, C).astype(jnp.float32)
        y = xf @ kmat
        y = y + b.astype(jnp.float32)
        return y.reshape(B, D, H, W, self.num_classes)


class UNet3D(nn.Module):
    """cfg-driven 3D U-Net. Input (B, D, H, W, C_in) → logits (B, D, H, W, K).

    Spatial dims must be divisible by 2**(num_levels - 1).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, deep_outputs: bool = False):
        """``deep_outputs=True`` (training with cfg.deep_supervision) also
        returns aux logits from decoder levels 1..2 as a list ordered by
        level — [(stride 2), (stride 4)] where depth allows. The aux heads'
        params are created whenever cfg.deep_supervision is on, regardless
        of ``deep_outputs`` (one checkpoint-stable tree across the train and
        serving call modes); on the default call their outputs are unused
        and XLA dead-code-eliminates them, so inference pays nothing."""
        cfg = self.cfg
        divisor = 2 ** (cfg.num_levels - 1)
        bad = [d for d in x.shape[1:4] if d % divisor != 0]
        if bad:
            raise ValueError(
                f"spatial dims {x.shape[1:4]} must be divisible by "
                f"2**(num_levels-1)={divisor} for skip concatenation"
            )
        dtype = jnp.dtype(cfg.compute_dtype)
        param_dtype = jnp.dtype(cfg.param_dtype)
        feats = level_features(cfg)
        kw = dict(
            negative_slope=cfg.negative_slope,
            norm_eps=cfg.norm_eps,
            dtype=dtype,
            param_dtype=param_dtype,
            axis_name=cfg.spatial_axis,
            fused_blocks=cfg.fused_blocks,
            fused_kernel=cfg.fused_kernel,
            fused_contracting=getattr(cfg, "fused_contracting", True),
        )
        enc_kw = dict(kw, fused_downsample=getattr(cfg, "fused_downsample", False))

        enc_cls, dec_cls = EncoderBlock, DecoderBlock
        if cfg.remat:
            # Recompute block activations during backward (HBM for FLOPs).
            enc_cls = nn.remat(EncoderBlock)
            dec_cls = nn.remat(DecoderBlock)

        x = x.astype(dtype)
        # The (B, D, C, H, W) layout persists across the WHOLE network —
        # one transpose here (C_in is 1-2 channels, trivially cheap) and
        # one K-channel transpose inside the head, instead of a pair of
        # full-width transposes around every fused block (~0.75 ms each at
        # 128³ level 0). XLA convs run with NDCHW dimension_numbers at
        # measured parity with NDHWC.
        x = jnp.transpose(x, (0, 1, 4, 2, 3))
        skips = []
        # Explicit names keep param paths stable across the remat toggle
        # (nn.remat renames the class, which would rename default paths and
        # break checkpoint resume).
        for lvl, f in enumerate(feats):
            x = enc_cls(f, downsample=lvl > 0, name=f"enc{lvl}", **enc_kw)(x)
            if lvl < len(feats) - 1:
                skips.append(x)

        aux = []
        for lvl in reversed(range(len(feats) - 1)):
            x = dec_cls(
                feats[lvl], upsample_mode=cfg.upsample_mode, name=f"dec{lvl}", **kw
            )(x, skips[lvl])
            if cfg.deep_supervision and 1 <= lvl <= 2:
                aux.append(
                    _Head(cfg.num_classes, param_dtype, name=f"ds{lvl}")(
                        x, layout="dchw"
                    )
                )

        # 1×1×1 head as an explicit flattened GEMM. With fused blocks in the
        # graph, a (D,H,W)-shaped 1×1 conv inherits whatever exotic layout
        # the block body settled on; XLA then pays whole-tensor T(1,128)
        # layout copies, a degenerate conv emitter for the head, and a
        # window={D,H,W} conv formulation of the head's weight gradient —
        # ~75 ms of loss-side fusions at 128³ (profiled; the fused train
        # step lost to XLA on exactly this). A reshape→dot head pins a
        # canonical GEMM boundary and avoids conv emitters entirely. The
        # param module/name/shapes replicate the previous
        # nn.Conv(name="Conv_0") exactly, so checkpoints are stable.
        logits = _Head(cfg.num_classes, param_dtype, name="Conv_0")(x, layout="dchw")
        if deep_outputs and cfg.deep_supervision:
            # aux was appended deepest-first; reorder to [level1, level2]
            # (stride 2**level) for the loss weighting.
            return logits, aux[::-1]
        return logits


def create_model(cfg: ModelConfig) -> UNet3D:
    return UNet3D(cfg)


def create_train_model(cfg: ModelConfig) -> UNet3D:
    """Model variant for the training step. Shares the exact param tree with
    ``create_model`` (checkpoint-stable, proven in tests/test_fused_block.py).
    ``fused_blocks_train`` (default ON since round 3) keeps the fused Pallas
    blocks in the step: the v2 custom_vjp (Pallas dx + Pallas dw
    tap-contraction) measured 255 vs 343 ms/step XLA at 128³ batch 1 on v5e;
    set it False to A/B the pure-XLA step (round-2 state, when dw was XLA's
    correlation, measured the other way: 491 vs 300)."""
    import dataclasses

    if cfg.fused_blocks and not cfg.fused_blocks_train:
        cfg = dataclasses.replace(cfg, fused_blocks=False)
    if cfg.fused_blocks and not getattr(cfg, "fused_contracting", True):
        # Pallas dw beats XLA's bwd-weights correlation by far more than
        # any contracting-forward delta (ModelConfig.fused_contracting) —
        # keep every eligible conv fused in the train step even when an
        # experiment disables contracting fusion for serving.
        cfg = dataclasses.replace(cfg, fused_contracting=True)
    # fused_downsample stays ON in the train step: the grad-program A/B
    # (TRAIN_PROFILE.json 2026-08-21) measured step_core 103.0 ms with the
    # s2 Pallas forward (+ its XLA-computed backward) vs 107.8 all-XLA —
    # the forward win survives inside the grad program (unlike the
    # contracting-conv routing, which inverted; both were measured).
    return UNet3D(cfg)


def init_params(model: UNet3D, rng, patch_size: tuple[int, int, int]):
    import jax

    x = jnp.zeros((1, *patch_size, model.cfg.in_channels), jnp.float32)
    return jax.jit(model.init)(rng, x)["params"]
