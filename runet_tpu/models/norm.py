"""InstanceNorm3D for NDHWC tensors (SURVEY.md §7 risk list).

Semantics pinned against the torch-CPU oracle (tests/test_model.py):
per-(sample, channel) mean/var over spatial dims, SAME at train and eval (no
running stats) — matching ``torch.nn.InstanceNorm3d`` as used by the
reference's Conv3D+InstanceNorm+LeakyReLU blocks (BASELINE.json north_star).
Stats are computed in float32 regardless of compute dtype (bf16-safe).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class InstanceNorm(nn.Module):
    eps: float = 1e-5
    affine: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # Bound mesh axis for spatial-partition inference (parallel/spatial.py):
    # moments are pmean'd over it so sharded stats match global stats
    # (equal-size shards).
    axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        moments: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        channel_axis: int = -1,
    ) -> jnp.ndarray:
        """x: (B, ..., C) with channels on ``channel_axis``; stats over all
        other non-batch dims in f32.

        ``moments`` — optional precomputed per-(sample, channel) f32
        ``(mean, sq_mean)`` of shape (B, C), e.g. emitted by the fused conv
        kernel (kernels/fused_block.py) so the activation is not re-read
        just to compute statistics. Semantics are identical either way.
        """
        c = x.shape[channel_axis]
        # Broadcast shape: (B, 1, ..., C at channel_axis, ..., 1).
        bshape = [x.shape[0]] + [1] * (x.ndim - 1)
        bshape[channel_axis if channel_axis >= 0 else x.ndim + channel_axis] = c
        if moments is None:
            axes = tuple(
                a for a in range(1, x.ndim)
                if a != (channel_axis % x.ndim)
            )
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes, keepdims=True)
            sq = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
        else:
            xf = x.astype(jnp.float32)
            mean = moments[0].astype(jnp.float32).reshape(bshape)
            sq = moments[1].astype(jnp.float32).reshape(bshape)
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            sq = jax.lax.pmean(sq, self.axis_name)
        # Single-pass E[x²]−E[x]² can round NEGATIVE in f32 when |mean|≫std
        # (near-constant channel late in training) — rsqrt would NaN the
        # whole network; clamp at 0 (the reference two-pass formula is
        # non-negative by construction).
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
            y = y * scale.astype(jnp.float32).reshape(bshape[1:]) + bias.astype(
                jnp.float32
            ).reshape(bshape[1:])
        return y.astype(self.dtype)


def instance_norm_reference(x, scale=None, bias=None, eps: float = 1e-5):
    """Pure-function oracle (numpy/jnp) for kernel parity tests."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3), keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y
