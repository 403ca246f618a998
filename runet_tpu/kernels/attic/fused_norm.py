"""Pallas fused InstanceNorm + LeakyReLU (SURVEY.md §7 step 9; BASELINE
north_star "Conv3D+InstanceNorm+LeakyReLU blocks ... as fused Pallas
kernels").

Layout: the (B, D, H, W, C) activation is viewed as (B, S, C) with
S = D·H·W; channels ride the 128-lane dimension. A 128³×32ch activation is
~134 MB — far beyond VMEM — so the kernel streams S-tiles:

- pass 1: per-tile partial Σx and Σx² → (B, T, C), reduced to per-(B, C)
  mean/rstd by a trivial XLA reduction (bytes: B·T·C ≈ nothing);
- pass 2: per-tile normalize + affine + LeakyReLU in one VPU sweep.

Exactly two HBM reads + one write of the activation — the minimum for an
exact (non-streaming-variance) instance norm. Gated by ``use_pallas`` with
the hand-written XLA path (models/norm.py) as fallback; parity is tested in
interpret mode on CPU and compiled on TPU (SURVEY.md §4.2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, sum_ref, sq_ref):
    x = x_ref[0].astype(jnp.float32)  # (T, C)
    # Outputs are (1, 1, 1, C) blocks of a (B, n_tiles, 1, C) array — the
    # extra singleton keeps the sublane dim == full array dim (TPU BlockSpec
    # constraint: last two dims divisible by (8, 128) or full).
    sum_ref[0, 0, 0] = jnp.sum(x, axis=0)
    sq_ref[0, 0, 0] = jnp.sum(x * x, axis=0)


def _apply_kernel(x_ref, mean_ref, rstd_ref, scale_ref, bias_ref, neg_slope_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (T, C)
    mean = mean_ref[0]  # (1, C)
    rstd = rstd_ref[0]
    y = (x - mean) * rstd * scale_ref[0] + bias_ref[0]
    slope = neg_slope_ref[0]
    o_ref[0] = jnp.where(y >= 0, y, y * slope).astype(o_ref.dtype)


def _pick_tile(s: int) -> int:
    # Prefer big VPU sweeps; S for our shapes is a multiple of 512.
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if s % t == 0:
            return t
    return 1


@partial(jax.jit, static_argnames=("eps", "negative_slope", "interpret"))
def fused_instance_norm_lrelu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    negative_slope: float = 1e-2,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, D, H, W, C) (or (B, S, C)); returns same shape/dtype."""
    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    xs = x.reshape(B, -1, C)
    S = xs.shape[1]
    T = _pick_tile(S)
    n_tiles = S // T

    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, C), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, C), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, 1, C), jnp.float32),
        ],
        interpret=interpret,
    )(xs)

    mean = sums.sum(axis=(1, 2)) / S  # (B, C)
    var = sqs.sum(axis=(1, 2)) / S - mean * mean
    rstd = jax.lax.rsqrt(var + eps)

    out = pl.pallas_call(
        _apply_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        interpret=interpret,
    )(
        xs,
        mean[:, None, :],
        rstd[:, None, :],
        scale.reshape(1, C).astype(jnp.float32),
        bias.reshape(1, C).astype(jnp.float32),
        jnp.full((1,), negative_slope, jnp.float32),
    )
    return out.reshape(orig_shape)


def reference_instance_norm_lrelu(x, scale, bias, eps=1e-5, negative_slope=1e-2):
    """Pure-XLA oracle for parity tests."""
    xf = x.astype(jnp.float32)
    B, C = x.shape[0], x.shape[-1]
    xs = xf.reshape(B, -1, C)
    mean = xs.mean(axis=1, keepdims=True)
    var = ((xs - mean) ** 2).mean(axis=1, keepdims=True)
    y = (xs - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    y = jnp.where(y >= 0, y, y * negative_slope)
    return y.reshape(x.shape).astype(x.dtype)
