"""v3 experiment: channels-on-lanes fused Conv3D+IN-stats for DEEP levels
(W<64, C>=128) — measured round 3, NOT integrated. Kept as the evidence
generator for the "levels >=2 stay on XLA" decision (NEXT_STEPS.md).

Design (the part that works): at levels >=2 the channel count reaches the
128-wide lane dimension, so the activation can stay in natural NDHWC — no
layout transpose at all. The padded volume is flattened to rows of
P' = roundup((H+2)(W+2), 16) per depth plane (zero filler rows keep DMA
offsets/counts tile-aligned; Mosaic rejects HBM DMAs with unaligned row
counts) plus roundup(W+3, 16) zero margin rows at each end. Every one of the
27 taps is then a CONTIGUOUS-ROW VIEW of the one DMA'd slab at static offset
kd*P' + (kh-1)*(W+2) + (kw-1): the plane stride P' lines taps up across all
TD depth planes of a grid step, so the whole conv is 27 accumulating
(BM, C) x (C, Cout) GEMMs per M-block with zero data movement — the same
zero-copy property the v2 kernel gets from its (D, C, H, W) layout, without
any W-alignment constraint on the geometry.

Why it is NOT integrated (the decision): under the honest device-loop
protocol (utils/latency.py::scanned_ms; the older chained_ms floors at ~1 ms
of per-call host dispatch through the tunnel and had inflated the XLA
numbers 3-4x), XLA's own implicit-GEMM conv is already efficient at these
shapes — C>=128 fills the MXU contraction dimension, which is exactly the
resource the shallow levels (Cout=32) starve. Measured on v5e (round 3):

    level-2 (32^3, C=128):  XLA 0.73 ms (39.6 TF/s)   v3 0.79 ms (36.7)
    level-3 (16^3, C=256):  XLA 0.62 ms (23.2 TF/s)   v3 0.68 ms (21.3)

The fused stats save one activation re-read but the pad/slice epilogue and
the 1.5x slab re-read give it back. Levels >=2 are ~17 ms of a 230 ms train
step; the structural headroom (~2x at best) is not worth a third custom_vjp
surface. Revisit only if deep-level geometry grows (e.g. much larger
patches) or the step becomes deep-level-bound.

Parity-tested in interpret mode (tests/test_kernels.py::test_v3_deep_parity)
so the measurement stays reproducible; scripts/kernel_bench.py carries the
on-chip rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(n: int, m: int) -> int:
    return -(-n // m) * m


def _v3_kernel(xe, wt_ref, o_ref, sum_ref, sq_ref, slab, sem,
               *, TD, Pp, Wp, H, W, C, BM, MG):
    d_tile = pl.program_id(0)
    nrows = (TD + 2) * Pp + 2 * MG
    cp = pltpu.make_async_copy(
        xe.at[pl.ds(d_tile * TD * Pp, nrows)], slab, sem)
    cp.start()
    cp.wait()

    Cout = o_ref.shape[-1]
    Mtot = TD * Pp
    sums = jnp.zeros((1, Cout), jnp.float32)
    sqs = jnp.zeros((1, Cout), jnp.float32)
    n_full, rem = Mtot // BM, Mtot % BM
    blocks = [(i * BM, BM) for i in range(n_full)]
    if rem:
        blocks.append((n_full * BM, rem))
    for (m0, bm) in blocks:
        acc = jnp.zeros((bm, Cout), jnp.float32)
        for kd in range(3):
            for kh in range(3):
                for kw in range(3):
                    off = kd * Pp + (kh - 1) * Wp + (kw - 1) + MG
                    xv = slab[pl.ds(m0 + off, bm), :]
                    acc = acc + jnp.dot(
                        xv, wt_ref[(kd * 3 + kh) * 3 + kw],
                        preferred_element_type=jnp.float32)
        # Mask pad/filler rows (SAME padding + inter-plane filler):
        # plane-local p = rid % P', h = p // Wp, w = p % Wp.
        rid = m0 + jax.lax.broadcasted_iota(jnp.int32, (bm, Cout), 0)
        p = jax.lax.rem(rid, Pp)
        hh = jax.lax.div(p, Wp)
        ww = jax.lax.rem(p, Wp)
        valid = ((hh >= 1) & (hh <= H) & (ww >= 1) & (ww <= W))
        accm = jnp.where(valid, acc, 0.0)
        yb = accm.astype(o_ref.dtype)
        o_ref[pl.ds(m0, bm), :] = yb
        yf = yb.astype(jnp.float32)
        sums = sums + jnp.sum(yf, axis=0)[None]
        sqs = sqs + jnp.sum(yf * yf, axis=0)[None]
    sum_ref[0, 0] = sums[0]
    sq_ref[0, 0] = sqs[0]


@partial(jax.jit, static_argnames=("interpret", "TD", "BM"))
def conv3x3_v3(x, w, interpret: bool = False, TD: int = 4, BM: int = 512):
    """x: (D, H, W, C) unpadded NDHWC; w: (3, 3, 3, C, Cout). D % TD == 0.

    Returns (y (D, H, W, Cout) in x.dtype, sums (Cout,) f32, sqs (Cout,) f32)
    with sums/sqs = Σy, Σy² over valid voxels (SAME-padding semantics).
    """
    D, H, W, C = x.shape
    Cout = w.shape[-1]
    if D % TD:
        raise ValueError(f"D={D} must be divisible by TD={TD}")
    Hp, Wp = H + 2, W + 2
    P = Hp * Wp
    Pp = _rup(P, 16)
    MG = _rup(Wp + 1, 16)
    xpad = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0))).reshape(D + 2, P, C)
    xpad = jnp.pad(xpad, ((0, 0), (0, Pp - P), (0, 0))).reshape(-1, C)
    xe = jnp.pad(xpad, ((MG, MG), (0, 0)))
    wt = w.reshape(27, C, Cout).astype(x.dtype)
    nD = D // TD
    kernel = partial(_v3_kernel, TD=TD, Pp=Pp, Wp=Wp, H=H, W=W, C=C,
                     BM=BM, MG=MG)
    y, sums, sqs = pl.pallas_call(
        kernel,
        grid=(nD,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TD * Pp, Cout), lambda d: (d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cout), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cout), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D * Pp, Cout), x.dtype),
            jax.ShapeDtypeStruct((nD, 1, Cout), jnp.float32),
            jax.ShapeDtypeStruct((nD, 1, Cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(((TD + 2) * Pp + 2 * MG, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xe, wt)
    y = (y.reshape(D, Pp, Cout)[:, :P]
          .reshape(D, Hp, Wp, Cout)[:, 1:H + 1, 1:W + 1, :])
    return y, sums.sum(axis=(0, 1)), sqs.sum(axis=(0, 1))


def reference_conv3x3_ndhwc(x, w):
    """XLA oracle with the v3 contract (NDHWC, SAME, Σy/Σy² stats)."""
    y = jax.lax.conv_general_dilated(
        x[None], w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))
