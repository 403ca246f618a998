"""Layout-persistent fused Pallas Conv3D + InstanceNorm-stats kernel
(SURVEY.md §7 step 9; BASELINE north_star "Conv3D+InstanceNorm+LeakyReLU
blocks ... as fused Pallas kernels").

Round-1 postmortem (kernels/conv3d.py): the im2col Pallas conv beat XLA
1.37× isolated but lost end-to-end because every conv paid NDHWC↔(C,W-minor)
transposes plus three W-shifted HBM copies. This module is the designed fix:

- **Layout persistence** — originally (D, H, C, W) per block (v1); the
  production path now keeps (B, D, C, H, W) across the WHOLE network
  (models/unet3d.py round-4 rework), so the kernels see their native
  layout with no per-block transposes at all.
- **Single input slab, W-shifts in VMEM**: instead of three W-shifted HBM
  copies (3× input DMA traffic), each program DMAs ONE (TD+2, TH+2, C, W)
  slab and builds the kw=0/2 taps with ``pltpu.roll`` + edge masking — the
  roll is a VPU shuffle, the zero-mask reproduces SAME padding exactly.
- **InstanceNorm statistics fused into the conv**: per-program Σy and Σy²
  partials are accumulated from the f32 GEMM registers and written as tiny
  (Cout,) outputs, so the norm needs NO extra read of the activation. The
  normalize+LeakyReLU apply runs as XLA elementwise ops in the same layout
  (bandwidth-bound; XLA fuses them into one pass).
- **Differentiable**: custom_vjp where dx is this same kernel applied to the
  cotangent with flipped/swapped weights (fast path), dw is XLA's
  large-kernel correlation (its forward is DCE'd under jit), and the stats
  cotangents fold into the y cotangent as gy + gs + 2·y·gq.

Layout rationale (Mosaic tiling): channels ride the sublanes (C multiple of
16 for bf16 tiles — the wrapper zero-pads channels, which is exact), W rides
the 128-wide lanes. The im2col tile packs K = 27·C so the MXU contraction
dimension is full; M = Cout (≤32 at level 0) bounds utilization at 25% of
the MXU rows — that bound is inherent to the model's channel width.

XLA is the always-correct fallback (models/unet3d.py gates on
``fused_block_applicable``); parity + grads are tested against
``reference_conv3x3_dhcw`` in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test hook: force the fused path (interpret-mode kernels) on non-TPU
# backends so CPU tests exercise the real model integration.
FORCE_INTERPRET = False


def _conv_stats_kernel(
    xp, wt_ref, o_ref, sum_ref, sq_ref, slab, slabR, slabL, col, sem,
    *, TD, TH, RH, W, C,
):
    d_tile = pl.program_id(0)
    h_tile = pl.program_id(1)

    cp = pltpu.make_async_copy(
        xp.at[pl.ds(d_tile * TD, TD + 2), pl.ds(h_tile * TH, TH + 2)],
        slab,
        sem,
    )
    cp.start()
    cp.wait()

    # W-shifted tap planes in VMEM: roll along lanes + zero the wrapped
    # column (== SAME zero padding in W). 2D view keeps the roll on a
    # well-supported (sublane, lane) shape.
    n_rows = (TD + 2) * (TH + 2) * C
    # Mosaic's lane rotate is 32-bit only → roll an f32 upcast, downcast on
    # store (exact: bf16→f32→bf16 round-trips bit-identically).
    x2 = slab[:].reshape(n_rows, W).astype(jnp.float32)
    wids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 1)
    xr = jnp.where(wids == 0, 0.0, pltpu.roll(x2, 1, axis=1))
    xl = jnp.where(wids == W - 1, 0.0, pltpu.roll(x2, W - 1, axis=1))
    slabR[:] = xr.reshape(slab.shape).astype(slab.dtype)  # [., w] = x[., w-1]
    slabL[:] = xl.reshape(slab.shape).astype(slab.dtype)  # [., w] = x[., w+1]

    Cout = o_ref.shape[2]
    n_h_blocks = TH // RH
    slabs = (slabR, slab, slabL)  # kw = 0, 1, 2 → x[w + kw - 1]

    def h_body(hb, carry):
        sums, sqs, d = carry
        h0 = hb * RH
        # im2col tile (27·C, RH·W): one (C, W) write per (tap, row).
        for kd in range(3):
            for kh in range(3):
                for kw in range(3):
                    tap = (kd * 3 + kh) * 3 + kw
                    for r in range(RH):
                        col[pl.ds(tap * C, C), pl.ds(r * W, W)] = (
                            slabs[kw][d + kd, h0 + kh + r]
                        )
        acc = jnp.dot(
            wt_ref[:], col[:], preferred_element_type=jnp.float32
        )  # (Cout, RH·W) f32
        yb = acc.astype(o_ref.dtype)
        o_ref[d, pl.ds(h0, RH)] = (
            yb.reshape(Cout, RH, W).transpose(1, 0, 2)
        )
        # IN stats from the rounded output (matches the XLA fallback, which
        # computes f32 stats of the bf16 conv output).
        yf = yb.astype(jnp.float32)
        sums = sums + jnp.sum(yf, axis=1)[None]
        sqs = sqs + jnp.sum(yf * yf, axis=1)[None]
        return sums, sqs, d

    sums = jnp.zeros((1, Cout), jnp.float32)
    sqs = jnp.zeros((1, Cout), jnp.float32)
    for d in range(TD):  # static unroll over slab depth
        sums, sqs, _ = jax.lax.fori_loop(0, n_h_blocks, h_body, (sums, sqs, d))
    sum_ref[0, 0, 0] = sums[0]
    sq_ref[0, 0, 0] = sqs[0]


def _pick_tiles(D: int, H: int, C: int, W: int, itemsize: int) -> tuple[int, int, int]:
    """(TD, TH, RH) — largest tile whose VMEM footprint fits comfortably.

    RH shrinks before the tile does: the col buffer (27·C·RH·W) dominates at
    large C·W, and a smaller RH only adds fori iterations, not DMA traffic.
    """
    for TD, TH in ((4, 16), (2, 8), (2, 4), (1, 2), (1, 1)):
        if D % TD or H % TH:
            continue
        slab_b = 3 * (TD + 2) * (TH + 2) * C * W * itemsize
        for RH in (min(8, TH), 4, 2, 1):
            if RH > TH or TH % RH:
                continue
            col_b = 27 * C * RH * W * itemsize
            if slab_b + col_b <= 10 * 1024 * 1024:
                return TD, TH, RH
    raise ValueError(f"no tile config for D={D} H={H} C={C} W={W}")


@partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_dhcw_impl(xp: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """xp: (D+2, H+2, C, W) — D/H zero-padded by 1, W unpadded (SAME padding
    in W comes from the in-kernel roll masks). w: (3, 3, 3, C, Cout).

    Returns (y (D, H, Cout, W) in xp.dtype, sums (Cout,) f32, sqs (Cout,) f32)
    where sums/sqs are Σy and Σy² over (D, H, W) of the rounded output.

    Constraints: C and Cout multiples of 16 (bf16 sublane tiles), W % 128 == 0,
    and (D, H) divisible by a supported tile config.
    """
    Dp, Hp, C, W = xp.shape
    D, H = Dp - 2, Hp - 2
    Cout = w.shape[-1]
    if C % 16 or Cout % 16 or W % 128:
        raise ValueError(f"need C%16==0, Cout%16==0, W%128==0; got C={C} Cout={Cout} W={W}")
    TD, TH, RH = _pick_tiles(D, H, C, W, xp.dtype.itemsize)

    wt = w.reshape(27 * C, Cout).T.astype(xp.dtype)
    kernel = partial(_conv_stats_kernel, TD=TD, TH=TH, RH=RH, W=W, C=C)
    nD, nH = D // TD, H // TH
    y, sums, sqs = pl.pallas_call(
        kernel,
        grid=(nD, nH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (TD, TH, Cout, W), lambda d, h: (d, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1, Cout), lambda d, h: (d, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1, Cout), lambda d, h: (d, h, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, H, Cout, W), xp.dtype),
            jax.ShapeDtypeStruct((nD, nH, 1, Cout), jnp.float32),
            jax.ShapeDtypeStruct((nD, nH, 1, Cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TD + 2, TH + 2, C, W), xp.dtype),
            pltpu.VMEM((TD + 2, TH + 2, C, W), xp.dtype),
            pltpu.VMEM((TD + 2, TH + 2, C, W), xp.dtype),
            pltpu.VMEM((27 * C, RH * W), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wt)
    return y, sums.sum(axis=(0, 1, 2)), sqs.sum(axis=(0, 1, 2))


def reference_conv3x3_dhcw(xp, w):
    """XLA oracle with identical contract (same layout, same stats)."""
    # (D+2, H+2, C, W) → (1, D+2, H+2, W, C); VALID in D/H (pre-padded),
    # SAME-by-explicit-pad in W.
    x = jnp.transpose(xp, (0, 1, 3, 2))[None]
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    y = jnp.transpose(y, (0, 1, 3, 2)).astype(xp.dtype)  # (D, H, Cout, W)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 3)), jnp.sum(yf * yf, axis=(0, 1, 3))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_dhcw(xp: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """Differentiable fused conv+stats in (D, H, C, W) layout (see module
    docstring). Forward runs the Pallas kernel; backward runs the same
    kernel on the cotangent (dx) and XLA's correlation (dw)."""
    return _conv3x3_dhcw_impl(xp, w, interpret=interpret)


def _cv_fwd(xp, w, interpret):
    y, sums, sqs = _conv3x3_dhcw_impl(xp, w, interpret=interpret)
    return (y, sums, sqs), (xp, w, y)


def _cv_bwd(interpret, res, cots):
    xp, w, y = res
    gy, gs, gq = cots
    # Fold the stats cotangents into the output cotangent:
    # sums = Σy, sqs = Σy² ⇒ dL/dy += gs + 2·y·gq (per channel).
    # Compute in the KERNEL dtype (bf16 on the production path): the fold is
    # the input of two custom_call consumers, so XLA must materialize it —
    # an f32 fold costs a 2×-bytes tensor (537 MB at 128³ level-0) plus a
    # downcast pass on each consumer edge, none of it fusable across the
    # pallas boundary. bf16 grad precision matches what XLA's own conv
    # backward produces for a bf16 model.
    dt = y.dtype
    g = (
        gy.astype(dt)
        + gs.astype(dt)[None, None, :, None]
        + (2.0 * gq).astype(dt)[None, None, :, None] * y
    )
    # dx: conv of g with spatially flipped, in/out-swapped weights — the
    # same Pallas kernel. Pad g (its halo), discard dx at xp's pad rows
    # (the caller's jnp.pad transpose slices them off anyway).
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    gp = jnp.pad(g, ((1, 1), (1, 1), (0, 0), (0, 0)))
    dx_core, _, _ = _conv3x3_dhcw_impl(gp, w_flip, interpret=interpret)
    dxp = jnp.pad(
        dx_core.astype(xp.dtype), ((1, 1), (1, 1), (0, 0), (0, 0))
    )
    # dw via XLA: vjp of the linear reference — its primal forward is dead
    # code under jit and gets eliminated; what remains is the large-kernel
    # correlation XLA autodiff would emit anyway.
    _, vjp_fn = jax.vjp(lambda wv: reference_conv3x3_dhcw(xp, wv)[0], w)
    (dw,) = vjp_fn(g)
    return dxp, dw.astype(w.dtype)


conv3x3_dhcw.defvjp(_cv_fwd, _cv_bwd)


# ---------------------------------------------------------------------------
# v2: (D, C, H, W) layout — zero-copy tap GEMMs
#
# The v1 kernel above spends its VPU on 27·RH (C, W) im2col copies per
# h-block plus a (Cout, RH, W)→(RH, Cout, W) transpose per output tile
# (measured 17 TF/s vs the Cout=32 structural bound ~26). v2 removes both:
# with channels ABOVE the H·W plane, every tap's GEMM operand is a direct
# VMEM view —
#
#   slab (TD+2, C, (TH+2)·W):  x_tap = slab[kd+d, :, (h0+kh)·W : +RH·W]
#                                      → (C, RH·W), no copy
#    3 kd-taps merge along K:   slab[d:d+3, :, colslice] → (3C, RH·W)
#                                      (leading-dim merge, no data movement)
#
# so each h-block is NINE accumulating (Cout, 3C)×(3C, RH·W) dots (kh × kw)
# and the result (Cout, RH·W) stores straight into the (D, Cout, H·W) output
# — no transpose. The W-shift slabs (kw taps) are built once per slab by the
# same roll+mask trick; in the flattened (TH+2)·W lane dim the roll wraps
# across H rows, but the wrapped lane is exactly the one the SAME-padding
# mask zeroes. Lane alignment of the column slices needs (RH·W) % 128 == 0
# and W-offsets aligned: W % 128 keeps every slice vreg-aligned (W=64 is the
# next frontier: 64-offset slices).
# ---------------------------------------------------------------------------


def _conv_stats_kernel_v2(
    xp, wt_ref, o_ref, sum_ref, sq_ref, slab, slabR, slabL, sem,
    *, TD, TH, RH, W, C,
):
    d_tile = pl.program_id(0)
    h_tile = pl.program_id(1)

    cp = pltpu.make_async_copy(
        xp.at[pl.ds(d_tile * TD, TD + 2), :, pl.ds(h_tile * TH * W, (TH + 2) * W)],
        slab,
        sem,
    )
    cp.start()
    cp.wait()

    # W-shifted tap slabs: roll along the flattened (TH+2)·W lane dim + zero
    # the per-W-row wrapped column (== SAME zero padding in W). 32-bit roll
    # (Mosaic lane rotate), exact bf16 round-trip.
    n_rows = (TD + 2) * C
    HW = (TH + 2) * W
    x2 = slab[:].reshape(n_rows, HW).astype(jnp.float32)
    wmod = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (n_rows, HW), 1), W)
    xr = jnp.where(wmod == 0, 0.0, pltpu.roll(x2, 1, axis=1))
    xl = jnp.where(wmod == W - 1, 0.0, pltpu.roll(x2, HW - 1, axis=1))
    slabR[:] = xr.reshape(slab.shape).astype(slab.dtype)  # [., w] = x[., w-1]
    slabL[:] = xl.reshape(slab.shape).astype(slab.dtype)  # [., w] = x[., w+1]

    Cout = o_ref.shape[1]
    n_h_blocks = TH // RH
    slabs = (slabR, slab, slabL)  # kw = 0, 1, 2 → x[w + kw - 1]

    sums = jnp.zeros((1, Cout), jnp.float32)
    sqs = jnp.zeros((1, Cout), jnp.float32)
    # Static unroll over (depth, h-block): every column slice below then has
    # a STATIC lane offset (multiples of W), which Mosaic maps to aligned
    # vreg windows — a traced offset would force a lane-relayout per slice.
    for d in range(TD):
        for hb in range(n_h_blocks):
            h0 = hb * RH
            acc = jnp.zeros((Cout, RH * W), jnp.float32)
            for kh in range(3):
                for kw in range(3):
                    # (3, C, RH·W) view → (3C, RH·W): kd folds into K.
                    xv = slabs[kw][
                        pl.ds(d, 3), :, pl.ds((h0 + kh) * W, RH * W)
                    ].reshape(3 * C, RH * W)
                    acc = acc + jnp.dot(
                        wt_ref[kh, kw], xv, preferred_element_type=jnp.float32
                    )
            yb = acc.astype(o_ref.dtype)
            o_ref[d, :, pl.ds(h0 * W, RH * W)] = yb
            # IN stats from the rounded output (matches the XLA fallback).
            yf = yb.astype(jnp.float32)
            sums = sums + jnp.sum(yf, axis=1)[None]
            sqs = sqs + jnp.sum(yf * yf, axis=1)[None]
    sum_ref[0, 0, 0] = sums[0]
    sq_ref[0, 0, 0] = sqs[0]


def _pick_tiles_v2(D: int, H: int, C: int, W: int, itemsize: int) -> tuple[int, int, int]:
    """(TD, TH, RH) for v2: no col buffer, so the slab budget is the whole
    story; RH bounds the f32 accumulator (Cout·RH·W) Mosaic keeps live."""
    for TD, TH in ((4, 16), (2, 16), (2, 8), (2, 4), (1, 2), (1, 1)):
        if D % TD or H % TH:
            continue
        slab_b = 3 * (TD + 2) * C * (TH + 2) * W * itemsize
        if slab_b > 10 * 1024 * 1024:
            continue
        for RH in (min(8, TH), 4, 2, 1):
            if RH > TH or TH % RH:
                continue
            if (RH * W) % 128:
                continue
            return TD, TH, RH
    raise ValueError(f"no v2 tile config for D={D} H={H} C={C} W={W}")


@partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_dchw_impl(xp: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """xp: (D+2, C, H+2, W) — D/H zero-padded by 1, W unpadded (SAME padding
    in W from the in-kernel roll masks). w: (3, 3, 3, C, Cout).

    Returns (y (D, Cout, H, W) in xp.dtype, sums (Cout,) f32, sqs (Cout,) f32).

    Constraints: C/Cout multiples of 16, (RH·W) % 128 == 0 with W-aligned
    column slices (W % 128 for now), (D, H) divisible by a tile config.
    """
    Dp, C, Hp, W = xp.shape
    D, H = Dp - 2, Hp - 2
    Cout = w.shape[-1]
    # W%64: column slices land on 64-lane offsets — Mosaic expresses these
    # as half-vreg windows (level-1 geometry W=64; measured viable, see
    # KERNEL_BENCH.json). W=32 measured NOT viable (Mosaic compile failure
    # on 32-offset slices / 576-lane slabs); deep levels use the v3
    # channels-on-lanes kernel instead. (RH·W)%128 via _pick_tiles_v2.
    if C % 16 or Cout % 16 or W % 64:
        raise ValueError(f"need C%16==0, Cout%16==0, W%64==0; got C={C} Cout={Cout} W={W}")
    TD, TH, RH = _pick_tiles_v2(D, H, C, W, xp.dtype.itemsize)

    # (kh, kw, Cout, 3C) with the K dim kd-major/c-minor — matches the
    # (3, C, RH·W)→(3C, RH·W) view merge in the kernel.
    wt = w.transpose(1, 2, 4, 0, 3).reshape(3, 3, Cout, 3 * C).astype(xp.dtype)
    xflat = xp.reshape(Dp, C, Hp * W)
    kernel = partial(_conv_stats_kernel_v2, TD=TD, TH=TH, RH=RH, W=W, C=C)
    nD, nH = D // TD, H // TH
    y, sums, sqs = pl.pallas_call(
        kernel,
        grid=(nD, nH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (TD, Cout, TH * W), lambda d, h: (d, 0, h), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1, Cout), lambda d, h: (d, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1, Cout), lambda d, h: (d, h, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, Cout, H * W), xp.dtype),
            jax.ShapeDtypeStruct((nD, nH, 1, Cout), jnp.float32),
            jax.ShapeDtypeStruct((nD, nH, 1, Cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TD + 2, C, (TH + 2) * W), xp.dtype),
            pltpu.VMEM((TD + 2, C, (TH + 2) * W), xp.dtype),
            pltpu.VMEM((TD + 2, C, (TH + 2) * W), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xflat, wt)
    return (
        y.reshape(D, Cout, H, W),
        sums.sum(axis=(0, 1, 2)),
        sqs.sum(axis=(0, 1, 2)),
    )


def _dw_kernel_v2(
    xp, g_ref, dw_ref, slab2, sem2,
    *, TD, TH, RH, W, C, n_h_tiles, n_steps,
):
    """conv-bwd-weights in the v2 layout: dw[kd,kh,kw,ci,co] =
    Σ_{d,h,w} xp[d+kd, ci, h+kh, w+kw-1] · g[d, co, h, w].

    Round-4 restructure (same findings as the v2m forward — the original
    three-shifted-slab serial-DMA version measured 5.87 ms at level 0,
    largely slab wait):

    - **Shift g, not x**: reindexing w' = w + kw - 1 turns the three
      W-shifted SLAB copies into two roll+masks of the small (Cout, RH·W)
      cotangent block per h-block — the slab is read unshifted, so ONE
      slab buffer suffices.
    - **N-packed taps**: the three shifted g variants stack along Cout into
      gcat (3·Cout, RH·W); one dot per (d, h-block, kh) contracts
      xv (3C, RH·W) × gcat over the lanes → (3C, 3·Cout), all three kw
      taps side by side — 3× fewer MXU passes, N fill 32→96 at level 0.
    - **Double-buffered slab DMA** (1-D grid), as in the v2m forward.
    """
    step = pl.program_id(0)
    slot = jax.lax.rem(step, 2)

    def issue(s, st):
        dt = st // n_h_tiles
        ht = st % n_h_tiles
        return pltpu.make_async_copy(
            xp.at[pl.ds(dt * TD, TD + 2), :, pl.ds(ht * TH * W, (TH + 2) * W)],
            slab2.at[s],
            sem2.at[s],
        )

    @pl.when(step == 0)
    def _first():
        issue(0, 0).start()

    @pl.when(step + 1 < n_steps)
    def _prefetch():
        issue(1 - slot, step + 1).start()

    pltpu.make_async_copy(
        xp.at[pl.ds(0, TD + 2), :, pl.ds(0, (TH + 2) * W)],
        slab2.at[slot],
        sem2.at[slot],
    ).wait()
    slab = slab2.at[slot]

    @pl.when(step == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    Cout = g_ref.shape[1]
    RHW = RH * W
    n_h_blocks = TH // RH
    wmod = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (Cout, RHW), 1), W)
    for d in range(TD):
        for hb in range(n_h_blocks):
            h0 = hb * RH
            gv = g_ref[d, :, pl.ds(h0 * W, RHW)].astype(jnp.float32)
            # dw[·,·,kw] pairs x[w'] with g[w' - (kw-1)]: kw=0 needs
            # g[w'+1] (roll left, zero where the source lane crosses the
            # W boundary), kw=2 needs g[w'-1] (roll right). Exact SAME
            # semantics — an out-of-range g index is a zero contribution.
            gl = jnp.where(wmod == W - 1, 0.0, pltpu.roll(gv, RHW - 1, axis=1))
            gr = jnp.where(wmod == 0, 0.0, pltpu.roll(gv, 1, axis=1))
            gcat = jnp.concatenate([gl, gv, gr], axis=0).astype(g_ref.dtype)
            for kh in range(3):
                xv = slab[
                    pl.ds(d, 3), :, pl.ds((h0 + kh) * W, RHW)
                ].reshape(3 * C, RHW)
                dw_ref[kh] += jax.lax.dot_general(
                    xv, gcat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )


@partial(jax.jit, static_argnames=("interpret",))
def conv3x3_dchw_dw(xp: jnp.ndarray, g: jnp.ndarray, interpret: bool = False):
    """Weight gradient for the v2/v2m convs: (3, 3, 3, C, Cout) f32 from
    xp (D+2, C, H+2, W) and the folded output cotangent g (D, Cout, H, W)."""
    Dp, C, Hp, W = xp.shape
    D, H = Dp - 2, Hp - 2
    Cout = g.shape[1]
    TD, TH, RH = _pick_tiles_v2(D, H, C, W, xp.dtype.itemsize)
    nD, nH = D // TD, H // TH
    n_steps = nD * nH
    kernel = partial(
        _dw_kernel_v2, TD=TD, TH=TH, RH=RH, W=W, C=C,
        n_h_tiles=nH, n_steps=n_steps,
    )
    dw = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (TD, Cout, TH * W),
                lambda s, _nH=nH: (s // _nH, 0, s % _nH),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, 3 * C, 3 * Cout), lambda s: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3 * C, 3 * Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, TD + 2, C, (TH + 2) * W), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp.reshape(Dp, C, Hp * W), g.reshape(D, Cout, H * W))
    # (kh, kd·C + c, kw·Cout + co) → (kd, kh, kw, c, co): the K rows are
    # kd-major/c-minor (slab depth leading), the N columns kw-major.
    return dw.reshape(3, 3, C, 3, Cout).transpose(1, 0, 3, 2, 4)


def reference_conv3x3_dchw(xp, w):
    """XLA oracle with the v2 contract (same layout, same stats)."""
    # (D+2, C, H+2, W) → (1, D+2, H+2, W, C); VALID in D/H, SAME-by-pad in W.
    x = jnp.transpose(xp, (0, 2, 3, 1))[None]
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    y = jnp.transpose(y, (0, 3, 1, 2)).astype(xp.dtype)  # (D, Cout, H, W)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 2, 3)), jnp.sum(yf * yf, axis=(0, 2, 3))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_dchw(xp: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """Differentiable v2 fused conv+stats in (D, C, H, W) layout; forward is
    the zero-copy Pallas kernel, dx re-runs it on the cotangent with
    flipped/swapped weights, dw is the Pallas tap-contraction
    (conv3x3_dchw_dw — 5.6 vs 25.7 ms for XLA's correlation at level-0)."""
    return _conv3x3_dchw_impl(xp, w, interpret=interpret)


def _cv2_fwd(xp, w, interpret):
    y, sums, sqs = _conv3x3_dchw_impl(xp, w, interpret=interpret)
    return (y, sums, sqs), (xp, w, y)


def _cv2_bwd(interpret, res, cots):
    xp, w, y = res
    gy, gs, gq = cots
    dt = y.dtype  # fold in kernel dtype — see _cv_bwd rationale
    g = (
        gy.astype(dt)
        + gs.astype(dt)[None, :, None, None]
        + (2.0 * gq).astype(dt)[None, :, None, None] * y
    )
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    gp = jnp.pad(g, ((1, 1), (0, 0), (1, 1), (0, 0)))
    dx_core, _, _ = _conv3x3_dchw_impl(gp, w_flip, interpret=interpret)
    dxp = jnp.pad(
        dx_core.astype(xp.dtype), ((1, 1), (0, 0), (1, 1), (0, 0))
    )
    # dw via the Pallas tap-contraction kernel: 4.6 ms vs 25.7 ms for XLA's
    # correlation at level-0 (KERNEL_BENCH.json) — the delta that flips the
    # fused training step from losing to winning.
    dw = conv3x3_dchw_dw(xp, g, interpret=interpret)
    return dxp, dw.astype(w.dtype)


conv3x3_dchw.defvjp(_cv2_fwd, _cv2_bwd)


# ---------------------------------------------------------------------------
# v2m: M-packed tap GEMMs — kw taps stacked into the MXU's M dimension
#
# v2's GEMM is (Cout, 3C)×(3C, RH·W). At level-0 geometry (C=Cout=32) that
# occupies M·K = 32·96 of the MXU's 128·128 PEs — 18.75% — and is why the
# measured 27.7 TF/s sits at ~56% of a ~49 TF/s structural ceiling that is
# itself only 25% of peak (VERDICT r3 weak #6). The M dimension is packable
# because the three kw taps share ONE input view up to a ±1 lane shift:
#
#   A = [wt[kh,kw=0]; wt[kh,kw=1]; wt[kh,kw=2]]  (3·Cout, 3C)
#   p = A · x_unshifted                           (3·Cout, RH·W), ONE dot
#   acc += p[Cout:2Cout]                                     (kw=1, aligned)
#        + roll_right_1(p[:Cout])   masked at w==0           (kw=0 tap)
#        + roll_left_1(p[2Cout:])   masked at w==W-1         (kw=2 tap)
#
# The roll+mask on the (Cout, RH·W) f32 RESULT replaces v2's two W-shifted
# slab copies entirely (the wrapped lane crosses an H row, but SAME padding
# zeroes exactly that lane — same trick, applied post-GEMM). Occupancy at
# level 0 triples to 96·96/128² = 56%; at level 1 (C=Cout=64) it goes
# 37.5% → 56%.
#
# MEASURED PATH TO THE DEFAULT (v5e, 2026-08-20): the M-packing ALONE was
# a tie — the kernel is memory-path-bound, not MXU-bound (a no-dot variant
# measures 2.69 of the 3.44 ms level-0 total; the packed GEMMs add only
# ~0.75 ms; full-model A/B at the chip-proven v2 tiles: 45.5 v2 vs 46.4
# v2m ms). The decisive second step is DOUBLE-BUFFERED slab DMA, which
# v2m's single slab makes VMEM-affordable (v2 would need six buffers):
# the level-0 kernel drops 3.6 -> 1.80 ms (64.5 TF/s, token-carry
# protocol) at the SAME safe (4, 16) tile — the serial slab wait, not
# compute, dominated. Full-model A/B with both changes: fwd 128³ 42.4
# (v2m) vs 45.6 (v2) ms, ROI-shape 151.6 vs 166.1, train step 174.8 vs
# 180.9 -> fused_kernel defaults to "v2m". Larger (8, 16)/(8, 32) tiles
# measured <=6% faster still, but Mosaic's scoped-vmem accounting rejects
# them OPAQUELY at other block geometries (C=Cout=64: 2 MB over the 16 MB
# limit; a static budget model could not predict which) — not chased.
# ---------------------------------------------------------------------------


def _conv_stats_kernel_v2m(
    xp, wt_ref, o_ref, sum_ref, sq_ref, slab2, sacc, qacc, sem2,
    *, TD, TH, RH, W, C, n_h_tiles, n_steps,
):
    # 1-D grid + DOUBLE-BUFFERED slab DMA (guide pattern): step s computes
    # from the slab prefetched at step s-1 while issuing step s+1's copy
    # into the other slot. Chip-measured decisive at level 0: the serial
    # DMA-wait variant runs 3.6 ms, this one 1.80 ms (64.5 TF/s) at the
    # same (4, 16) tile — the slab wait, not the MXU, was the kernel's
    # dominant cost. v2m's single slab is what makes the second buffer
    # VMEM-affordable (v2 would need six).
    step = pl.program_id(0)
    slot = jax.lax.rem(step, 2)

    def issue(s, st):
        dt = st // n_h_tiles
        ht = st % n_h_tiles
        return pltpu.make_async_copy(
            xp.at[pl.ds(dt * TD, TD + 2), :, pl.ds(ht * TH * W, (TH + 2) * W)],
            slab2.at[s],
            sem2.at[s],
        )

    @pl.when(step == 0)
    def _first():
        issue(0, 0).start()

    @pl.when(step + 1 < n_steps)
    def _prefetch():
        issue(1 - slot, step + 1).start()

    # Wait for THIS step's slab (issued by the previous step, or just above
    # for step 0). The wait decrements the slot's semaphore; the source
    # window of the descriptor only sizes the transfer.
    pltpu.make_async_copy(
        xp.at[pl.ds(0, TD + 2), :, pl.ds(0, (TH + 2) * W)],
        slab2.at[slot],
        sem2.at[slot],
    ).wait()
    slab = slab2.at[slot]

    Cout = o_ref.shape[1]
    n_h_blocks = TH // RH
    RHW = RH * W
    # Lane → w-position map for the SAME-padding masks on the rolled
    # kw-tap results (the roll wraps across H rows in the flattened RH·W
    # lane dim; the wrapped lane is exactly the one padding zeroes).
    wmod = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (Cout, RHW), 1), W)

    # IN-stats partials stay VECTOR-shaped until the very end: a cross-lane
    # reduction per h-block costs more VPU time than the whole shift+mask
    # apply; accumulating (Cout, RH·W) partials in scratch makes the
    # per-block stats cost one add + one fma, with ONE reduction per
    # program invocation.
    sacc[:] = jnp.zeros((Cout, RHW), jnp.float32)
    qacc[:] = jnp.zeros((Cout, RHW), jnp.float32)

    # Static unroll (see v2): static lane offsets → aligned vreg windows.
    for d in range(TD):
        for hb in range(n_h_blocks):
            h0 = hb * RH
            # Accumulate the packed GEMM over kh FIRST: the kw shift+mask
            # is linear and identical for every kh, so it hoists out of the
            # loop — one roll pair per h-block instead of three.
            p = None
            for kh in range(3):
                xv = slab[
                    pl.ds(d, 3), :, pl.ds((h0 + kh) * W, RHW)
                ].reshape(3 * C, RHW)
                dot = jnp.dot(
                    wt_ref[kh], xv, preferred_element_type=jnp.float32
                )  # (3·Cout, RH·W): kw-major row blocks
                p = dot if p is None else p + dot
            # contribution[w] = p_kw[w + kw - 1]: shift kw=0 right, kw=2
            # left; zero the pad lane (exact SAME semantics).
            p0 = jnp.where(wmod == 0, 0.0,
                           pltpu.roll(p[:Cout], 1, axis=1))
            p2 = jnp.where(wmod == W - 1, 0.0,
                           pltpu.roll(p[2 * Cout:], RHW - 1, axis=1))
            acc = p[Cout:2 * Cout] + p0 + p2
            yb = acc.astype(o_ref.dtype)
            o_ref[d, :, pl.ds(h0 * W, RHW)] = yb
            # IN stats from the rounded output (matches the XLA fallback).
            yf = yb.astype(jnp.float32)
            sacc[:] += yf
            qacc[:] += yf * yf
    sum_ref[0, 0] = jnp.sum(sacc[:], axis=1)
    sq_ref[0, 0] = jnp.sum(qacc[:], axis=1)


# Chip-proven per-geometry v2m tile overrides, keyed
# (D, H, C, Cout, W, itemsize) → (TD, TH, RH). Populated by
# scripts/tile_probe.py, which EMPIRICALLY compile-probes the larger
# (8, 16)/(8, 32) tiles per geometry instead of modeling Mosaic's opaque
# scoped-vmem accounting (VERDICT r4 item 8), and measures the kernel delta
# before admitting an entry. NOTE: consulted at trace time — jit caches are
# keyed on shapes only, so overrides must be installed before the first
# trace of a geometry (the probe script clears the impl cache between
# candidates).
TILE_OVERRIDES: dict[tuple, tuple[int, int, int]] = {}


def _pick_tiles_v2m(D: int, H: int, C: int, W: int, itemsize: int,
                    cout: int | None = None):
    """(TD, TH, RH) for v2m: the chip-proven v2 tile configs, plus any
    probe-validated per-geometry override (TILE_OVERRIDES above). v2m's
    VMEM at a given tile is strictly SMALLER than v2's (one slab instead of
    three, plus a small f32 stats scratch), so every config v2 compiles,
    v2m does too. History: larger (8, 16)/(8, 32) tiles were chip-tried for
    the lower halo re-read factor and measured ≤6%% faster at level 0 — but
    Mosaic's scoped-vmem accounting rejected them OPAQUELY at other block
    geometries (C=Cout=64 blew the 16 MB limit by 2 MB; C_in=32→Cout=64
    failed at a third size), and a static budget model could not predict
    which — hence the empirical probe."""
    ov = TILE_OVERRIDES.get((D, H, C, cout, W, itemsize))
    if ov is not None:
        return ov
    return _pick_tiles_v2(D, H, C, W, itemsize)


@partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_dchw_m_impl(xp: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """v2m forward: contract identical to ``_conv3x3_dchw_impl`` (same
    layout, same outputs, same constraints), different MXU packing."""
    Dp, C, Hp, W = xp.shape
    D, H = Dp - 2, Hp - 2
    Cout = w.shape[-1]
    if C % 16 or Cout % 16 or W % 64:
        raise ValueError(
            f"need C%16==0, Cout%16==0, W%64==0; got C={C} Cout={Cout} W={W}"
        )
    TD, TH, RH = _pick_tiles_v2m(D, H, C, W, xp.dtype.itemsize, cout=Cout)

    # (kh, kw·Cout, kd·C + c): kw-major M blocks, kd-major/c-minor K — the
    # single transpose+reshape matches the kernel's row-block slicing.
    wt = w.transpose(1, 2, 4, 0, 3).reshape(3, 3 * Cout, 3 * C).astype(xp.dtype)
    xflat = xp.reshape(Dp, C, Hp * W)
    nD, nH = D // TD, H // TH
    n_steps = nD * nH
    kernel = partial(
        _conv_stats_kernel_v2m, TD=TD, TH=TH, RH=RH, W=W, C=C,
        n_h_tiles=nH, n_steps=n_steps,
    )
    y, sums, sqs = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (TD, Cout, TH * W),
                lambda s, _nH=nH: (s // _nH, 0, s % _nH),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Cout), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, Cout), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, Cout, H * W), xp.dtype),
            jax.ShapeDtypeStruct((n_steps, 1, Cout), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, 1, Cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, TD + 2, C, (TH + 2) * W), xp.dtype),
            pltpu.VMEM((Cout, RH * W), jnp.float32),
            pltpu.VMEM((Cout, RH * W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xflat, wt)
    return (
        y.reshape(D, Cout, H, W),
        sums.sum(axis=(0, 1)),
        sqs.sum(axis=(0, 1)),
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_dchw_m(xp: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """Differentiable v2m fused conv+stats; same contract as
    ``conv3x3_dchw``, M-packed forward/dx, Pallas tap-contraction dw."""
    return _conv3x3_dchw_m_impl(xp, w, interpret=interpret)


def _cv2m_fwd(xp, w, interpret):
    y, sums, sqs = _conv3x3_dchw_m_impl(xp, w, interpret=interpret)
    return (y, sums, sqs), (xp, w, y)


def _cv2m_bwd(interpret, res, cots):
    xp, w, y = res
    gy, gs, gq = cots
    dt = y.dtype  # fold in kernel dtype — see _cv_bwd rationale
    g = (
        gy.astype(dt)
        + gs.astype(dt)[None, :, None, None]
        + (2.0 * gq).astype(dt)[None, :, None, None] * y
    )
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    gp = jnp.pad(g, ((1, 1), (0, 0), (1, 1), (0, 0)))
    dx_core, _, _ = _conv3x3_dchw_m_impl(gp, w_flip, interpret=interpret)
    dxp = jnp.pad(
        dx_core.astype(xp.dtype), ((1, 1), (0, 0), (1, 1), (0, 0))
    )
    dw = conv3x3_dchw_dw(xp, g, interpret=interpret)
    return dxp, dw.astype(w.dtype)


conv3x3_dchw_m.defvjp(_cv2m_fwd, _cv2m_bwd)


def conv_in_stats_dchw_batch(
    x: jnp.ndarray, kernel: jnp.ndarray, interpret=None, version: str = "v2"
):
    """Batched v2/v2m fused conv+stats for the model (models/unet3d.py).

    x: (B, D, C, H, W) in compute dtype; kernel: (3, 3, 3, Cin, Cout).
    Channels zero-padded to multiples of 16 (exact). Returns
    (y (B, D, Cout, H, W), mean (B, Cout) f32, sqmean (B, Cout) f32).
    ``version``: "v2" = shifted-slab tap GEMMs, "v2m" = M-packed (same
    contract, see the v2m section header).
    """
    if interpret is None:
        interpret = FORCE_INTERPRET and jax.default_backend() != "tpu"
    conv = conv3x3_dchw_m if version == "v2m" else conv3x3_dchw
    B, D, C, H, W = x.shape
    Cout = kernel.shape[-1]
    Cp, Coutp = _ceil16(C), _ceil16(Cout)
    k = kernel.astype(x.dtype)
    if Cp != C or Coutp != Cout:
        k = jnp.pad(k, [(0, 0)] * 3 + [(0, Cp - C), (0, Coutp - Cout)])
    if Cp != C:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, Cp - C), (0, 0), (0, 0)])
    n = float(D * H * W)
    ys, means, sqms = [], [], []
    for b in range(B):
        xp = jnp.pad(x[b], ((1, 1), (0, 0), (1, 1), (0, 0)))
        y, s, q = conv(xp, k, interpret)
        ys.append(y[:, :Cout])
        means.append(s[:Cout] / n)
        sqms.append(q[:Cout] / n)
    return jnp.stack(ys), jnp.stack(means), jnp.stack(sqms)


def fused_block_applicable(
    ndhwc_shape: tuple[int, ...],
    features: int | None = None,
    version: str = "v2",
) -> bool:
    """Can the fused path run for this NDHWC activation?

    Channels are padded to 16 internally; beyond the lane-dim gate (v2:
    W%64 — 64-offset column slices are half-vreg windows; v1: W%128) the
    kernel's VMEM tiling must be feasible for BOTH convs of the block — the
    first sees C=shape[-1], the second C=``features`` — so a level-0 decoder
    at e.g. (160, 192, C=64, W=512) correctly falls back to XLA instead of
    raising at trace time. Backend-gated so flag-enabled configs still run
    (via the XLA path) on CPU test envs; FORCE_INTERPRET lets tests exercise
    the fused path in interpret mode.
    """
    if len(ndhwc_shape) != 5:
        return False
    _, D, H, W, C = ndhwc_shape
    if W % (128 if version == "v1" else 64) or D % 2 or H % 8:
        return False
    if not (jax.default_backend() == "tpu" or FORCE_INTERPRET):
        return False
    tiles = {"v2": _pick_tiles_v2, "v2m": _pick_tiles_v2m}.get(version, _pick_tiles)
    for c in {C, features if features is not None else C}:
        try:
            tiles(D, H, _ceil16(int(c)), W, 2)  # bf16 itemsize
        except ValueError:
            return False
    return True


def _ceil16(n: int) -> int:
    return -(-n // 16) * 16


def conv_in_stats_dhcw_batch(x: jnp.ndarray, kernel: jnp.ndarray, interpret=None):
    """Batched fused conv+stats for the model (models/unet3d.py).

    x: (B, D, H, C, W) in compute dtype; kernel: (3, 3, 3, Cin, Cout) any
    float dtype (cast to x.dtype). Channels are zero-padded to multiples of
    16 (exact — zero weight rows/cols contribute nothing); the batch is a
    static Python loop (B is 1-2 on this pipeline; Pallas-under-vmap is not
    relied upon).

    Returns (y (B, D, H, Cout, W), mean (B, Cout) f32, sqmean (B, Cout) f32).
    """
    if interpret is None:
        interpret = FORCE_INTERPRET and jax.default_backend() != "tpu"
    B, D, H, C, W = x.shape
    Cout = kernel.shape[-1]
    Cp, Coutp = _ceil16(C), _ceil16(Cout)
    k = kernel.astype(x.dtype)
    if Cp != C or Coutp != Cout:
        k = jnp.pad(k, [(0, 0)] * 3 + [(0, Cp - C), (0, Coutp - Cout)])
    if Cp != C:
        x = jnp.pad(x, [(0, 0)] * 3 + [(0, Cp - C), (0, 0)])
    n = float(D * H * W)
    ys, means, sqms = [], [], []
    for b in range(B):
        xp = jnp.pad(x[b], ((1, 1), (1, 1), (0, 0), (0, 0)))
        y, s, q = conv3x3_dhcw(xp, k, interpret)
        ys.append(y[:, :, :Cout])
        means.append(s[:Cout] / n)
        sqms.append(q[:Cout] / n)
    return jnp.stack(ys), jnp.stack(means), jnp.stack(sqms)
