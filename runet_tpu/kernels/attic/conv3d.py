"""Pallas 3×3×3 conv kernel for low-channel/high-resolution U-Net levels
(SURVEY.md §7 step 9; BASELINE north_star "fused Pallas kernels").

Why: XLA's conv lowering on v5e runs the 32-channel level-0 convs at
~13 TFLOP/s (measured, RTT-amortized): the implicit GEMM keeps K = C_in =
32, so the MXU's 128-wide K dimension idles. This kernel materializes an
im2col tile in VMEM and contracts with K = 27·C_in fully packed.

Layout strategy (Mosaic tiling constraints drive everything — lanes are
128-wide and lane/sublane slices must be tile-aligned or full):
- Channels-on-SUBLANES, W-on-LANES: the caller transposes the padded
  volume to (D+2, H+2, C, W). C=32 is sublane-aligned (8 | 32) and W=128
  fills the lanes, so every in-kernel slice is legal and no in-kernel
  transposes are needed.
- W-axis taps would be lane-unaligned lane slices; instead the caller
  passes THREE W-shifted copies (one per kw) — in-kernel W reads are full.
- im2col tile col: (27·C, W) built by 27 sublane-aligned writes of (C, W)
  tap tiles; one MXU GEMM per output row: (Cout, 27C) @ (27C, W).
- Input stays in HBM; each program DMAs its (TD+2, TH+2, C, W) slabs once
  and reuses them across all taps (27× VMEM-bandwidth reuse).

f32 accumulation via preferred_element_type; bf16 in/out. XLA is the
always-correct fallback; parity-tested in interpret mode (CPU) and compiled
on TPU (SURVEY.md §4.2).

Measured status (v5e, RTT-amortized chained timing): isolated conv
6.9 ms vs XLA 9.3 ms at 32ch/128³ (1.37x). Inside the full U-Net the
caller-side layout transposes (NDHWC -> C,W-minor and back, plus 3 shifted
copies) cost more than the kernel saves (79.6 vs 61.8 ms/forward), so
``ModelConfig.use_pallas_conv`` defaults to False. The known fix — keeping
the whole level-0 block in (D, H, C, W) layout with IN+LeakyReLU computed
in that layout so the transpose amortizes across 4 convs — is future work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(
    x0, x1, x2, wt_ref, o_ref, s0, s1, s2, col, sem0, sem1, sem2,
    *, TD, TH, W, C,
):
    d_tile = pl.program_id(0)
    h_tile = pl.program_id(1)

    slabs = (s0, s1, s2)
    copies = []
    for src, dst, sem in ((x0, s0, sem0), (x1, s1, sem1), (x2, s2, sem2)):
        cp = pltpu.make_async_copy(
            src.at[pl.ds(d_tile * TD, TD + 2), pl.ds(h_tile * TH, TH + 2)],
            dst,
            sem,
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()

    Cout = o_ref.shape[2]
    RH = col.shape[1] // W
    n_h_blocks = TH // RH

    for d in range(TD):  # static unroll over slab depth

        def h_body(hb, _):
            h0 = hb * RH
            # im2col tile (27*C, RH*W): one (C, W) write per (tap, row).
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
            )  # (Cout, RH*W)
            o_ref[d, pl.ds(h0, RH)] = (
                acc.reshape(Cout, RH, W).transpose(1, 0, 2).astype(o_ref.dtype)
            )
            return 0

        jax.lax.fori_loop(0, n_h_blocks, h_body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def conv3x3x3_same(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x: (D, H, W, Cin); w: (3, 3, 3, Cin, Cout). Returns (D, H, W, Cout)
    in x.dtype; stride 1, SAME zero padding.

    Constraints: D % 2 == 0, H % 8 == 0, W % 128 == 0, Cin % 8 == 0.
    """
    D, H, W, Cin = x.shape
    Cout = w.shape[-1]
    TD, TH = 2, 8
    if D % TD or H % TH or W % 128 or Cin % 8:
        raise ValueError(
            f"need D%{TD}==0, H%{TH}==0, W%128==0, Cin%8==0; got {(D, H, W, Cin)}"
        )

    xp = jnp.pad(x, [(1, 1), (1, 1), (1, 1), (0, 0)])
    # (D+2, H+2, W+2, C) -> (D+2, H+2, C, W+2), then three W-shifted copies.
    xt = jnp.transpose(xp, (0, 1, 3, 2))
    shifted = [xt[:, :, :, k : k + W] for k in range(3)]

    # Weights transposed for the (Cout, 27C) @ (27C, W) GEMM.
    wt = w.reshape(27 * Cin, Cout).T.astype(x.dtype)

    kernel = partial(_conv_kernel, TD=TD, TH=TH, W=W, C=Cin)
    slab = lambda: pltpu.VMEM((TD + 2, TH + 2, Cin, W), x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(D // TD, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TD, TH, Cout, W), lambda d, h: (d, h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((D, H, Cout, W), x.dtype),
        scratch_shapes=[
            slab(),
            slab(),
            slab(),
            pltpu.VMEM((27 * Cin, 8 * W), x.dtype),  # RH=8 rows per GEMM
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(shifted[0], shifted[1], shifted[2], wt)
    # (D, H, Cout, W) -> NDHWC.
    return jnp.transpose(out, (0, 1, 3, 2))


@jax.custom_vjp
def pallas_conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Differentiable single-volume conv: (D, H, W, Cin) × (3,3,3,Cin,Cout).

    Forward and input-gradient run the Pallas kernel (dx is a conv of the
    cotangent with spatially flipped, in/out-swapped weights); the weight
    gradient reuses XLA's conv-transpose lowering (K there is the huge
    spatial dim — XLA is already efficient for that shape).
    """
    return conv3x3x3_same(x, w)


def _pc_fwd(x, w):
    return conv3x3x3_same(x, w), (x, w)


def _pc_bwd(res, g):
    x, w = res
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = conv3x3x3_same(g, w_flip.astype(g.dtype)).astype(x.dtype)
    _, vjp_fn = jax.vjp(lambda wv: reference_conv3x3x3(x, wv), w)
    (dw,) = vjp_fn(g.astype(jnp.float32))
    return dx, dw.astype(w.dtype)


pallas_conv3x3.defvjp(_pc_fwd, _pc_bwd)


def pallas_conv_applicable(shape: tuple[int, ...], cin: int) -> bool:
    """Can conv3x3x3_same handle a (B, D, H, W, C) activation here?

    Shape constraints from the kernel, plus a TPU-backend check so
    flag-enabled configs still run (via the XLA path) on CPU test envs.
    """
    return pallas_conv_shape_ok(shape, cin) and jax.default_backend() == "tpu"


def pallas_conv_shape_ok(shape: tuple[int, ...], cin: int) -> bool:
    if len(shape) != 5:
        return False
    _, D, H, W, C = shape
    return D % 2 == 0 and H % 8 == 0 and W % 128 == 0 and C % 8 == 0 and cin % 8 == 0


def reference_conv3x3x3(x, w):
    """lax.conv_general_dilated oracle (same layout) for parity tests."""
    return jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
