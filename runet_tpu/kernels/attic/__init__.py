"""Attic: superseded kernels kept for A/B history, NOT on any product path.

- ``conv3d.py`` — round-1 per-conv im2col Pallas conv. Beat XLA 1.37x in
  isolation but lost end-to-end to per-conv NDHWC↔(C,W-minor) layout
  transposes; superseded by the layout-persistent fused blocks
  (kernels/fused_block.py), which transpose once per block and fuse the
  InstanceNorm statistics into the conv kernel.
- ``fused_norm.py`` — standalone InstanceNorm+LeakyReLU kernel; the fused
  block computes the stats off the conv GEMM registers instead, so this was
  never on the product path.
- ``conv_v3_deep.py`` — round-3 channels-on-lanes conv for deep levels
  (W<64, C>=128; zero-copy tap views in natural NDHWC). Correct and close to
  XLA, but the honest device-loop protocol (utils/latency.py::scanned_ms)
  showed XLA is already efficient at those shapes (C>=128 fills the MXU
  contraction dim) — see its docstring for the measured decision.

Both remain import-clean and parity-tested (tests/test_pallas_conv.py,
tests/test_kernels.py) so the measurements they encode stay reproducible,
but no config flag routes the model through them.
"""
