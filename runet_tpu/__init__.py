"""runet_tpu — TPU-native 3D renal anatomy extraction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
repo ``icrdr/3D-UNet-Renal-Anatomy-Extraction`` (coarse-to-fine cascaded
3D U-Net segmentation of kidney / tumor / artery / vein from CT), designed
TPU-first:

- NIfTI ingestion + preprocessing as a jit-compiled JAX graph
- Flax 3D U-Net (Conv3D + InstanceNorm + LeakyReLU) in NDHWC layout
- Sliding-window Gaussian-blend inference fused on device (no per-tile
  host round-trips)
- Dice+CE training with data-parallel sharding over a TPU mesh
- Pallas kernels for the hot fused ops, each with an XLA fallback

Behavioral contract: /root/repo/BASELINE.json (the reference mount was
empty at build time; see SURVEY.md §0 for provenance).
"""

__version__ = "0.1.0"
