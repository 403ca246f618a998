"""Frozen dataclass configuration system (SURVEY.md §5.6).

One config tree per run, serialized into every run dir / checkpoint. The five
presets mirror BASELINE.json ``configs`` 1–5 exactly; the reference kept these
as per-script hyperparameter dicts (SURVEY.md §2.1 "Coarse/Fine model config",
provenance [RECALL] — mount empty).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

# KiTS19-style HU window + z-score stats (SURVEY.md §2.1 "Intensity
# normalization", provenance [DOMAIN]). stats=None => per-volume z-score.
DEFAULT_HU_WINDOW = (-79.0, 304.0)
DEFAULT_HU_STATS = (100.93, 76.9)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    in_channels: int = 1
    num_classes: int = 3  # bg / kidney / tumor
    base_features: int = 32
    max_features: int = 320
    num_levels: int = 5  # encoder resolutions (incl. bottleneck)
    negative_slope: float = 1e-2
    norm_eps: float = 1e-5
    # "pixelshuffle": 1x1x1 conv to 8F channels + depth-to-space — same
    # linear family as ConvTranspose(k=2,s=2) but runs as a dense GEMM with
    # 8x the output channels (fills MXU lanes); "convtranspose": classic.
    upsample_mode: str = "pixelshuffle"
    # jax.checkpoint each resolution block: recompute activations in the
    # backward pass, trading FLOPs for HBM (larger patches/batches).
    remat: bool = False
    # Layout-persistent fused Pallas blocks (kernels/fused_block.py): run
    # stride-1 (Conv3D→IN→LeakyReLU) pairs in (D, H, C, W) layout with ONE
    # transpose per block, conv+IN-stats fused in one kernel. Applies where
    # shapes fit (level 0 at 128³ patches; more levels on larger volumes);
    # XLA everywhere else. BASELINE north_star "fused Pallas kernels".
    fused_blocks: bool = True
    # Which fused kernel generation: "v2m" (default) = (D, C, H, W)
    # M-packed tap GEMMs with double-buffered slab DMA — chip-measured
    # 2026-08-20 vs v2: level-0 kernel 1.80 vs 3.35 ms, full fwd 42.4 vs
    # 45.6 ms at 128³, ROI fwd 151.6 vs 166.1, train step 174.8 vs 180.9
    # (kernels/fused_block.py v2m section); "v2" = shifted-slab tap GEMMs;
    # "v1" = (D, H, C, W) im2col, kept for A/B.
    fused_kernel: str = "v2m"
    # Use fused blocks inside the *training* step too. Default ON since the
    # round-3 backward rework: the v2 custom_vjp runs dx as the same tap-GEMM
    # kernel on the cotangent and dw as a dedicated Pallas tap-contraction
    # (conv3x3_dchw_dw, 5.6 vs 25.7 ms for XLA's bwd-weights correlation at
    # level-0), and the 1×1×1 logits head is an explicit GEMM so the fused
    # blocks' layouts never leak into conv emitters. Measured on v5e at 128³
    # batch 1 (same process, /tmp/ab_train.py protocol): fused 255 vs XLA
    # 343 ms/step. Round-2 state for the record: the fused vjp LOST (491 vs
    # 300) when dw fell back to XLA's correlation and the head was nn.Conv.
    # Also: fused+remat compiles batch-2 at 128³ where plain XLA+remat
    # fails to compile.
    fused_blocks_train: bool = True
    # May CONTRACTING convs (Cin > Cout — the decoder post-concat 2F→F
    # convs) use the fused kernel? Chip-measured BOTH ways 2026-08-20 and
    # kept ON: the ISOLATED kernel rows favor XLA there (KERNEL_BENCH
    # budget: cat_l0 5.02 XLA vs 5.69 v2m, cat_l1 1.81 vs 2.42 — XLA's
    # im2col fills the MXU K dim with 27·Cin while v2m's M-packing shrinks
    # to 3·Cout rows), but the FULL-MODEL A/B inverts hard: routing the two
    # cat convs to XLA measured fwd 89.6 vs 37.6 ms at 128³ (333.9 vs 131.0
    # at the ROI bucket) — an XLA NDCHW conv sandwiched between fused
    # kernels pays whole-tensor layout copies the standalone row never
    # sees. Flag kept for re-measurement when the kernel class changes.
    fused_contracting: bool = True
    # Fused stride-2 downsample kernel (kernels/strided_conv.py: tap GEMMs
    # dense in W + MXU 0/1-selection lane decimation; chip-measured 2.88 vs
    # 4.60 ms XLA at 128³ 32→64, stats included). Full-model A/B
    # (2026-08-20, chained_ms n=12): fwd 32.98 vs 37.60 ms at 128³ (−12%),
    # 108.70 vs 129.87 ms at the 160×192×256 ROI bucket (−16% — it fires at
    # both W%128 downsample levels there). ALSO on in the train step: the
    # custom_vjp runs the backward via XLA, and the grad-program A/B
    # (TRAIN_PROFILE.json 2026-08-21) measured step_core 103.0 vs 107.8 ms.
    fused_downsample: bool = True
    # Deep supervision (nnU-Net-lineage [DOMAIN], opt-in): aux 1×1×1 logits
    # heads at decoder levels 1-2 train against 2×/4×-downsampled labels
    # with halving weights (train/losses.py deep_supervised_loss). The aux
    # heads exist in the param tree whenever this is on; inference calls
    # ignore them (dead-code-eliminated), so serving is unchanged.
    deep_supervision: bool = False
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Mesh axis name for spatial-partition inference (norm moments pmean'd
    # across it); None = single-device semantics.
    spatial_axis: str | None = None


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    spacing: tuple[float, float, float] = (1.0, 1.0, 1.0)
    hu_window: tuple[float, float] = DEFAULT_HU_WINDOW
    # (mean, std) applied after clipping; None => per-volume z-score.
    hu_stats: tuple[float, float] | None = DEFAULT_HU_STATS
    # Quantize host->device image uploads to uint8 over hu_window (the
    # device program dequantizes before resampling). Halves upload bytes vs
    # the f16 transfer dtype — and uploads are the serving path's largest
    # tunnel cost (ROI_PIECES.json: ~17 MB/case = 370-470 ms of the ~1.0 s
    # sequential budget at 36 MB/s). Information cost: values are CLIPPED
    # to hu_window by normalize anyway, so only the ~1.5 HU quantization
    # step remains — ~0.02 of the z-score std, far below augmentation
    # noise. OFF by default (oracle tests push label-valued images through
    # the pipeline and must stay exact); ON in the shipping CT presets.
    transfer_quant: bool = False
    # With transfer_quant: pack TWO 4-bit voxels per upload byte (16 levels
    # over hu_window, ~25 HU/step) — halves upload bytes again. Suitable
    # ONLY for the coarse localization stage, whose output is a foreground
    # box with margin slack (kidney/background contrast is hundreds of HU);
    # the fine stage keeps uint8 (~1.5 HU/step) for tumor-grade contrast.
    transfer_quant4: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    patch_size: tuple[int, int, int] = (128, 128, 128)
    batch_size: int = 2  # global batch (split across data-parallel devices)
    fg_prob: float = 0.5  # foreground-biased patch sampling probability
    steps: int = 25000
    lr: float = 3e-4
    weight_decay: float = 1e-5
    warmup_steps: int = 500
    lr_schedule: str = "poly"  # poly | cosine | const
    poly_power: float = 0.9
    optimizer: str = "adamw"  # adamw | sgd (Nesterov, nnU-Net lineage)
    sgd_momentum: float = 0.99
    grad_accum: int = 1
    # Micro-steps fused into ONE device dispatch (lax.scan in the jitted
    # step; train/state.py make_multi_train_step). Amortizes per-dispatch
    # host overhead through the tunnel. log_every/val_every/ckpt_every/
    # val_full_every must be multiples of it (train/loop.py validates);
    # 1 = classic one-dispatch-per-step. Measured on the v5e (2026-08-19,
    # BENCH_r03_insession run 4): scan-of-8 180.0 vs dispatched 179.0
    # ms/micro-step at 128^3 b1 — per-dispatch overhead is already hidden
    # behind the 179 ms of compute, so presets keep 1; the knob pays only
    # for much smaller steps (small patches / tiny models).
    steps_per_dispatch: int = 1
    seed: int = 0
    ckpt_every: int = 1000
    val_every: int = 1000
    # Full sliding-window validation over the val cases every N steps
    # (0 = disabled). When enabled, keep-best checkpoint selection is keyed
    # to this low-variance full-volume Dice instead of the noisy 8-patch
    # estimate (the patch val stays on val_every cadence for step-rate
    # logging). Use a multiple of val_every.
    val_full_every: int = 0
    keep_checkpoints: int = 3
    augment: bool = True
    # Elastic deformation (data/augment.py _rand_elastic): coarse-grid
    # displacement field upsampled by MXU matmuls + one trilinear warp.
    # Default OFF — the warp's gathers cost real step time and the
    # flip/rot90/zoom/intensity set is the verified [DOMAIN] baseline;
    # opt in per-experiment.
    elastic: bool = False
    # Tversky FP/FN weights for the overlap term of the compound loss
    # (train/losses.py). 0.5/0.5 IS soft Dice (identical expression);
    # beta > alpha up-weights false negatives — the recall knob for thin
    # structures (renal_anatomy artery/vein) [DOMAIN].
    tversky_alpha: float = 0.5
    tversky_beta: float = 0.5


@dataclasses.dataclass(frozen=True)
class InferConfig:
    patch_size: tuple[int, int, int] = (128, 128, 128)
    overlap: float = 0.5  # stride = patch * (1 - overlap)
    sigma_scale: float = 0.125  # gaussian importance sigma = size * scale
    # Windows evaluated per device step on the windowed fallback path.
    # MEASURED (v5e, 192x192x256 / 12 windows @128³): batch 1 = 963 ms,
    # batch 2 = 1671 ms, batch 4 = OOM — XLA picks a 4x-padded layout for
    # batched 3D convs at this geometry, so window batching is a REGRESSION,
    # not a win. Keep 1; large ROIs are handled by expand_windows instead.
    window_batch: int = 1
    # Grow fallback windows toward the single_pass_ratio voxel budget
    # ("super-windows"): a ROI beyond the single-pass budget is covered by a
    # few large overlapping single-pass-sized windows (2-4 dispatches)
    # instead of dozens of patch-sized ones — each dispatch costs ~38 ms
    # tunnel RTT plus a ~60 ms forward here, so dispatch count dominates.
    expand_windows: bool = True
    use_gaussian: bool = True
    # Whole-volume single forward when padded volume <= ratio * patch volume
    # (fully-convolutional fast path; 0 disables). Dominant effect on this
    # deployment: each jit call costs a fixed ~38 ms tunnel round-trip, so
    # one big forward beats a dozen windowed calls; 8x128³ of bf16 U-Net
    # activations is still only ~1 GB of HBM. Windows remain the fallback
    # for volumes beyond the ratio.
    single_pass_ratio: float = 8.0
    # Mirror-flip test-time augmentation (infer/tta.py): average softmax over
    # all 2^len(tta_axes) flip variants INSIDE the jitted program (one
    # dispatch, ~2^k × compute). nnU-Net-lineage quality knob; off by
    # default — it multiplies forward cost.
    tta: bool = False
    tta_axes: tuple[int, ...] = (0, 1, 2)


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    roi_margin_mm: float = 16.0  # margin around coarse kidney bbox
    # ROI dims rounded up to multiples of this (x/y axes): coarser buckets
    # mean fewer distinct jitted fine-stage shapes across a dataset (each
    # fresh compile is ~30-60 s) at padded-voxel overhead. 32 measured best:
    # vs 64 it cut ~17% of padded ROI voxels on KiTS-sized kidneys.
    roi_bucket: int = 32
    # Last (lane) axis bucket: 64 keeps W%64==0 so the fused Pallas blocks
    # stay applicable (the v2/v2m half-vreg lane gate) — a 32-bucketed z
    # (e.g. 240) would disable them and lose more to the slower per-voxel
    # path than the padding costs. Was 128 before the W%64 gate landed: a
    # real-data kidney with ~190 fine z voxels then padded to 256 instead
    # of 192 — 25% of the fine stage for nothing.
    # COUPLING: 64 assumes the v2/v2m W%64 fused gate. If the fine model
    # runs fused_kernel="v1" (kept for A/B only), the gate is W%128 — set
    # this to 128 there, else the bucket pays lane padding while the fused
    # path it buys stays disabled.
    roi_bucket_z: int = 64
    # Native-crop extent bucket: the ROI program's input shape is the crop
    # grown to cover the bucketed fine grid, which depends on the CASE's
    # native spacing (continuous on real data). Rounding it up to multiples
    # of this bounds the compile classes per fine bucket to a small finite
    # set instead of one per distinct spacing; the extra rows are real
    # anatomical context (or edge padding at the volume boundary).
    crop_bucket: int = 16
    # Fixed canonical coarse-grid shape: every case compiles the SAME coarse
    # program (512 mm abdominal FOV at 4 mm iso is <=128 voxels/axis).
    # 128 matters doubly: half the voxels of the old 160³/3.2 mm grid AND
    # W=128 fills the lane dim so the fused Pallas blocks fire (W%128==0,
    # kernels/fused_block.py) — measured coarse stage 0.30 s → ~0.12 s.
    # Falls back to 16-bucketed true shape if a case exceeds it.
    coarse_canonical: tuple[int, int, int] = (128, 128, 128)
    max_components: int = 2  # keep <=2 largest kidney CCs
    # Same-bucket single-pass ROIs dispatched as ONE B-batched program
    # when > 1. History: B=2 measured 26% cheaper per ROI in round 3
    # (ROI_OVERLAP.json) and shipped as the default; after the round-4
    # kernel/layout work the batched program INVERTED into a regression —
    # ROI_PIECES.json 2026-08-20: fwd_argmax B=2 359.6 ms vs 2×128.1 for
    # two B=1 passes at the identical (192,160,256) bucket, and the
    # two-kidney phantom case runs 445 ms of ROI exec unbatched vs 518
    # batched (XLA's padded layout choice for batched 3D convs, the same
    # effect InferConfig.window_batch documents). Default back to 1; the
    # staging machinery stays for future A/B.
    roi_batch: int = 1
    # Hard cap on ROI physical extent per axis: a kidney+tumor fits well
    # inside 192 mm; this bounds fine-stage cost even if the coarse mask
    # degenerates (e.g. early in training).
    roi_max_mm: float = 192.0


@dataclasses.dataclass(frozen=True)
class Config:
    name: str = "fine_kits"
    model: ModelConfig = ModelConfig()
    preprocess: PreprocessConfig = PreprocessConfig()
    train: TrainConfig = TrainConfig()
    infer: InferConfig = InferConfig()
    cascade: CascadeConfig = CascadeConfig()

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        raw = json.loads(s)

        def build(cls: Any, d: dict) -> Any:
            kwargs = {}
            for f in dataclasses.fields(cls):
                if f.name not in d:
                    continue
                v = d[f.name]
                if dataclasses.is_dataclass(f.type) or f.name in _SUB:
                    kwargs[f.name] = build(_SUB[f.name], v)
                elif isinstance(v, list):
                    kwargs[f.name] = tuple(v)
                else:
                    kwargs[f.name] = v
            return cls(**kwargs)

        _SUB = {
            "model": ModelConfig,
            "preprocess": PreprocessConfig,
            "train": TrainConfig,
            "infer": InferConfig,
            "cascade": CascadeConfig,
        }
        return build(Config, raw)


def _preset_coarse() -> Config:
    """BASELINE config 1: coarse kidney-localization net, 128³ patch."""
    return Config(
        name="coarse",
        model=ModelConfig(num_classes=2, base_features=24, num_levels=4),
        # 4 mm iso: localization tolerates coarse voxels (boxes get a 16 mm
        # margin downstream), and the 512 mm FOV then fits the 128³ canonical
        # grid where the fused Pallas blocks apply (CascadeConfig).
        # transfer_quant4 ON: measured on chip (QUANT4_AB.json, 2026-08-20,
        # warm round) coarse_predict 97.7 vs 114.2 ms median and per-case
        # Dice IDENTICAL to uint8 across both rounds — the 16-level coarse
        # upload cannot move a margined box edge. Fine stages keep uint8.
        preprocess=PreprocessConfig(spacing=(4.0, 4.0, 4.0), transfer_quant=True,
                                    transfer_quant4=True),
        train=TrainConfig(patch_size=(128, 128, 128), fg_prob=0.5,
                          batch_size=1, grad_accum=2, val_full_every=5000),
        infer=InferConfig(patch_size=(128, 128, 128), overlap=0.5),
    )


def _preset_fine_kits() -> Config:
    """BASELINE config 2: fine kidney+tumor net with sliding-window."""
    return Config(
        name="fine_kits",
        model=ModelConfig(num_classes=3),
        # transfer_quant: uint8 uploads over the HU window (see
        # PreprocessConfig) — halves the dominant serving tunnel cost.
        preprocess=PreprocessConfig(spacing=(0.8, 0.8, 0.8), transfer_quant=True),
        # Per-chip batch 2, no grad accumulation: chip-measured 2026-08-21
        # (TRAIN_PROFILE.json): step_core B=2 = 195.5 ms = 97.7 ms/patch vs
        # 107.8 at B=1 — a 9.4% per-patch win, and the update rate doubles
        # vs the old batch-1 + 2-step-accum config (216.9 ms/update). The
        # round-3 "batch 2 OOMs in backward" no longer holds under the
        # round-4/5 kernel and layout classes. remat measured +32% — not
        # needed at this size.
        # val_full_every: keep-best selection keys on full sliding-window
        # Dice every 5 patch-vals (SURVEY.md §3.1/§3.4 — the reference
        # validated on held-out volumes, not patches).
        train=TrainConfig(patch_size=(128, 128, 128), batch_size=2,
                          grad_accum=1, val_full_every=5000),
        infer=InferConfig(patch_size=(128, 128, 128)),
    )


def _preset_cascade() -> Config:
    """BASELINE config 3: coarse→ROI→fine cascade, resample to native."""
    cfg = _preset_fine_kits()
    return dataclasses.replace(cfg, name="cascade")


def _preset_renal_anatomy() -> Config:
    """BASELINE config 4: kidney/tumor/artery/vein multi-class."""
    return Config(
        name="renal_anatomy",
        model=ModelConfig(num_classes=5),
        preprocess=PreprocessConfig(spacing=(0.8, 0.8, 0.8), transfer_quant=True),
        # Per-chip batch 2, no grad accumulation (chip-measured win — see
        # the fine_kits preset comment / TRAIN_PROFILE.json).
        train=TrainConfig(patch_size=(128, 128, 128), batch_size=2,
                          grad_accum=1, val_full_every=5000),
        infer=InferConfig(patch_size=(128, 128, 128)),
    )


def _preset_dp_full() -> Config:
    """BASELINE config 5: data-parallel training over full KiTS19."""
    cfg = _preset_fine_kits()
    return dataclasses.replace(
        cfg,
        name="dp_full",
        train=dataclasses.replace(cfg.train, batch_size=8, steps=250000),
    )


PRESETS = {
    "coarse": _preset_coarse,
    "fine_kits": _preset_fine_kits,
    "cascade": _preset_cascade,
    "renal_anatomy": _preset_renal_anatomy,
    "dp_full": _preset_dp_full,
}


def get_config(name: str) -> Config:
    """Resolve a preset name — or a path to a config JSON file (the format
    ``Config.to_json`` writes and every run dir's ``config.json`` uses), so
    custom configs round-trip through the CLI: edit a run's config.json,
    pass it to ``--config``."""
    if name in PRESETS:
        return PRESETS[name]()
    import os

    if os.path.isfile(name):
        return Config.from_json(open(name).read())
    raise KeyError(
        f"unknown preset {name!r} (not a file either); have {sorted(PRESETS)}"
    )
