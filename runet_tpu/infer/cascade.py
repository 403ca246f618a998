"""Coarse → ROI → fine cascade orchestration (SURVEY.md L7, §3.2;
BASELINE.json config 3).

Pipeline per case (reference form: script-level glue, provenance [DOMAIN]):

1. resample native CT to coarse spacing, normalize, coarse sliding-window
   predict → binary kidney mask
2. connected components of the mask → up to ``max_components`` kidney
   bounding boxes + physical margin (host: boxes are tiny metadata)
3. per ROI: crop the NATIVE volume, resample only the crop to fine spacing
   (fine dims padded up to multiples of ``roi_bucket`` so the jitted fine
   program recompiles at most a handful of times across a dataset)
4. fine sliding-window predict per ROI, fused on device
5. one-hot-linear resample of each ROI's labels back to its native crop
   grid; paste into a native-shape canvas; CC postprocess

The full volume NEVER exists at fine spacing — only kidney ROIs do. For a
KiTS19-size case that is the difference between ~150M voxels and ~5M, and it
is what makes the <10 s north star reachable. Host↔device traffic: one
upload per resample input, one download of the coarse mask and of each ROI
label block — never per window.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from runet_tpu.config import CascadeConfig, InferConfig, PreprocessConfig
from runet_tpu.infer.postprocess import (
    component_bounding_boxes,
    keep_largest_components,
    keep_largest_components_in_boxes,
)
from runet_tpu.infer.sliding_window import sliding_window_predict
from runet_tpu.preprocess.normalize import normalize
from runet_tpu.preprocess.resample import (
    output_shape_for_spacing,
    resample_dynamic,
    resample_labels_onehot_dynamic,
)


@dataclasses.dataclass
class ModelBundle:
    """Everything needed to run one stage of the cascade."""

    apply_fn: object  # (params, windows(B,px,py,pz,C)) -> logits
    params: object
    num_classes: int
    preprocess: PreprocessConfig
    infer: InferConfig


def _to_transfer_dtype(image: np.ndarray, pp: PreprocessConfig | None = None) -> np.ndarray:
    """One canonical transfer dtype for every upload. Two reasons:
    (a) shrink host→device bytes — the tunnel measured at ~36 MB/s makes
    uploads the serving path's largest cost (ROI_PIECES.json: ~17 MB/case
    = 370-470 ms of a ~1.0 s sequential budget); (b) ONE jit cache class
    per program — int16 CT storage (the common NIfTI encoding) would
    otherwise key a second compiled variant per program that the warmup
    never touched, paying a cold compile mid-serving.

    Default: f16 (HU exact up to 2048; the clip window makes larger
    magnitudes irrelevant). With ``pp.transfer_quant``: uint8 quantized
    over ``pp.hu_window`` (~1.5 HU/step; normalize clips to that window
    anyway) — half the bytes of f16. The device programs dequantize by
    DTYPE (``_dequant``), so each bundle uses exactly one class."""
    if pp is not None and pp.transfer_quant:
        lo, hi = pp.hu_window
        if getattr(pp, "transfer_quant4", False):
            # 4-bit lanes (coarse stage only — see PreprocessConfig): two
            # voxels per byte along z, LOW nibble = even z. Odd z gets an
            # edge-replicated pad voxel; the device slices it back off
            # (the program knows the true z statically via ``in_z``).
            q = (image.astype(np.float32) - lo) * (15.0 / (hi - lo))
            q = np.clip(np.rint(q), 0.0, 15.0).astype(np.uint8)
            if q.shape[-1] % 2:
                q = np.concatenate([q, q[..., -1:]], axis=-1)
            return q[..., 0::2] | (q[..., 1::2] << 4)
        q = (image.astype(np.float32) - lo) * (255.0 / (hi - lo))
        return np.clip(np.rint(q), 0.0, 255.0).astype(np.uint8)
    if image.dtype == np.float16:
        return image
    return image.astype(np.float16)


def _dequant(x: jnp.ndarray, hu_window: tuple[float, float]) -> jnp.ndarray:
    """Device-side inverse of the uint8 transfer quantization (no-op for
    float uploads). Dequantizes to f32 — the resample matmuls upcast to f32
    anyway (preprocess/resample.py), so this costs nothing extra."""
    if x.dtype != jnp.uint8:
        return x
    lo, hi = hu_window
    return x.astype(jnp.float32) * ((hi - lo) / 255.0) + lo


def _dequant4(x: jnp.ndarray, hu_window: tuple[float, float], in_z: int) -> jnp.ndarray:
    """Device-side inverse of the 4-bit transfer packing: unpack two voxels
    per byte along z (LOW nibble = even z), slice the odd-z pad back off,
    dequantize 16 levels over ``hu_window`` to f32."""
    lo_w, hi_w = hu_window
    lo = x & jnp.uint8(0x0F)
    hi = x >> jnp.uint8(4)
    full = jnp.stack([lo, hi], axis=-1).reshape(*x.shape[:-1], -1)[..., :in_z]
    return full.astype(jnp.float32) * ((hi_w - lo_w) / 15.0) + lo_w


def _preprocess_on_device(image: np.ndarray, native_spacing, pp: PreprocessConfig):
    out_shape = output_shape_for_spacing(image.shape, native_spacing, pp.spacing)
    # Traced scale: cases sharing a shape class but differing in native
    # spacing reuse one compiled resample program.
    scale = np.asarray(
        [d / s for s, d in zip(native_spacing, pp.spacing)], np.float32
    )
    up = jnp.asarray(_to_transfer_dtype(np.asarray(image), pp))
    if pp.transfer_quant and getattr(pp, "transfer_quant4", False):
        deq = _dequant4(up, pp.hu_window, int(np.asarray(image).shape[-1]))
    else:
        deq = _dequant(up, pp.hu_window)
    x = resample_dynamic(deq, out_shape, scale, method="linear")
    return normalize(x, pp.hu_window, pp.hu_stats)


def _predict_stage(bundle: ModelBundle, volume, return_probs: bool = False):
    """Sliding-window predict; returns a DEVICE uint8 label array (plus the
    class probabilities when ``return_probs``)."""
    from runet_tpu.infer.tta import effective_apply_fn

    return sliding_window_predict(
        effective_apply_fn(bundle),
        bundle.params,
        volume,
        patch_size=tuple(bundle.infer.patch_size),
        num_classes=bundle.num_classes,
        overlap=bundle.infer.overlap,
        sigma_scale=bundle.infer.sigma_scale,
        use_gaussian=bundle.infer.use_gaussian,
        window_batch=bundle.infer.window_batch,
        single_pass_ratio=bundle.infer.single_pass_ratio,
        expand_windows=bundle.infer.expand_windows,
        return_probs=return_probs,
    )


def _pack_labels(native: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Widest lossless last-axis packing for the label fetch (packing.py
    ``pack_width``): 2-bit lanes for K ≤ 4 (KiTS19's 3 classes — quarter
    the bytes), nibbles for K ≤ 16 (renal_anatomy's 5), raw above that."""
    from runet_tpu.infer.packing import pack_crumbs, pack_nibbles, pack_width

    w = pack_width(num_classes)
    if w == 2:
        return pack_crumbs(native)
    if w == 4:
        return pack_nibbles(native)
    return native


def _unpack_labels(packed: np.ndarray, num_classes: int, n: int) -> np.ndarray:
    """Host inverse of ``_pack_labels`` along the last axis (length ``n``)."""
    from runet_tpu.infer.packing import pack_width, unpack_crumbs, unpack_nibbles

    w = pack_width(num_classes)
    if w == 2:
        return unpack_crumbs(packed, n)
    if w == 4:
        return unpack_nibbles(packed, n)
    return np.asarray(packed)


def _native_paste_packed(canvas, packed, lo, extent, num_classes: int) -> bool:
    """Fused native unpack+paste for whichever packing ``_pack_labels``
    chose; False when the native tier (or that symbol) is unavailable."""
    from runet_tpu.infer.packing import pack_width
    from runet_tpu.utils.native import native_paste_crumbs, native_paste_nibbles

    w = pack_width(num_classes)
    if w == 2:
        return native_paste_crumbs(canvas, packed, lo, extent)
    if w == 4:
        return native_paste_nibbles(canvas, packed, lo, extent)
    return False


def _labels_to_native(labels, native_shape, scale_fn, num_classes: int) -> np.ndarray:
    """One-hot back-resample of DEVICE labels to a native grid, fetched
    packed at the widest lossless width for K (2-bit/4-bit lanes; labels
    that would corrupt the lanes are fetched raw) as host uint8."""
    native = resample_labels_onehot_dynamic(
        labels.astype(jnp.int32),
        tuple(int(s) for s in native_shape),
        np.asarray(scale_fn, np.float32),
        num_classes,
    ).astype(jnp.uint8)
    packed = jax.jit(_pack_labels, static_argnums=1)(native, num_classes)
    return _unpack_labels(np.asarray(packed), num_classes, int(native_shape[2]))


# Per-voxel speed ratio of the XLA conv path vs the fused Pallas blocks —
# used to decide whether padding z up to a lane multiple (fused stays ON)
# beats tighter padding (fused OFF for that shape). Sourced from the
# chip-measured KERNEL_BENCH.json `model_fwd` section (regenerated by
# scripts/kernel_bench.py) so it tracks the kernel class automatically;
# the fallback is the round-4 full-model measurement (VERDICT r4 weak #5:
# the kernel class changed twice that round and a baked constant went
# silently stale each time).
_XLA_OVER_FUSED_FALLBACK = 1.45
_xla_over_fused_cache: list = []


def _xla_over_fused(art_path=None) -> float:
    """Artifact-sourced fused-vs-XLA full-model per-voxel ratio.

    ``art_path`` overrides the repo-root artifact (tests only; the override
    bypasses the cache)."""
    if art_path is None and _xla_over_fused_cache:
        return _xla_over_fused_cache[0]
    import json
    from pathlib import Path

    val = _XLA_OVER_FUSED_FALLBACK
    art = (
        Path(art_path)
        if art_path is not None
        else Path(__file__).resolve().parents[2] / "KERNEL_BENCH.json"
    )
    try:
        ratio = json.loads(art.read_text()).get("model_fwd", {}).get(
            "xla_over_fused"
        )
        # Guard against a corrupt/degenerate artifact steering bucket
        # choices off a cliff: the ratio is a mild padding tiebreaker,
        # plausible values live in [1, 4].
        if ratio is not None and 1.0 <= float(ratio) <= 4.0:
            val = float(ratio)
    except (OSError, ValueError, json.JSONDecodeError):
        pass
    if art_path is None:
        _xla_over_fused_cache.append(val)
    return val


def _bucket_up(size: np.ndarray, bucket: int, bucket_z: int | None = None) -> tuple[int, int, int]:
    """Round dims up to bucket multiples (static-shape recompile guard).

    The last (lane) axis gets a cost-based choice when ``bucket_z`` is set:
    pad z to a multiple of ``bucket_z`` (=64 → W%64==0 keeps the fused
    Pallas blocks applicable — the v2/v2m half-vreg gate,
    kernels/fused_block.py — worth ~``_xla_over_fused()``× per voxel,
    artifact-sourced from KERNEL_BENCH.json) unless the tighter
    ``bucket`` rounding wins even at the slower per-voxel rate.
    """
    x, y, z = (int(s) for s in size)
    up = lambda s, b: -(-s // b) * b
    if bucket_z is None or bucket_z <= bucket:
        zb = up(z, bucket)
    else:
        z_tight = up(z, bucket)
        z_lane = up(z, bucket_z)
        fused_ok = z_lane % 64 == 0
        zb = (
            z_lane
            if fused_ok and z_lane <= z_tight * _xla_over_fused()
            else z_tight
        )
    return (up(x, bucket), up(y, bucket), zb)


# ---------------------------------------------------------------------------
# Split program architecture (round 5; dataset-scale compile boundedness).
#
# Each cascade stage used to be ONE fused jitted program — minimal
# dispatches, but every static (including the native CROP extent, a
# near-continuous function of per-case spacing) specialized the WHOLE
# program, U-Net included. Chip-measured 2026-08-20 (novel 208×184×96 crop,
# 160×160×192 fine grid): a fresh crop-shape class cost 106-110 s of XLA
# compile; a 210-case KiTS19-geometry census (tests/test_compile_census.py)
# showed ~250 distinct crop classes — one ~2-minute stall every ~1.7 ROIs on
# a cold cache.
#
# The split keys the HEAVY program (U-Net forward) only on the canonical
# grid / bucketed fine-grid shapes (≤ ~10 classes across a dataset), and
# moves the shape-varying resample stages into separate LIGHT programs:
#   in   : dequant → resample → normalize        (novel shape: 1.9-5.4 s)
#   core : pad32 → U-Net → argmax (→ bit-pack)   (heavy, canonical shapes)
#   out  : slice → one-hot back-resample → pack  (novel shape: 5.3-6.4 s)
# Chained dispatch is host-async (~1 ms/call enqueue); steady-state measured
# AT PARITY with the fused program (0.3 ms dispatch, same device timeline)
# and the packed outputs are bit-equal. Fresh-sweep compile cost drops
# ~13× per novel geometry and the mid-sweep stall drops 106 s → ~8 s.
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("out_shape", "hu_window", "hu_stats", "in_z"),
)
def _stage_resample_in(image, out_shape, scale, hu_window, hu_stats, in_z=None):
    """LIGHT entry stage: dequant→resample→normalize. Keyed on the (bucketed)
    upload shape × output grid; compiles in seconds (no U-Net inside).

    ``scale`` is TRACED (f32 (3,)): native spacing is continuous per case on
    real data, and a static scale would recompile this program per distinct
    spacing (preprocess/resample.py resample_dynamic)."""
    deq = (
        _dequant4(image, hu_window, in_z)
        if in_z is not None
        else _dequant(image, hu_window)
    )
    x = resample_dynamic(deq, out_shape, scale, "linear")
    return normalize(x, hu_window, hu_stats)


@partial(jax.jit, static_argnames=("apply_fn",))
def _coarse_stage_core(apply_fn, params, x):
    """HEAVY coarse stage at the canonical grid: pad32→forward→argmax→
    binarize→bit-pack. Keyed only on the resampled grid shape — ONE compile
    class for every case that lands on CascadeConfig.coarse_canonical.
    Returns the foreground mask bit-packed along Z (infer/packing.py): the
    host fetch drops 8× (4 MB → 0.5 MB at the 160³ canonical grid)."""
    from runet_tpu.infer.packing import pack_bits
    from runet_tpu.infer.sliding_window import _single_pass

    out_shape = x.shape
    div32 = tuple(-(-s // 32) * 32 for s in x.shape)
    pads = [(0, p - s) for s, p in zip(x.shape, div32)]
    if any(p[1] for p in pads):
        x = jnp.pad(x, pads, constant_values=jnp.min(x))  # pad with "air"
    labels, _ = _single_pass(apply_fn, params, x[..., None])
    labels = labels[: out_shape[0], : out_shape[1], : out_shape[2]]
    return pack_bits(labels > 0)


def _coarse_program(apply_fn, params, image, out_shape, scale, hu_window, hu_stats,
                    in_z=None):
    """Coarse stage as a light-in → heavy-core chain (split architecture
    above): resample→normalize→pad32→forward→argmax→binarize→bit-pack.
    Dispatches are async so the chain costs one host enqueue more than the
    old fused program; the U-Net compile class no longer depends on the
    strided upload shape."""
    x = _stage_resample_in(image, out_shape, scale, hu_window, hu_stats, in_z)
    return _coarse_stage_core(apply_fn, params, x)


@partial(jax.jit, static_argnames=("apply_fn",))
def _roi_stage_core(apply_fn, params, roi):
    """HEAVY ROI stage: U-Net forward + argmax at the BUCKETED fine grid.
    Keyed only on the fine-grid shape — ≤ ~10 classes across a KiTS19-scale
    dataset (tests/test_compile_census.py), each warmed by
    infer/warmup.py::warmup_roi_buckets."""
    from runet_tpu.infer.sliding_window import _single_pass

    labels, _ = _single_pass(apply_fn, params, roi[..., None])
    return labels


@partial(
    jax.jit,
    static_argnames=("fine_shape", "crop_shape", "num_classes"),
)
def _roi_stage_out(labels, fine_shape, crop_shape, scale_fn, num_classes):
    """LIGHT exit stage: slice→one-hot back-resample to the native crop
    grid→pack. Keyed on (fine grid, crop extent); compiles in seconds.

    Pack along Z at the widest lossless width for K (2-bit for KiTS19's
    3 classes = quarter bytes, nibbles up to 16): fetch bytes are real
    sequential-latency cost once every ROI's compute has drained
    (CASCADE_PROFILE deep: 134-182 ms residual fetch+paste)."""
    labels = labels[: fine_shape[0], : fine_shape[1], : fine_shape[2]]
    native = resample_labels_onehot_dynamic(
        labels.astype(jnp.int32), crop_shape, scale_fn, num_classes
    ).astype(jnp.uint8)
    return _pack_labels(native, num_classes)


def _roi_program(
    apply_fn,
    params,
    crop,  # (cx, cy, cz) native-spacing HU crop (f16)
    padded_shape, fine_shape, crop_shape,
    scale_nf, scale_fn,  # TRACED f32 (3,) — spacing varies per case
    num_classes, hu_window, hu_stats,
):
    """One device-resident program CHAIN per ROI (split architecture above):
    resample→normalize→U-Net forward→argmax→one-hot-resample back to the
    native crop grid→pack. Three async dispatches + a single uint8 fetch —
    the blocking per-FETCH tunnel round-trip (~38 ms measured) is still paid
    once, while the U-Net compile class no longer depends on the
    near-continuous native crop extent.

    The heavy core's statics are BUCKETED fine-grid shapes (predict_case
    grows the native crop to fill the bucketed fine grid with real context),
    and the spacing-dependent scales are traced inputs — so heavy compiles
    across a dataset are bounded by the fine bucket set; the crop-extent
    classes that used to cost ~106 s each now pay only the seconds-scale
    in/out stages."""
    roi = _stage_resample_in(crop, padded_shape, scale_nf, hu_window, hu_stats)
    labels = _roi_stage_core(apply_fn, params, roi)
    return _roi_stage_out(labels, fine_shape, crop_shape, scale_fn, num_classes)


@partial(
    jax.jit,
    static_argnames=("padded_shape", "hu_window", "hu_stats"),
)
def _stage_resample_in_batch(crops, padded_shape, scale_nf, hu_window, hu_stats):
    """LIGHT batched entry stage (``_stage_resample_in`` vmapped per sample —
    normalize must see per-ROI stats when hu_stats is None)."""

    def _prep(c):
        roi = resample_dynamic(_dequant(c, hu_window), padded_shape, scale_nf, "linear")
        return normalize(roi, hu_window, hu_stats)

    return jax.vmap(_prep)(crops)


@partial(jax.jit, static_argnames=("apply_fn",))
def _roi_stage_core_batch(apply_fn, params, rois):
    """HEAVY batched ROI stage: the model forward and argmax are natively
    batch-shaped. One extra compile class per (bucket, B) actually seen."""
    logits = apply_fn(params, rois[..., None])  # (B, *padded, K)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.argmax(probs, axis=-1).astype(jnp.uint8)


@partial(
    jax.jit,
    static_argnames=("fine_shape", "crop_shape", "num_classes"),
)
def _roi_stage_out_batch(labels, fine_shape, crop_shape, scale_fn, num_classes):
    """LIGHT batched exit stage (``_roi_stage_out`` vmapped; the last-axis
    pack is batch-agnostic)."""
    labels = labels[:, : fine_shape[0], : fine_shape[1], : fine_shape[2]]

    def _back(lab):
        return resample_labels_onehot_dynamic(
            lab.astype(jnp.int32), crop_shape, scale_fn, num_classes
        ).astype(jnp.uint8)

    native = jax.vmap(_back)(labels)
    return _pack_labels(native, num_classes)


def _roi_program_batch(
    apply_fn,
    params,
    crops,  # (B, cx, cy, cz) native-spacing HU crops, same bucket (f16)
    padded_shape, fine_shape, crop_shape,
    scale_nf, scale_fn,
    num_classes, hu_window, hu_stats,
):
    """``_roi_program`` for B same-bucket ROIs in one program CHAIN.
    History: B=2 measured 26% cheaper per ROI in round 3 (ROI_OVERLAP.json)
    but INVERTED into a regression under the round-4 kernels
    (ROI_PIECES.json: fwd B=2 359.6 ms vs 2×128.1) — CascadeConfig.roi_batch
    defaults to 1 and this path serves only explicit roi_batch>1 configs.
    Heavy-core statics match the B=1 chain's bucket discipline."""
    roi = _stage_resample_in_batch(crops, padded_shape, scale_nf, hu_window, hu_stats)
    labels = _roi_stage_core_batch(apply_fn, params, roi)
    return _roi_stage_out_batch(labels, fine_shape, crop_shape, scale_fn, num_classes)


def _chain_cache_size(*stages):
    """Aggregate jit-cache size across a chain's stages (tests assert
    compile-class discipline through these, as they did on the old fused
    single-program versions)."""
    return lambda: sum(s._cache_size() for s in stages)


_coarse_program._cache_size = _chain_cache_size(
    _stage_resample_in, _coarse_stage_core
)
_roi_program._cache_size = _chain_cache_size(
    _stage_resample_in, _roi_stage_core, _roi_stage_out
)
_roi_program_batch._cache_size = _chain_cache_size(
    _stage_resample_in_batch, _roi_stage_core_batch, _roi_stage_out_batch
)


def predict_volume(
    fine: ModelBundle, image: np.ndarray, native_spacing,
    return_probs: bool = False,
):
    """BASELINE config 2: fine model sliding-window over the whole volume,
    labels resampled back to the native grid (fetched nibble-packed — the
    native-shape uint8 volume is ~42 MB at KiTS19 scale, ~1 s of tunnel).

    ``return_probs``: also fetch the class probabilities at the PREPROCESSED
    grid as f16 — (native_labels, probs, preprocess_spacing). Probabilities
    feed offline fusion/calibration workflows; they stay at the model grid
    (resampling them to native would triple the fetch for no analysis
    value — downstream fusion resamples once at the end)."""
    vol = _preprocess_on_device(image, native_spacing, fine.preprocess)
    scale_fn = [n / f for n, f in zip(native_spacing, fine.preprocess.spacing)]
    if return_probs:
        labels, probs = _predict_stage(fine, vol, return_probs=True)
        native = _labels_to_native(labels, image.shape, scale_fn, fine.num_classes)
        return native, np.asarray(probs.astype(jnp.float16)), fine.preprocess.spacing
    labels = _predict_stage(fine, vol)
    return _labels_to_native(labels, image.shape, scale_fn, fine.num_classes)


def predict_case(
    coarse: ModelBundle,
    fine: ModelBundle,
    image: np.ndarray,
    native_spacing,
    cascade: CascadeConfig = CascadeConfig(),
    postprocess: bool = True,
    timer=None,
) -> np.ndarray:
    """BASELINE config 3: full cascade; returns uint8 labels at native shape."""
    from runet_tpu.utils.timing import PhaseTimer

    from runet_tpu.infer.tta import effective_apply_fn

    t = timer if timer is not None else PhaseTimer(enabled=False)
    coarse_apply = effective_apply_fn(coarse)
    fine_apply = effective_apply_fn(fine)
    image = np.asarray(image)
    n_sp = np.asarray(native_spacing, np.float64)
    c_sp = np.asarray(coarse.preprocess.spacing, np.float64)
    f_sp = np.asarray(fine.preprocess.spacing, np.float64)
    if getattr(fine.preprocess, "transfer_quant4", False):
        # The ROI programs apply only the 8-bit _dequant; a 4-bit-packed
        # (nibble, z-halved) crop would silently decode as garbage. quant4
        # is a coarse-stage-only transfer format (shipped presets agree).
        raise ValueError(
            "transfer_quant4 is not supported on the fine/ROI path; "
            "set it only on the coarse preset's PreprocessConfig"
        )

    # ---- coarse localization ----
    # Host-side integer striding before upload: localization tolerates the
    # aliasing, and it cuts the (tunnel-bound, ~36 MB/s) transfer by the
    # stride product (e.g. 42M -> 2.6M voxels for 0.78mm -> 3.2mm). The
    # whole stage (resample→normalize→forward→argmax) is one dispatch when
    # the single-pass path applies.
    with t.phase("coarse_preprocess"):
        stride = np.maximum((c_sp // n_sp).astype(int), 1)
        strided = image[:: stride[0], :: stride[1], :: stride[2]]
        # Bucket the strided shape up to multiples of 32 (edge-pad): the
        # coarse program is specialized on (input, output) shapes, and each
        # fresh XLA compile costs ~30-60 s on this 1-core host. In-plane
        # dims are nearly constant across a dataset (512/stride); only a
        # handful of z buckets remain, all cached on disk.
        bucket32 = tuple(-(-s // 32) * 32 for s in strided.shape)
        if bucket32 != strided.shape:
            pads = [(0, b - s) for s, b in zip(strided.shape, bucket32)]
            strided = np.pad(strided, pads, mode="edge")
        strided_spacing = tuple(n_sp * stride)
        c_pp = coarse.preprocess
        c_out_shape = output_shape_for_spacing(
            strided.shape, strided_spacing, c_pp.spacing
        )
        # Canonical coarse grid: resample positions clamp at the volume edge
        # (edge padding), so requesting a larger fixed output shape is safe —
        # every case then reuses ONE compiled coarse program. The mask is
        # cropped back to the true shape below.
        c_run_shape = tuple(
            c if o <= c else -(-o // 16) * 16
            for o, c in zip(c_out_shape, cascade.coarse_canonical)
        )
        c_scale = tuple(d / s for s, d in zip(strided_spacing, c_pp.spacing))
        c_single = (
            coarse.infer.single_pass_ratio > 0
            and np.prod([-(-s // 32) * 32 for s in c_run_shape])
            <= coarse.infer.single_pass_ratio * np.prod(coarse.infer.patch_size)
        )
    with t.phase("coarse_predict"):
        if c_single:
            packed = _coarse_program(
                coarse_apply,
                coarse.params,
                jnp.asarray(_to_transfer_dtype(np.ascontiguousarray(strided), c_pp)),
                c_run_shape,
                np.asarray(c_scale, np.float32),  # traced, not a cache key
                c_pp.hu_window,
                c_pp.hu_stats,
                in_z=(
                    int(strided.shape[-1])
                    if c_pp.transfer_quant and getattr(c_pp, "transfer_quant4", False)
                    else None
                ),
            )
            from runet_tpu.infer.packing import unpack_bits

            mask = unpack_bits(np.asarray(packed), c_run_shape[2])
        else:
            coarse_vol = _preprocess_on_device(strided, strided_spacing, c_pp)
            mask = (np.asarray(_predict_stage(coarse, coarse_vol)) > 0).astype(np.uint8)
        mask = mask[: c_out_shape[0], : c_out_shape[1], : c_out_shape[2]]

    with t.phase("coarse_boxes"):
        boxes = component_bounding_boxes(
            mask, max_components=cascade.max_components, min_voxels=8
        )

    native_canvas = np.zeros(image.shape, np.uint8)
    # The lane-axis bucket rule pads z for the fused Pallas path's W%128
    # gate — pointless off-TPU, where it would pay the padded voxels at the
    # slow rate with no fused path to buy (kernels/fused_block.py gate).
    from runet_tpu.kernels import fused_block as _fb

    lane_bucket = (
        getattr(cascade, "roi_bucket_z", None)
        if (jax.default_backend() == "tpu" or _fb.FORCE_INTERPRET)
        else None
    )
    margin_vox = np.ceil(cascade.roi_margin_mm / n_sp).astype(int)
    native_boxes: list[tuple[np.ndarray, np.ndarray]] = []
    # (lo, hi, want_buf, device_array, batch_index_or_None)
    roi_results: list[tuple[np.ndarray, np.ndarray, tuple, jnp.ndarray, int | None]] = []

    # ROI batching (CascadeConfig.roi_batch): single-pass ROIs whose bucketed
    # shapes match are held here and dispatched as ONE B-batched program.
    # Measured decision (ROI_OVERLAP.json): the forward at the modal kidney
    # bucket is not saturated at B=1 (B=2 is 26% cheaper per ROI), and the
    # typical case has exactly two same-bucket kidney ROIs. Leftover singles
    # flush through the B=1 program after the loop — never a fresh compile
    # class for an odd group size. Note staging can reorder PASTES across
    # buckets (batched group lands when it fills; stragglers after) — only
    # observable where two ROI boxes overlap with conflicting nonzero
    # labels, which is ambiguous territory under any order.
    roi_batch = max(1, int(getattr(cascade, "roi_batch", 1)))
    pending_rois: dict[tuple, list] = {}
    scale_nf_a = np.asarray([f / n for n, f in zip(n_sp, f_sp)], np.float32)
    scale_fn_a = np.asarray([n / f for n, f in zip(n_sp, f_sp)], np.float32)

    def _dispatch_rois(entries):
        """One device dispatch for 1..B staged same-bucket ROIs."""
        padded = entries[0][4]
        common = (
            scale_nf_a, scale_fn_a,
            fine.num_classes, fine.preprocess.hu_window, fine.preprocess.hu_stats,
        )
        with t.phase("roi_dispatch"):
            if len(entries) == 1:
                lo_, hi_, wb_, crop_, _p = entries[0]
                dev = _roi_program(
                    fine_apply, fine.params,
                    jnp.asarray(_to_transfer_dtype(
                        np.ascontiguousarray(crop_), fine.preprocess)),
                    padded, padded, tuple(crop_.shape), *common,
                )
                roi_results.append((lo_, hi_, wb_, dev, None))
            else:
                crops = np.stack([
                    _to_transfer_dtype(np.ascontiguousarray(e[3]), fine.preprocess)
                    for e in entries
                ])
                dev = _roi_program_batch(
                    fine_apply, fine.params, jnp.asarray(crops),
                    padded, padded, tuple(crops.shape[1:]), *common,
                )
                for i, (lo_, hi_, wb_, _c, _p) in enumerate(entries):
                    roi_results.append((lo_, hi_, wb_, dev, i))

    for lo_c, hi_c in boxes:
        # coarse voxel -> mm -> NATIVE voxel, plus margin.
        lo = np.floor(lo_c * c_sp / n_sp).astype(int) - margin_vox
        hi = np.ceil(hi_c * c_sp / n_sp).astype(int) + margin_vox
        # Cap ROI physical extent (centered) so a degenerate coarse mask
        # can't make the fine stage scan the whole volume.
        max_vox = np.maximum((cascade.roi_max_mm / n_sp).astype(int), 1)
        over = np.maximum(hi - lo - max_vox, 0)
        lo = lo + over // 2
        hi = hi - (over - over // 2)
        lo = np.maximum(lo, 0)
        hi = np.minimum(hi, image.shape)
        if np.any(hi <= lo):
            continue

        # Bucket the FINE grid, then GROW the native crop so the bucketed
        # grid is filled with real anatomical context: every static shape of
        # the ROI program (input crop, fine grid, native output) is then a
        # pure function of the bucketed fine shape, so compile classes are
        # bounded by the bucket set across a whole dataset. (Previously the
        # exact crop dims specialized the program — a fresh 30-60 s XLA
        # compile per distinct kidney size, fatal for a 200-case sweep.)
        fine_exact = output_shape_for_spacing(
            tuple(int(s) for s in (hi - lo)), native_spacing, tuple(f_sp)
        )
        padded_shape = _bucket_up(
            np.asarray(fine_exact), cascade.roi_bucket, lane_bucket
        )
        scale_nf = tuple(f / n for n, f in zip(n_sp, f_sp))
        scale_fn = tuple(n / f for n, f in zip(n_sp, f_sp))
        # Native extent whose corner-aligned resample covers the full padded
        # fine grid without edge clamping: (p-1)*scale must stay <= want-1.
        want = np.asarray(
            [int(np.ceil((p - 1) * s)) + 1 for p, s in zip(padded_shape, scale_nf)]
        )
        # Bucket the crop BUFFER extent too: want is a continuous function
        # of the case's native spacing, and the crop shape is a STATIC of
        # the ROI program — unbucketed it would compile one variant per
        # distinct spacing even with the scales traced. The bucket rows are
        # buffer only: the fine grid still covers exactly [lo, lo+want) —
        # pasting past it would replicate clamped edge labels outward — so
        # the PASTE extent keeps the exact (unbucketed) want.
        cb = max(1, int(getattr(cascade, "crop_bucket", 16)))
        want_buf = -(-want // cb) * cb
        # Place the EXACT covered window first (symmetric growth to ``want``,
        # identical to the unbucketed computation — bucketing must not move
        # the window, or structures near the box edge fall out of coverage);
        # the bucket buffer is then a pure suffix of real context / edge pad.
        extra = np.maximum(want - (hi - lo), 0)
        lo = np.maximum(lo - extra // 2, 0)
        lo = np.minimum(lo, np.maximum(np.asarray(image.shape) - want, 0))
        hi = np.minimum(lo + want, image.shape)  # exact covered extent
        hi_buf = np.minimum(lo + want_buf, image.shape)
        native_boxes.append((lo.copy(), hi.copy()))
        crop = image[lo[0] : hi_buf[0], lo[1] : hi_buf[1], lo[2] : hi_buf[2]]
        if np.any(hi_buf - lo < want_buf):
            # Volume smaller than the grown extent on some axis: edge-pad on
            # host (same values the resampler's clamp would have produced).
            pads = [(0, int(w - (h - l))) for w, l, h in zip(want_buf, lo, hi_buf)]
            crop = np.pad(crop, pads, mode="edge")
        fine_shape = tuple(padded_shape)  # full grid is real context now

        single_pass = (
            fine.infer.single_pass_ratio > 0
            and np.prod(padded_shape)
            <= fine.infer.single_pass_ratio * np.prod(fine.infer.patch_size)
        )
        if single_pass:
            # Entire ROI chain as ONE dispatch (or one per same-bucket GROUP
            # when roi_batch > 1); fetched after all ROIs are in flight so
            # the device pipelines them.
            entry = (
                lo, hi, tuple(int(w) for w in want_buf), crop,
                tuple(int(p) for p in padded_shape),
            )
            if roi_batch > 1:
                key = (entry[4], tuple(crop.shape))
                grp = pending_rois.setdefault(key, [])
                grp.append(entry)
                if len(grp) >= roi_batch:
                    _dispatch_rois(grp)
                    pending_rois[key] = []
            else:
                _dispatch_rois([entry])
        else:
            with t.phase("roi_preprocess"):
                roi = resample_dynamic(
                    _dequant(
                        jnp.asarray(_to_transfer_dtype(
                            np.ascontiguousarray(crop), fine.preprocess)),
                        fine.preprocess.hu_window,
                    ),
                    padded_shape,
                    np.asarray(scale_nf, np.float32),
                    "linear",
                )
                roi = normalize(roi, fine.preprocess.hu_window, fine.preprocess.hu_stats)
            with t.phase("roi_predict"):
                roi_labels = _predict_stage(fine, roi)[
                    : fine_shape[0], : fine_shape[1], : fine_shape[2]
                ]
            with t.phase("roi_labels_back"):
                native = resample_labels_onehot_dynamic(
                    roi_labels.astype(jnp.int32),
                    tuple(crop.shape),
                    np.asarray(scale_fn, np.float32),
                    fine.num_classes,
                ).astype(jnp.uint8)
                dev = jax.jit(_pack_labels, static_argnums=1)(
                    native, fine.num_classes
                )
            roi_results.append((lo, hi, tuple(int(w) for w in want_buf), dev, None))

    # Flush staged ROIs. Groups still short of roi_batch at loop end go
    # through the B=1 program one by one — a leftover group size never mints
    # a fresh compile class (with the default roi_batch=2 leftovers are
    # singletons anyway; only full groups use the batched class).
    for grp in pending_rois.values():
        for e in grp:
            _dispatch_rois([e])

    # ---- fetch + paste (device work for all ROIs already in flight) ----
    # Kick off ALL device→host copies before the first blocking fetch: the
    # serial per-ROI np.asarray otherwise issues fetch i+1's request only
    # after fetch i's bytes fully arrive — one tunnel RTT per ROI plus no
    # exec/transfer pipelining. copy_to_host_async lets the tunnel stream
    # ROI 2's packed labels while the host is still receiving ROI 1's.
    _seen_async: set[int] = set()
    for *_rest, dev_a, _b in roi_results:
        if id(dev_a) not in _seen_async:
            _seen_async.add(id(dev_a))
            try:
                dev_a.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass  # backend without async host copies: fetches stay sync
    fetched_memo: dict[int, np.ndarray] = {}
    for lo, hi, want_buf, dev, bidx in roi_results:
        with t.phase("roi_fetch_paste"):
            # Labels come back at the crop BUFFER shape ``want_buf``; only
            # the exactly-covered in-volume region [0 : hi-lo) is pasted
            # (the rest is bucket buffer / edge padding, whose fine-grid
            # source would be clamped). Batched dispatches fetch ONCE per
            # device array (keyed by id; ``roi_results`` keeps dev alive so
            # ids are stable) and index out each sample.
            fetched = fetched_memo.get(id(dev))
            if fetched is None:
                fetched = np.asarray(dev)
                fetched_memo[id(dev)] = fetched
            if bidx is not None:
                fetched = fetched[bidx]
            if fine.num_classes <= 16:
                # Fused native unpack+paste: one read of the packed bytes,
                # nonzero lanes overwrite (np.where semantics). Falls back
                # to the numpy chain when the native tier is unavailable.
                if _native_paste_packed(
                    native_canvas, fetched, lo, hi - lo, fine.num_classes
                ):
                    continue
                fetched = _unpack_labels(fetched, fine.num_classes, want_buf[2])
            crop_labels = fetched[
                : hi[0] - lo[0], : hi[1] - lo[1], : hi[2] - lo[2]
            ]
            dst = native_canvas[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]]
            native_canvas[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]] = np.where(
                crop_labels > 0, crop_labels, dst
            )

    if postprocess and native_boxes:
        with t.phase("postprocess_cc"):
            native_canvas = keep_largest_components_in_boxes(
                native_canvas,
                native_boxes,
                max_components=cascade.max_components,
                inplace=True,  # canvas is function-local
            )
    return native_canvas


def bundle_on_device(bundle: ModelBundle, device) -> ModelBundle:
    """Copy of ``bundle`` with params committed to ``device`` (one serving
    lane of the multi-chip path below)."""
    return dataclasses.replace(
        bundle, params=jax.device_put(bundle.params, device)
    )


def predict_cases(
    coarse: ModelBundle,
    fine: ModelBundle,
    cases,  # iterable of (image, native_spacing)
    cascade: CascadeConfig = CascadeConfig(),
    postprocess: bool = True,
    workers: int = 2,
    devices=None,
):
    """Pipelined multi-case cascade (the BASELINE metric is volumes/MINUTE —
    this is the serving path for it).

    ``predict_case`` alternates host work (strided prep, box extraction,
    fetch-wait, paste, CC postprocess) with device work (coarse + ROI
    programs); single-case latency is therefore host-tail + device time.
    Running ``workers`` cases on a small thread pool overlaps case i's host
    tail with case i+1's device compute — the device never idles while the
    host labels components. JAX dispatch is thread-safe and the jitted
    programs are shared across threads (same shapes → same executables).

    ``devices`` (list of jax devices) turns on multi-chip serving: each
    device is an INDEPENDENT serving lane — params are replicated onto it
    and a worker thread pins its whole case (uploads, programs,
    accumulators) there via ``jax.default_device``. Cases share nothing, so
    lanes need no collectives and throughput scales with chip count; this
    is deliberately NOT window-sharding, which would all-reduce full-volume
    f32 accumulators across ICI per window group while per-device window
    batching is already a measured regression (sliding_window.py). With
    ``devices`` set, ``workers`` is the lane count.

    Results are yielded IN ORDER as they complete. ``cases`` may be a lazy
    iterator (e.g. streaming NIfTI loads): at most ``workers + 1`` cases are
    in flight, so a 200-case sweep never holds every volume in host RAM.
    """
    import queue
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    if devices:
        lanes: queue.SimpleQueue = queue.SimpleQueue()
        for dev in devices:
            lanes.put(
                (dev, bundle_on_device(coarse, dev), bundle_on_device(fine, dev))
            )
        workers = len(devices)

        def run_one(img, sp):
            dev, c_d, f_d = lanes.get()
            try:
                with jax.default_device(dev):
                    return predict_case(c_d, f_d, img, sp, cascade, postprocess)
            finally:
                lanes.put((dev, c_d, f_d))

    else:

        def run_one(img, sp):
            return predict_case(coarse, fine, img, sp, cascade, postprocess)

    it = iter(cases)
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        inflight: deque = deque()
        for args in it:
            img, sp = args
            inflight.append(pool.submit(run_one, img, sp))
            if len(inflight) > workers:
                yield inflight.popleft().result()
        while inflight:
            yield inflight.popleft().result()
