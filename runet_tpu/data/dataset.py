"""KiTS19-layout dataset index + preprocessed case cache (SURVEY.md L0/L2).

Reference form: a PyTorch Dataset scanning ``case_XXXXX/imaging.nii.gz`` +
``segmentation.nii.gz`` dirs, resampling in DataLoader workers (SURVEY.md
§2.1 "Dataset ingestion", §3.1 — provenance [RECALL]/[DOMAIN]).

TPU-native design: preprocessing (resample+normalize) runs ONCE per case as a
jitted device graph; the result is cached host-side as float32/uint8 arrays
together with per-class foreground coordinate lists so the patch sampler is
O(1) per draw. Training then only does cheap host crops + one device_put per
step (SURVEY.md §3.1 "the host↔device boundary moves to a single device_put").
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from pathlib import Path

import numpy as np

from runet_tpu.config import PreprocessConfig
from runet_tpu.io.nifti import load_volume
from runet_tpu.preprocess.normalize import normalize
from runet_tpu.preprocess.resample import (
    output_shape_for_spacing,
    resample,
)


@dataclasses.dataclass
class CaseRecord:
    case_id: str
    image_path: Path
    label_path: Path | None


@dataclasses.dataclass
class PreparedCase:
    case_id: str
    image: np.ndarray  # (X, Y, Z) float32, normalized, iso spacing
    labels: np.ndarray | None  # (X, Y, Z) uint8, iso spacing
    native_shape: tuple[int, int, int]
    native_spacing: tuple[float, float, float]
    affine: np.ndarray
    # Per-class foreground voxel coordinates (N_c, 3) for fg-biased sampling.
    fg_coords: dict[int, np.ndarray] | None = None
    # Lazily cached image minimum (data/sampler.py pad value): an O(volume)
    # scan per PATCH draw on the 1-core host otherwise.
    image_min: float | None = None


def index_cases(root: str | Path) -> list[CaseRecord]:
    """Scan a KiTS19-layout directory for cases."""
    root = Path(root)
    records = []
    for d in sorted(root.glob("case_*")):
        img = d / "imaging.nii.gz"
        if not img.exists():
            img = d / "imaging.nii"
        if not img.exists():
            continue
        seg = d / "segmentation.nii.gz"
        if not seg.exists():
            seg = d / "segmentation.nii"
        records.append(
            CaseRecord(d.name, img, seg if seg.exists() else None)
        )
    return records


def prepare_case(
    rec: CaseRecord,
    pp: PreprocessConfig,
    with_fg_coords: bool = True,
    max_fg_per_class: int = 100_000,
    seed: int = 0,
) -> PreparedCase:
    """Load + preprocess one case on device, cache results host-side."""
    vol = load_volume(rec.image_path)
    native_shape = vol.shape
    native_spacing = vol.spacing
    out_shape = output_shape_for_spacing(native_shape, native_spacing, pp.spacing)
    scale = tuple(d / s for s, d in zip(native_spacing, pp.spacing))

    img = resample(np.asarray(vol.data, np.float32), out_shape, scale, method="linear")
    img = normalize(img, pp.hu_window, pp.hu_stats)
    img = np.asarray(img, dtype=np.float32)

    labels = None
    fg = None
    if rec.label_path is not None:
        seg = load_volume(rec.label_path)
        lab = resample(
            np.asarray(seg.data, np.int32), out_shape, scale, method="nearest"
        )
        labels = np.asarray(lab, dtype=np.uint8)
        if with_fg_coords:
            rng = np.random.default_rng(seed)
            fg = {}
            for cls in np.unique(labels):
                if cls == 0:
                    continue
                coords = np.argwhere(labels == cls)
                if len(coords) > max_fg_per_class:
                    sel = rng.choice(len(coords), max_fg_per_class, replace=False)
                    coords = coords[sel]
                fg[int(cls)] = coords.astype(np.int32)

    return PreparedCase(
        case_id=rec.case_id,
        image=img,
        labels=labels,
        native_shape=native_shape,
        native_spacing=native_spacing,
        affine=vol.affine,
        fg_coords=fg,
    )


def _pp_key(pp: PreprocessConfig) -> str:
    return json.dumps(
        {
            "spacing": list(pp.spacing),
            "hu_window": list(pp.hu_window),
            "hu_stats": list(pp.hu_stats) if pp.hu_stats else None,
        },
        sort_keys=True,
    )


def prepare_case_cached(
    rec: CaseRecord, pp: PreprocessConfig, cache_dir: Path
) -> PreparedCase:
    """Disk-backed prepare_case: preprocess ONCE, then memory-map.

    A full KiTS19 run (210 cases, ~70 MB each preprocessed) does not fit
    comfortably in host RAM next to the training process; ``np.load(...,
    mmap_mode="r")`` gives the patch sampler O(patch-bytes) reads through the
    page cache instead (the reference's equivalent is nnU-Net-style
    preprocessed-.npy caching — SURVEY.md §2.1 dataset ingestion [DOMAIN]).
    The cache key is the preprocess config; a changed config re-preprocesses.
    """
    d = Path(cache_dir) / rec.case_id
    meta_p = d / "meta.json"
    key = _pp_key(pp)
    if meta_p.exists():
        meta = json.loads(meta_p.read_text())
        if meta.get("pp_key") == key:
            labels = None
            fg = None
            if (d / "labels.npy").exists():
                labels = np.load(d / "labels.npy", mmap_mode="r")
                fgz = np.load(d / "fg.npz")
                fg = {int(k): fgz[k] for k in fgz.files}
            return PreparedCase(
                case_id=rec.case_id,
                image=np.load(d / "image.npy", mmap_mode="r"),
                labels=labels,
                native_shape=tuple(meta["native_shape"]),
                native_spacing=tuple(meta["native_spacing"]),
                affine=np.asarray(meta["affine"]),
                fg_coords=fg,
            )
    pc = prepare_case(rec, pp)
    # Build the entry in a process-unique staging dir, then rename it into
    # place: concurrent preparers (multi-host training sharing one --cache)
    # each produce a complete candidate and the LAST atomic rename wins —
    # readers can never mmap a torn image.npy or parse truncated meta.json.
    # (meta.json presence implies the whole entry is complete because it is
    # written before the directory becomes visible.)
    stage = d.with_name(f".{d.name}.tmp.{os.getpid()}")
    if stage.exists():
        shutil.rmtree(stage)
    stage.mkdir(parents=True)
    np.save(stage / "image.npy", pc.image)
    if pc.labels is not None:
        np.save(stage / "labels.npy", pc.labels)
        np.savez(stage / "fg.npz", **{str(k): v for k, v in (pc.fg_coords or {}).items()})
    (stage / "meta.json").write_text(
        json.dumps(
            {
                "pp_key": key,
                "native_shape": list(pc.native_shape),
                "native_spacing": list(pc.native_spacing),
                "affine": np.asarray(pc.affine).tolist(),
            }
        )
    )
    if d.exists():  # a concurrent preparer (or stale config) got here first
        shutil.rmtree(d)
    try:
        os.replace(stage, d)
    except OSError:
        # Lost a creation race on a filesystem where replace-onto-nonempty
        # fails: the winner's entry is complete, use it.
        shutil.rmtree(stage, ignore_errors=True)
    return dataclasses.replace(
        pc,
        image=np.load(d / "image.npy", mmap_mode="r"),
        labels=np.load(d / "labels.npy", mmap_mode="r") if pc.labels is not None else None,
    )


def prepare_dataset(
    root: str | Path,
    pp: PreprocessConfig,
    limit: int | None = None,
    cache_dir: str | Path | None = None,
) -> list[PreparedCase]:
    """Preprocess all cases; with ``cache_dir``, results are disk-cached and
    memory-mapped (full-KiTS scale without holding 15 GB in host RAM)."""
    recs = index_cases(root)
    if limit is not None:
        recs = recs[:limit]
    if cache_dir is None:
        return [prepare_case(r, pp) for r in recs]
    return [prepare_case_cached(r, pp, Path(cache_dir)) for r in recs]


def split_folds(cases: list, num_folds: int, fold: int) -> tuple[list, list]:
    """Deterministic K-fold split → (train_cases, val_cases).

    [DOMAIN] KiTS19-era pipelines train K cross-validation folds and fuse
    them at inference (infer/ensemble.py). Assignment is round-robin over
    the dataset order (index_cases sorts by case id), so every fold's val
    set is stable across runs/processes and folds differ by at most one
    case in size.
    """
    if not 2 <= num_folds <= len(cases):
        raise ValueError(
            f"num_folds={num_folds} must be in [2, num_cases={len(cases)}]"
        )
    if not 0 <= fold < num_folds:
        raise ValueError(f"fold={fold} out of range for num_folds={num_folds}")
    val = [c for i, c in enumerate(cases) if i % num_folds == fold]
    trn = [c for i, c in enumerate(cases) if i % num_folds != fold]
    return trn, val
