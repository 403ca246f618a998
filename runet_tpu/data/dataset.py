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


def prepare_dataset(
    root: str | Path, pp: PreprocessConfig, limit: int | None = None
) -> list[PreparedCase]:
    recs = index_cases(root)
    if limit is not None:
        recs = recs[:limit]
    return [prepare_case(r, pp) for r in recs]
