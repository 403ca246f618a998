"""Evaluation sweep (SURVEY.md §3.4): per-case, per-class Dice + KiTS19
composite, driving the BASELINE metric of record (volumes/min at Dice
parity)."""

from __future__ import annotations

import time

import numpy as np

from runet_tpu.eval.surface import cl_dice, surface_metrics, volumetry
from runet_tpu.train.losses import hard_dice_per_class, kits_composite_dice


def evaluate_prediction(
    pred: np.ndarray,
    gt: np.ndarray,
    num_classes: int,
    spacing=None,
    surface: bool = False,
    cldice_classes=None,
) -> dict:
    """Per-class Dice + KiTS composite; with ``spacing`` also volumetry (mL),
    and with ``surface=True`` per-foreground-class hd95/assd/nsd (see
    eval/surface.py — spacing-aware boundary metrics, [DOMAIN]).

    ``cldice_classes``: which classes also get centerline Dice. Default
    None = the tubular vessel classes (ids >= 3, artery/vein in the
    renal_anatomy label convention) — clDice on a bulky organ is both
    meaningless and expensive (the iterative skeleton erodes to the organ's
    inradius). Pass an explicit iterable to override."""
    d = np.asarray(hard_dice_per_class(pred.astype(np.int32), gt.astype(np.int32), num_classes))
    comp = kits_composite_dice(pred.astype(np.int32), gt.astype(np.int32))
    out = {f"dice_c{k}": float(d[k]) for k in range(num_classes)}
    out["dice_fg_mean"] = float(d[1:].mean()) if num_classes > 1 else float(d.mean())
    out["kidney_composite"] = float(comp["kidney_composite"])
    out["tumor"] = float(comp["tumor"])
    if spacing is not None:
        out.update(volumetry(pred, spacing, num_classes))
        if surface:
            for k in range(1, num_classes):
                sm = surface_metrics(pred == k, gt == k, spacing)
                out.update({f"{name}_c{k}": v for name, v in sm.items()})
    # clDice is spacing-free (pure mask topology): compute it whenever the
    # caller asked for it explicitly, or by default (vessel classes >= 3)
    # when surface metrics are on — an explicit --cldice must never be
    # silently dropped just because --surface was omitted.
    if cldice_classes is not None:
        cld = set(cldice_classes)
    elif surface:
        cld = set(range(3, num_classes))
    else:
        cld = set()
    for k in sorted(cld):
        if 1 <= k < num_classes:
            out[f"cldice_c{k}"] = cl_dice(pred == k, gt == k)
    return out


def finite_mean(values) -> float:
    """Mean over the FINITE entries (empty-prediction cases yield inf
    hd95/assd — one such case must not erase every other case's summary
    value). All-non-finite -> inf (preserved as a signal, serialized as
    null by ``json_sanitize``)."""
    a = np.asarray(list(values), np.float64)
    m = np.isfinite(a)
    return float(a[m].mean()) if m.any() else float("inf")


def json_sanitize(obj):
    """Replace non-finite floats with None recursively: ``json.dumps`` emits
    the non-standard ``Infinity``/``NaN`` tokens otherwise (invalid per RFC
    8259 — jq / JSON.parse choke on the artifact)."""
    if isinstance(obj, dict):
        return {k: json_sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [json_sanitize(v) for v in obj]
    if isinstance(obj, float) and not np.isfinite(obj):
        return None
    return obj


def evaluate_cases(
    predict_fn,
    cases,
    num_classes: int,
    spacing=None,
    surface: bool = False,
) -> dict:
    """predict_fn(case) -> uint8 labels at native shape; ``cases`` are
    PreparedCase-likes with .image/.labels or (image, gt) tuples.

    ``spacing`` must be the voxel spacing of the grid the predictions/GT
    masks live on (for PreparedCase inputs that is the PREPROCESS iso
    spacing, NOT case.native_spacing — the masks were resampled); when
    given, rows gain volumetry (and boundary metrics with ``surface=True``).
    """
    rows = []
    t0 = time.monotonic()
    for case in cases:
        if isinstance(case, tuple):
            cid, image, gt = None, case[0], case[1]
        else:
            cid, image, gt = case.case_id, case, case.labels
        t = time.monotonic()
        pred = predict_fn(case)
        dt = time.monotonic() - t
        row = evaluate_prediction(
            pred, np.asarray(gt), num_classes, spacing=spacing, surface=surface
        )
        row["case_id"] = cid
        row["seconds"] = dt
        rows.append(row)
    total = time.monotonic() - t0
    summary = {
        k: finite_mean(r[k] for r in rows)
        for k in rows[0]
        if k not in ("case_id",)
    }
    summary["volumes_per_min"] = 60.0 * len(rows) / total
    return {"cases": rows, "summary": summary}
