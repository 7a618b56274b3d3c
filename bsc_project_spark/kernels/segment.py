"""Deterministic classical page segmenter (K9 stand-in).

The reference segments pages with a DeepLabV3-ResNet50 forward pass
(reference scripts/imgs2csv.py:139-143, 6 classes = 5 table columns +
background).  This sandbox has no torch/GPU, so the engine ships a
deterministic classical segmenter with the SAME output contract — an HxW
class mask, classes 0..4 (Year/Date/Latitude/Longitude/Temperature) +
background 5 — behind a swappable interface (any callable
``(binary_img, cfg) -> mask`` works, so a real model UDF can replace it).

Algorithm (classic projection-profile table segmentation):
1. ink = binarized page (black < 128)
2. vertical grid lines = columns whose ink covers >= ``seg_line_min_frac``
   of the page height; adjacent line columns are clustered
3. the x-ranges between consecutive line clusters are column bands;
   band index = class id (left-to-right), at most 5 bands
4. within each band (inset by ``seg_line_margin`` so border lines never
   leak in), the horizontal ink projection profile is computed; runs of
   ink rows (with sub-``seg_close_h`` gaps closed) are text lines, and
   each line is emitted as a SOLID rectangle spanning the line's ink
   columns — the model-like dense cell regions the reference
   post-processing chain expects (solid regions survive the erode step
   without fragmenting, like DeepLabV3's filled semantic masks)
5. rectangle pixels get the band's class id; everything else is background.

Degenerate input (blank page, < 2 lines) -> all-background mask, matching
the reference's blank-page behavior of producing no regions
(scripts/dataset.py:21-23 + empty regionprops downstream).
"""

from __future__ import annotations

import numpy as np

from ..config import ExtractConfig


def _cluster_columns(cols: np.ndarray) -> list[tuple[int, int]]:
    """Group sorted column indices into [start, end] clusters (gap <= 1)."""
    if cols.size == 0:
        return []
    clusters = []
    start = prev = int(cols[0])
    for c in cols[1:]:
        c = int(c)
        if c - prev <= 1:
            prev = c
        else:
            clusters.append((start, prev))
            start = prev = c
    clusters.append((start, prev))
    return clusters


def _row_runs(row_has_ink: np.ndarray, max_gap: int) -> list[tuple[int, int]]:
    """[start, end) runs of True rows, with gaps <= max_gap closed."""
    rows = np.where(row_has_ink)[0]
    if rows.size == 0:
        return []
    runs = []
    start = prev = int(rows[0])
    for r in rows[1:]:
        r = int(r)
        if r - prev <= max_gap:
            prev = r
        else:
            runs.append((start, prev + 1))
            start = prev = r
    runs.append((start, prev + 1))
    return runs


def segment_page(binary_img: np.ndarray, cfg: ExtractConfig) -> np.ndarray:
    """Binary (resized, preprocessed) page -> class mask with 0..4 + bg 5."""
    h, w = binary_img.shape
    mask = np.full((h, w), cfg.background_class, dtype=np.uint8)
    ink = binary_img < 128
    if not ink.any():
        return mask

    col_ink = ink.sum(axis=0)
    line_cols = np.where(col_ink >= cfg.seg_line_min_frac * h)[0]
    clusters = _cluster_columns(line_cols)
    if len(clusters) < 2:
        return mask

    n_bands = min(len(clusters) - 1, cfg.n_content_classes)
    for band in range(n_bands):
        x_start = clusters[band][1] + 1 + cfg.seg_line_margin
        x_end = clusters[band + 1][0] - cfg.seg_line_margin
        if x_end <= x_start:
            continue
        band_ink = ink[:, x_start:x_end]
        if not band_ink.any():
            continue
        for r0, r1 in _row_runs(band_ink.any(axis=1), cfg.seg_close_h - 1):
            cols = np.where(band_ink[r0:r1].any(axis=0))[0]
            if cols.size == 0:
                continue
            mask[r0:r1, x_start + int(cols[0]) : x_start + int(cols[-1]) + 1] = band
    return mask
