"""Connected-component labeling + region properties, pure numpy.

Replaces skimage.measure.label / regionprops (used throughout the reference
post-processing: scripts/post_process.py:64,103,143,218) with a run-based
two-pass union-find.  8-connectivity (skimage's default connectivity=2 for
2-D), labels assigned in raster order of each component's first pixel —
matching skimage's observable labeling order so downstream sorts behave
identically.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Region:
    """Subset of skimage regionprops used by the pipeline.

    bbox is (min_row, min_col, max_row, max_col) — half-open, exactly
    skimage's convention (reference scripts/post_process.py:67 unpacks it as
    y_min, x_min, y_max, x_max).
    """

    label: int
    bbox: tuple[int, int, int, int]
    area: int
    _mask: np.ndarray  # full-size boolean mask reference
    _slices: tuple

    @property
    def image(self) -> np.ndarray:
        """Boolean image cropped to bbox (skimage region.image)."""
        return self._mask[self._slices]


def _runs_of_row(row: np.ndarray) -> list[tuple[int, int]]:
    """Return [start, end) runs of True in a 1-D boolean array."""
    if not row.any():
        return []
    d = np.diff(row.astype(np.int8))
    starts = list(np.where(d == 1)[0] + 1)
    ends = list(np.where(d == -1)[0] + 1)
    if row[0]:
        starts.insert(0, 0)
    if row[-1]:
        ends.append(len(row))
    return list(zip(starts, ends))


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: list[int] = []

    def make(self) -> int:
        self.parent.append(len(self.parent))
        return len(self.parent) - 1

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def label(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Label 8-connected components of a boolean mask.

    Returns (labels int32 HxW with 0 = background, num_components).
    Component ids are 1..n in raster order of first pixel.
    """
    mask = np.asarray(mask, dtype=bool)
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    uf = _UnionFind()
    prev_runs: list[tuple[int, int, int]] = []  # (start, end, set_id)
    run_rows: list[list[tuple[int, int, int]]] = []
    for y in range(h):
        cur_runs: list[tuple[int, int, int]] = []
        for s, e in _runs_of_row(mask[y]):
            sid = uf.make()
            # 8-connectivity: overlap with previous-row runs extended by 1
            for ps, pe, pid in prev_runs:
                if ps - 1 < e and pe + 1 > s:
                    uf.union(sid, pid)
            cur_runs.append((s, e, sid))
        run_rows.append(cur_runs)
        prev_runs = cur_runs

    # resolve roots -> compact labels in raster order of first appearance
    root_to_label: dict[int, int] = {}
    next_label = 1
    for y, runs in enumerate(run_rows):
        for s, e, sid in runs:
            root = uf.find(sid)
            lbl = root_to_label.get(root)
            if lbl is None:
                lbl = next_label
                root_to_label[root] = lbl
                next_label += 1
            labels[y, s:e] = lbl
    return labels, next_label - 1


def regionprops(labels: np.ndarray) -> list[Region]:
    """Bounding box + area per label, ordered by label id (skimage order)."""
    n = int(labels.max())
    if n == 0:
        return []
    flat = labels.ravel()
    nz = np.nonzero(flat)[0]
    if nz.size == 0:
        return []
    h, w = labels.shape
    ys, xs = np.divmod(nz, w)
    vals = flat[nz]
    order = np.argsort(vals, kind="stable")
    vals_s, ys_s, xs_s = vals[order], ys[order], xs[order]
    boundaries = np.searchsorted(vals_s, np.arange(1, n + 2))
    regions: list[Region] = []
    for lbl in range(1, n + 1):
        lo, hi = boundaries[lbl - 1], boundaries[lbl]
        if lo == hi:
            continue
        ry, rx = ys_s[lo:hi], xs_s[lo:hi]
        y0, y1 = int(ry.min()), int(ry.max()) + 1
        x0, x1 = int(rx.min()), int(rx.max()) + 1
        mask = labels == lbl
        regions.append(
            Region(
                label=lbl,
                bbox=(y0, x0, y1, x1),
                area=int(hi - lo),
                _mask=mask,
                _slices=(slice(y0, y1), slice(x0, x1)),
            )
        )
    return regions
