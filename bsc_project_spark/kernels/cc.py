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
    _labels: np.ndarray  # full labels array (shared, not copied)
    _slices: tuple

    @property
    def image(self) -> np.ndarray:
        """Boolean image cropped to bbox (skimage region.image); computed
        lazily on the bbox window only."""
        return self._labels[self._slices] == self.label


def _all_runs(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized run extraction over the whole image.

    Returns (rows, col_starts, col_ends) of every horizontal True-run in
    raster order (a guard column of False separates rows in the flattened
    view, so no run crosses a row boundary).
    """
    h, w = mask.shape
    g = np.zeros((h, w + 1), dtype=bool)
    g[:, :w] = mask
    flat = g.ravel()
    d = np.diff(flat.view(np.int8))
    starts = np.where(d == 1)[0] + 1
    ends = np.where(d == -1)[0] + 1
    if flat[0]:
        starts = np.concatenate(([0], starts))
    # guard column guarantees every run closes before the row ends
    rows = starts // (w + 1)
    return rows, starts - rows * (w + 1), ends - rows * (w + 1)


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
    Component ids are 1..n in raster order of first pixel.  Run-based
    union-find: vectorized run extraction, Python only over runs.
    """
    mask = np.asarray(mask, dtype=bool)
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    rows, starts, ends = _all_runs(mask)
    n_runs = len(rows)
    if n_runs == 0:
        return labels, 0

    uf = _UnionFind()
    run_sets = [uf.make() for _ in range(n_runs)]
    rows_l = rows.tolist()
    starts_l = starts.tolist()
    ends_l = ends.tolist()

    # group runs into per-row blocks (runs are in raster order)
    blocks: list[tuple[int, int, int]] = []  # (y, lo, hi)
    lo = 0
    for i in range(1, n_runs + 1):
        if i == n_runs or rows_l[i] != rows_l[lo]:
            blocks.append((rows_l[lo], lo, i))
            lo = i

    prev_y, prev_lo, prev_hi = -2, 0, 0
    for y, blo, bhi in blocks:
        if prev_y == y - 1:
            for i in range(blo, bhi):
                s, e = starts_l[i], ends_l[i]
                # 8-connectivity: previous-row runs extended by 1 column
                for j in range(prev_lo, prev_hi):
                    if starts_l[j] - 1 < e and ends_l[j] + 1 > s:
                        uf.union(run_sets[i], run_sets[j])
        prev_y, prev_lo, prev_hi = y, blo, bhi

    # resolve roots -> compact labels in raster order of first appearance
    root_to_label: dict[int, int] = {}
    next_label = 1
    for i in range(n_runs):
        root = uf.find(run_sets[i])
        lbl = root_to_label.get(root)
        if lbl is None:
            lbl = next_label
            root_to_label[root] = lbl
            next_label += 1
        labels[rows_l[i], starts_l[i] : ends_l[i]] = lbl
    return labels, next_label - 1


def multiclass_regions(
    mask: np.ndarray, class_lo: int, class_hi: int
) -> dict[int, list[tuple[int, int, int, int, int]]]:
    """Per-class 8-connected components in ONE image pass.

    Returns {class_id: [(y0, x0, y1, x1, area), ...]} for classes in
    [class_lo, class_hi) — bbox in regionprops convention (half-open).
    Component ORDER within a class is unspecified (raster order of root
    runs in practice); use only where downstream is order-independent
    (bbox fills of a single value, or an explicit sort).  Replaces
    per-class `mask == c` + label() + regionprops() sweeps — one run
    extraction over the whole mask instead of one full-image pass per
    class."""
    h, w = mask.shape
    flat = mask.ravel()
    out: dict[int, list[tuple[int, int, int, int, int]]] = {
        c: [] for c in range(class_lo, class_hi)
    }
    if flat.size == 0:
        return out
    pos = np.arange(1, flat.size)
    change = np.nonzero((flat[1:] != flat[:-1]) | (pos % w == 0))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [flat.size]))
    vals = flat[starts]
    keep = (vals >= class_lo) & (vals < class_hi)
    starts, ends, vals = starts[keep], ends[keep], vals[keep]
    n_runs = len(starts)
    if n_runs == 0:
        return out
    rows = (starts // w).tolist()
    s_col = (starts - np.asarray(rows) * w).tolist()
    e_col = (ends - np.asarray(rows) * w).tolist()
    vals_l = vals.tolist()

    uf = _UnionFind()
    run_sets = [uf.make() for _ in range(n_runs)]
    blocks: list[tuple[int, int, int]] = []
    lo = 0
    for i in range(1, n_runs + 1):
        if i == n_runs or rows[i] != rows[lo]:
            blocks.append((rows[lo], lo, i))
            lo = i
    prev_y, prev_lo, prev_hi = -2, 0, 0
    for y, blo, bhi in blocks:
        if prev_y == y - 1:
            for i in range(blo, bhi):
                s, e, v = s_col[i], e_col[i], vals_l[i]
                for j in range(prev_lo, prev_hi):
                    if vals_l[j] == v and s_col[j] - 1 < e and e_col[j] + 1 > s:
                        uf.union(run_sets[i], run_sets[j])
        prev_y, prev_lo, prev_hi = y, blo, bhi

    # aggregate bbox + area per root
    agg: dict[int, list[int]] = {}  # root -> [y0, x0, y1, x1, area, class]
    for i in range(n_runs):
        r = uf.find(run_sets[i])
        y, s, e = rows[i], s_col[i], e_col[i]
        a = agg.get(r)
        if a is None:
            agg[r] = [y, s, y + 1, e, e - s, vals_l[i]]
        else:
            if s < a[1]:
                a[1] = s
            if y + 1 > a[2]:
                a[2] = y + 1
            if e > a[3]:
                a[3] = e
            a[4] += e - s
    for y0, x0, y1, x1, area, v in agg.values():
        out[v].append((y0, x0, y1, x1, area))
    return out


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
        regions.append(
            Region(
                label=lbl,
                bbox=(y0, x0, y1, x1),
                area=int(hi - lo),
                _labels=labels,
                _slices=(slice(y0, y1), slice(x0, x1)),
            )
        )
    return regions
