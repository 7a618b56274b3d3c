"""Row-major run-length encoding for class masks (FIXTURES.md §5).

The post-processed segmentation mask (post_process_mask, reference
scripts/post_process.py:176-195) is rectangle-dominated — long constant
runs — so RLE stores a 1536x1024 page in a few hundred (class, run)
pairs.  Used for golden-mask regression fixtures and as the compact wire
format when the pipeline emits masks for segmentation-quality audits
(a full uint8 mask per page would dwarf the PNG it came from).
"""

from __future__ import annotations

import numpy as np


def mask_to_rle(mask: np.ndarray) -> list[tuple[int, int]]:
    """Encode a 2-D integer mask as row-major (class, run) pairs.
    Runs may cross row boundaries (pure flat-order RLE)."""
    flat = np.ascontiguousarray(mask).ravel()
    if flat.size == 0:
        return []
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [flat.size]))
    return [(int(flat[s]), int(e - s)) for s, e in zip(starts, ends)]


def rle_to_mask(rle: list[tuple[int, int]], h: int, w: int, dtype=np.uint8) -> np.ndarray:
    """Decode (class, run) pairs back to an (h, w) mask."""
    total = sum(r for _, r in rle)
    if total != h * w:
        raise ValueError(f"RLE covers {total} px, mask needs {h * w}")
    flat = np.empty(h * w, dtype=dtype)
    pos = 0
    for cls, run in rle:
        flat[pos : pos + run] = cls
        pos += run
    return flat.reshape(h, w)
