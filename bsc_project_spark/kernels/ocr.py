"""OCR kernels: crop extraction, padding, deterministic glyph decode.

Replaces the reference's TrOCR decode (reference scripts/imgs2csv.py:156-184,
204-222) with a deterministic template-matching decoder over the engine's
glyph atlas (kernels/font.py).  The reference's decode is stochastic
(do_sample=True, scripts/imgs2csv.py:166); this engine pins deterministic
decoding (SURVEY.md K20) — the correctness contract is exact span equality
against golden transcripts.

Decode algorithm (pure numpy, exact on fixture renders, tolerant of the
1-2 px bbox clipping the erode step introduces):
1. binarize the crop (< ocr_ink_threshold)
2. split ink columns into glyph segments at gaps >= ~half the glyph scale
3. align a (GLYPH_W x GLYPH_H) sampling grid over each segment by searching
   the sub-scale offset that best explains the ink; majority-vote each
   scale x scale block into a font-pixel bitmap
4. match the column-trimmed bitmap against the column-trimmed atlas —
   exact match preferred, else minimum Hamming distance (ties broken by
   codepoint order; fully deterministic).
"""

from __future__ import annotations

import numpy as np

from ..config import ExtractConfig
from .font import GLYPH_H, GLYPH_W, trimmed_atlas

_TRIMMED = trimmed_atlas()
_CHARS = sorted(_TRIMMED.keys())

# Stacked, zero-padded atlas for vectorized Hamming matching.  Padding both
# pattern and reference to the SAME (GLYPH_H, GLYPH_W) frame yields exactly
# the pad-to-common-size distance (extra cells are False on both sides).
_ATLAS_FULL = np.zeros((len(_CHARS), GLYPH_H, GLYPH_W), dtype=bool)
_ATLAS_PART = np.zeros((len(_CHARS), GLYPH_H, GLYPH_W), dtype=bool)
for _i, _ch in enumerate(_CHARS):
    _bm = _TRIMMED[_ch]
    _ATLAS_FULL[_i, : _bm.shape[0], : _bm.shape[1]] = _bm
    _rows = np.where(_bm.any(axis=1))[0]
    _t = _bm[_rows[0] : _rows[-1] + 1]
    _ATLAS_PART[_i, : _t.shape[0], : _t.shape[1]] = _t


def crop_cell(gray: np.ndarray, x1: int, y1: int, x2: int, y2: int) -> np.ndarray:
    """Crop [y1:y2, x1:x2] from the ORIGINAL grayscale page (the reference
    crops the original image, not the preprocessed one —
    scripts/imgs2csv.py:157), clamped to bounds."""
    h, w = gray.shape
    x1c, x2c = max(0, x1), min(w, x2)
    y1c, y2c = max(0, y1), min(h, y2)
    if x2c <= x1c or y2c <= y1c:
        return np.full((1, 1), 255, dtype=np.uint8)
    return gray[y1c:y2c, x1c:x2c]


def pad_for_ocr(crop: np.ndarray, min_size: int = 32) -> np.ndarray:
    """Pad with white to at least min_size x min_size, image kept at the
    top-left corner (reference scripts/imgs2csv.py:204-222 pastes at (0,0))."""
    h, w = crop.shape
    if h >= min_size and w >= min_size:
        return crop
    out = np.full((max(h, min_size), max(w, min_size)), 255, dtype=np.uint8)
    out[:h, :w] = crop
    return out


def _segments_from_columns(ink: np.ndarray, gap_min: int) -> list[tuple[int, int]]:
    """[(x_start, x_end)) glyph segments from per-column ink presence."""
    col_has = ink.any(axis=0)
    cols = np.where(col_has)[0]
    if cols.size == 0:
        return []
    segments = []
    start = prev = int(cols[0])
    for c in cols[1:]:
        c = int(c)
        if c - prev >= gap_min:
            segments.append((start, prev + 1))
            start = c
        prev = c
    segments.append((start, prev + 1))
    return segments


def _integral(ink: np.ndarray) -> np.ndarray:
    """(H+1, W+1) integral image of a boolean mask."""
    h, w = ink.shape
    out = np.zeros((h + 1, w + 1), dtype=np.int32)
    np.cumsum(np.cumsum(ink, axis=0), axis=1, out=out[1:, 1:])
    return out


def _sample_bitmap(
    integral: np.ndarray, y0: int, x0: int, scale: int, n_rows: int, n_cols: int
) -> np.ndarray:
    """Majority-vote scale x scale blocks into an n_rows x n_cols bitmap
    (visible-area majority at crop edges), via the integral image."""
    h, w = integral.shape[0] - 1, integral.shape[1] - 1
    ys = np.clip(y0 + np.arange(n_rows + 1) * scale, 0, h)
    xs = np.clip(x0 + np.arange(n_cols + 1) * scale, 0, w)
    s = integral[np.ix_(ys, xs)]
    block = s[1:, 1:] - s[:-1, 1:] - s[1:, :-1] + s[:-1, :-1]
    area = np.outer(np.diff(ys), np.diff(xs))
    return block * 2 >= np.maximum(area, 1)


def _trim_cols(bitmap: np.ndarray) -> np.ndarray:
    used = np.where(bitmap.any(axis=0))[0]
    if used.size == 0:
        return bitmap[:, :0]
    return bitmap[:, used[0] : used[-1] + 1]


def _pad_to(a: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.zeros((h, w), dtype=bool)
    out[: a.shape[0], : a.shape[1]] = a
    return out


def _match_stack(t: np.ndarray, stack: np.ndarray) -> tuple[str, int]:
    p = _pad_to(t, GLYPH_H, GLYPH_W)
    dists = np.count_nonzero(p[None, :, :] ^ stack, axis=(1, 2))
    i = int(np.argmin(dists))  # ties: first in sorted char order (deterministic)
    return _CHARS[i], int(dists[i])


def _match_char(bitmap: np.ndarray) -> tuple[str, int]:
    """(char, hamming distance) for the best atlas match, column-trimmed,
    row positions kept (distinguishes '.' from '-'); deterministic."""
    return _match_stack(_trim_cols(bitmap), _ATLAS_FULL)


def _trim_rows_cols(bitmap: np.ndarray) -> np.ndarray:
    rows = np.where(bitmap.any(axis=1))[0]
    cols = np.where(bitmap.any(axis=0))[0]
    if rows.size == 0 or cols.size == 0:
        return bitmap[:0, :0]
    return bitmap[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]


def _match_char_partial(bitmap: np.ndarray) -> tuple[str, int]:
    """Fully-trimmed match for partial-height content (e.g. '.'-only cells,
    where no full-height glyph anchors the line top)."""
    return _match_stack(_trim_rows_cols(bitmap), _ATLAS_PART)


def _decode_at_scale_ref(
    ink: np.ndarray, scale: int, ink_top: int, ink_height: int,
    integral: np.ndarray | None = None,
) -> tuple[str, int]:
    """Reference (sequential) decode — kept as the parity oracle for the
    vectorized _decode_at_scale; same result, offset loop in Python."""
    if integral is None:
        integral = _integral(ink)
    full_height = ink_height >= 0.75 * GLYPH_H * scale
    gap_min = max(2, scale // 2 + 1)
    chars = []
    total = 0
    for xs, xe in _segments_from_columns(ink, gap_min):
        seg_width = xe - xs
        n_cols = min(GLYPH_W, max(1, int(np.ceil(seg_width / scale))))
        if full_height:
            anchor = ink_top
            n_rows = GLYPH_H
            matcher = _match_char
        else:
            seg_rows = np.where(ink[:, xs:xe].any(axis=1))[0]
            anchor = int(seg_rows[0])
            n_rows = min(GLYPH_H, max(1, int(np.ceil((seg_rows[-1] - seg_rows[0] + 1) / scale))))
            matcher = _match_char_partial
        best_char, best_dist = "", 1 << 30
        for dy in range(scale):
            for dx in range(scale):
                bm = _sample_bitmap(integral, anchor - dy, xs - dx, scale, n_rows, n_cols)
                ch, dist = matcher(bm)
                if dist < best_dist:
                    best_char, best_dist = ch, dist
                if best_dist == 0:
                    break
            if best_dist == 0:
                break
        chars.append(best_char)
        total += best_dist
    return "".join(chars), total


def _sample_bitmaps_batch(
    integral: np.ndarray, anchor: int, x0: int, scale: int, n_rows: int, n_cols: int
) -> np.ndarray:
    """All scale x scale sub-pixel offsets at once: (scale*scale, n_rows,
    n_cols) bool bitmaps, offset index = dy * scale + dx (dy-major — the
    same order the sequential reference scans, so first-argmin tie-breaks
    agree)."""
    h, w = integral.shape[0] - 1, integral.shape[1] - 1
    dy = np.arange(scale)
    dx = np.arange(scale)
    ys = np.clip(anchor - dy[:, None] + np.arange(n_rows + 1) * scale, 0, h)  # (s, R+1)
    xs = np.clip(x0 - dx[:, None] + np.arange(n_cols + 1) * scale, 0, w)      # (s, C+1)
    s4 = integral[ys[:, None, :, None], xs[None, :, None, :]]  # (s, s, R+1, C+1)
    block = s4[:, :, 1:, 1:] - s4[:, :, :-1, 1:] - s4[:, :, 1:, :-1] + s4[:, :, :-1, :-1]
    area_y = np.diff(ys, axis=1)  # (s, R)
    area_x = np.diff(xs, axis=1)  # (s, C)
    area = area_y[:, None, :, None] * area_x[None, :, None, :]
    bm = block * 2 >= np.maximum(area, 1)
    return bm.reshape(scale * scale, n_rows, n_cols)


def _match_batch(bitmaps: np.ndarray, atlas: np.ndarray, trim_rows: bool) -> tuple[str, int]:
    """Best (char, dist) over a batch of offset bitmaps vs an atlas stack.
    Per offset the bitmap is trimmed (columns always, rows for the partial
    matcher) by SHIFTING into a zero frame — identical to pad(trim(bm)) —
    then all offsets match against all atlas glyphs in one xor."""
    n, R, C = bitmaps.shape
    frames = np.zeros((n, GLYPH_H, GLYPH_W), dtype=bool)
    col_any = bitmaps.any(axis=1)  # (n, C)
    row_any = bitmaps.any(axis=2)  # (n, R)
    for i in range(n):
        cols = np.nonzero(col_any[i])[0]
        if cols.size == 0:
            continue  # empty bitmap -> empty frame (matches trim-to-empty)
        c0, c1 = cols[0], cols[-1] + 1
        if trim_rows:
            rows = np.nonzero(row_any[i])[0]
            r0, r1 = rows[0], rows[-1] + 1
        else:
            r0, r1 = 0, min(R, GLYPH_H)
        frames[i, : r1 - r0, : c1 - c0] = bitmaps[i, r0:r1, c0 : c0 + min(c1 - c0, GLYPH_W)][
            :GLYPH_H, :GLYPH_W
        ]
    dists = np.count_nonzero(frames[:, None, :, :] ^ atlas[None, :, :, :], axis=(2, 3))
    ci = np.argmin(dists, axis=1)  # first-min per offset = sorted-char tie-break
    dmin = dists[np.arange(n), ci]
    oi = int(np.argmin(dmin))  # first offset achieving the global min =
    return _CHARS[int(ci[oi])], int(dmin[oi])  # the sequential scan's pick


def _decode_at_scale(
    ink: np.ndarray, scale: int, ink_top: int, ink_height: int,
    integral: np.ndarray | None = None,
) -> tuple[str, int]:
    """Decode all glyph segments at a fixed scale; returns (text, total_dist).
    Vectorized over the scale^2 sub-pixel offsets (parity with
    _decode_at_scale_ref pinned by a fuzz test)."""
    if integral is None:
        integral = _integral(ink)
    full_height = ink_height >= 0.75 * GLYPH_H * scale
    gap_min = max(2, scale // 2 + 1)
    chars = []
    total = 0
    for xs, xe in _segments_from_columns(ink, gap_min):
        seg_width = xe - xs
        n_cols = min(GLYPH_W, max(1, int(np.ceil(seg_width / scale))))
        if full_height:
            anchor = ink_top
            n_rows = GLYPH_H
            atlas, trim_rows = _ATLAS_FULL, False
        else:
            seg_rows = np.where(ink[:, xs:xe].any(axis=1))[0]
            anchor = int(seg_rows[0])
            n_rows = min(GLYPH_H, max(1, int(np.ceil((seg_rows[-1] - seg_rows[0] + 1) / scale))))
            atlas, trim_rows = _ATLAS_PART, True
        bms = _sample_bitmaps_batch(integral, anchor, xs, scale, n_rows, n_cols)
        best_char, best_dist = _match_batch(bms, atlas, trim_rows)
        chars.append(best_char)
        total += best_dist
    return "".join(chars), total


def decode_cell(crop: np.ndarray, cfg: ExtractConfig, scale: int | None = None) -> str:
    """Decode one cell crop into its text (deterministic).

    The crop's line height can be clipped a few pixels by the erode step
    (reference scripts/post_process.py:126 has the same effect on model
    regions), so the glyph scale is not read off the ink height directly:
    the decoder tries the nominal cfg scale plus clip-compensated estimates
    and keeps the decode with the lowest total template distance.
    """
    if scale is None:
        scale = cfg.ocr_glyph_scale
    ink = crop < cfg.ocr_ink_threshold
    if not ink.any():
        return ""
    rows = np.where(ink.any(axis=1))[0]
    ink_top = int(rows[0])
    ink_height = int(rows[-1]) - ink_top + 1
    candidates = [scale]
    for est in (
        int(round(ink_height / GLYPH_H)),
        int(round((ink_height + 5) / GLYPH_H)),
    ):
        if est >= 1 and est not in candidates:
            candidates.append(est)
    best_text, best_total = "", 1 << 30
    integral = _integral(ink)
    for s in candidates:
        text, total = _decode_at_scale(ink, s, ink_top, ink_height, integral)
        if total < best_total:
            best_text, best_total = text, total
        if best_total == 0:
            break
    return best_text
