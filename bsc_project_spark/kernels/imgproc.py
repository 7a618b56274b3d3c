"""Pure-numpy image-processing kernels (preprocessing stage).

Re-implements, from scratch and without OpenCV, the operations the reference
preprocessing uses (reference scripts/dataset.py:8-57):

- 3x3 Gaussian blur               (cv2.GaussianBlur(img,(3,3),0))
- adaptive Gaussian threshold      (cv2.adaptiveThreshold, blockSize, C)
- binary morphology (erode/dilate/open/close) with rect kernels
- vertical-line margin detection + whiteout
- INTER_AREA-style integer-factor downsample

Semantics notes (our engine's pinned definitions; deterministic):
- Gaussian 3x3 with sigma=0 uses OpenCV's fixed small kernel [1,2,1]/4,
  reflect-101 border, round-half-to-even.
- Adaptive threshold: 13-tap Gaussian-weighted local mean (sigma =
  0.3*((bs-1)*0.5 - 1) + 0.8, OpenCV's formula), replicate border, mean
  rounded to uint8, then out = 255 where src > mean - C else 0.
- Morphology on uint8 {0,255} images: erode = min-filter (border=255),
  dilate = max-filter (border=0); OPEN with iterations=k = k erosions then
  k dilations (matches cv2.morphologyEx semantics used at
  reference scripts/dataset.py:46-47); CLOSE = dilations then erosions.
"""

from __future__ import annotations

import numpy as np

from ..config import ExtractConfig


# ---------------------------------------------------------------------------
# Convolution helpers
# ---------------------------------------------------------------------------

def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """OpenCV-compatible 1-D Gaussian kernel.

    For sigma <= 0 OpenCV uses fixed small kernels for ksize <= 7
    ([1,2,1]/4 for ksize=3); otherwise sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8.
    """
    if sigma <= 0:
        fixed = {
            1: np.array([1.0]),
            3: np.array([0.25, 0.5, 0.25]),
            5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
            7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
        }
        if ksize in fixed:
            return fixed[ksize]
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x**2) / (2.0 * sigma * sigma))
    return k / k.sum()


def _pad(img: np.ndarray, ry: int, rx: int, mode: str) -> np.ndarray:
    if mode == "reflect101":
        return np.pad(img, ((ry, ry), (rx, rx)), mode="reflect")
    if mode == "replicate":
        return np.pad(img, ((ry, ry), (rx, rx)), mode="edge")
    raise ValueError(mode)


def _sepconv(img: np.ndarray, kernel: np.ndarray, border: str) -> np.ndarray:
    """Separable 2-D convolution with the same 1-D kernel on both axes.

    float32 accumulation: kernel weights are normalized and inputs are
    uint8, so the result lies in [0, 255] with error << 0.5 ULP of the
    final uint8 rounding.
    """
    k = kernel.astype(np.float32)
    r = len(k) // 2
    padded = _pad(img.astype(np.float32), r, r, border)
    # vertical pass
    h = img.shape[0]
    tmp = k[0] * padded[0:h, :]
    for i in range(1, len(k)):
        tmp += k[i] * padded[i : i + h, :]
    # horizontal pass
    w = img.shape[1]
    out = k[0] * tmp[:, 0:w]
    for i in range(1, len(k)):
        out += k[i] * tmp[:, i : i + w]
    return out


def gaussian_blur3(img: np.ndarray) -> np.ndarray:
    """3x3 Gaussian blur, sigma auto (reference scripts/dataset.py:35).

    Exact integer path for the fixed [1,2,1]/4 kernel: per axis
    out = (a + 2b + c + rounding) with a single >> 4 at the end
    (round-half-up of the exact /16 value; deterministic pinned semantics).
    """
    p = _pad(img.astype(np.uint16), 1, 1, "reflect101")
    h, w = img.shape
    tmp = p[0 : h, :] + 2 * p[1 : h + 1, :] + p[2 : h + 2, :]          # <= 1020
    out = tmp[:, 0:w] + 2 * tmp[:, 1 : w + 1] + tmp[:, 2 : w + 2]      # <= 4080
    return ((out + 8) >> 4).astype(np.uint8)


def gaussian_smooth_1d(profile: np.ndarray, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """1-D Gaussian smoothing with 'nearest' boundary.

    Stand-in for skimage.filters.gaussian on a 1-D profile (reference
    scripts/post_process.py:75); radius = int(truncate * sigma + 0.5).
    """
    p = np.asarray(profile, dtype=np.float64)
    if p.size == 0:
        return p
    radius = max(1, int(truncate * float(sigma) + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2.0 * sigma * sigma))
    k /= k.sum()
    padded = np.pad(p, radius, mode="edge")
    return np.convolve(padded, k, mode="valid")


# ---------------------------------------------------------------------------
# Binarization
# ---------------------------------------------------------------------------

def adaptive_threshold_gaussian(
    img: np.ndarray, block_size: int = 13, c: float = 12.0, maxval: int = 255
) -> np.ndarray:
    """Adaptive Gaussian threshold, THRESH_BINARY.

    out[y,x] = maxval if img[y,x] > mean[y,x] - C else 0, where mean is the
    Gaussian-weighted blockSize x blockSize local mean rounded to uint8
    (reference scripts/dataset.py:36-43 uses cv2.adaptiveThreshold with
    ADAPTIVE_THRESH_GAUSSIAN_C, blockSize=13, C=12).

    Computed in cache-resident row strips (the full-image float temporaries
    of a naive separable convolution are what saturate memory bandwidth
    when 32 executor workers run concurrently).
    """
    sigma = 0.3 * ((block_size - 1) * 0.5 - 1) + 0.8
    k = _gaussian_kernel_1d(block_size, sigma).astype(np.float32)
    r = block_size // 2
    h, w = img.shape
    padded = _pad(img, r, r, "replicate")  # uint8, cheap
    out = np.empty((h, w), dtype=np.uint8)
    strip = max(32, (1 << 17) // (4 * (w + 2 * r)))  # ~128 KB float32 strip:
    # fits per-core L2 even with 32 concurrent workers (1 MB strips won
    # benchmarks single-process but lose ~20% under full-width contention)
    thr_c = np.float32(c)
    for y0 in range(0, h, strip):
        y1 = min(h, y0 + strip)
        sub = padded[y0 : y1 + 2 * r].astype(np.float32)
        n = y1 - y0
        tmp = _sep_gauss_vertical(sub, k, n)
        acc = _sep_gauss_horizontal(tmp, k, w)
        np.rint(acc, out=acc)  # mean of uint8: already in [0,255]
        acc -= thr_c
        out[y0:y1] = np.where(img[y0:y1] > acc, np.uint8(maxval), np.uint8(0))
    return out


def _sep_gauss_vertical(sub: np.ndarray, k: np.ndarray, n: int) -> np.ndarray:
    """Vertical pass of the separable Gaussian over strip rows.

    Exploits kernel symmetry (k[i] == k[L-1-i]): each mirrored tap pair is
    added first, then scaled once — half the multiply-add sweeps of the
    naive tap loop, which matters because these float32 sweeps are the
    dominant DRAM traffic of the whole page pipeline.  MUST stay
    op-for-op identical to _sep_gauss_horizontal's order: binarize_fused
    and adaptive_threshold_gaussian both route through these helpers, and
    the fused==two-step byte-parity test pins the summation order.
    """
    L = len(k)
    r = L // 2
    tmp = k[r] * sub[r : r + n]
    buf = np.empty_like(tmp)
    for i in range(r):
        np.add(sub[i : i + n], sub[L - 1 - i : L - 1 - i + n], out=buf)
        buf *= k[i]
        tmp += buf
    return tmp


def _sep_gauss_horizontal(tmp: np.ndarray, k: np.ndarray, w: int) -> np.ndarray:
    L = len(k)
    r = L // 2
    acc = k[r] * tmp[:, r : r + w]
    buf = np.empty_like(acc)
    for i in range(r):
        np.add(tmp[:, i : i + w], tmp[:, L - 1 - i : L - 1 - i + w], out=buf)
        buf *= k[i]
        acc += buf
    return acc


def estimate_skew(binary: np.ndarray, max_angle_deg: float = 2.0, steps: int = 21) -> float:
    """Estimate small page skew (degrees) by maximizing the variance of the
    horizontal ink projection over candidate shear angles.

    Classical deskew (the north-star's 'deskew' step): text lines are
    horizontal runs, so the row-ink histogram is sharpest (max variance)
    when the shear cancels the skew.  Works on the binarized page; columns
    are shifted by round(tan(angle) * x) — exact for the small angles
    scanned pages exhibit.
    """
    ink = binary < 128
    h, w = ink.shape
    if not ink.any():
        return 0.0
    col_ink = ink.sum(axis=0).astype(np.float64)
    xs = np.arange(w)
    # One FIXED histogram length for every candidate (padded to the global
    # max shift): a per-angle length would dilute each candidate's variance
    # by a different number of zero bins, making scores incomparable and
    # biasing the argmax toward small angles.
    base = int(np.rint(np.tan(np.deg2rad(max_angle_deg)) * (w - 1)))
    best_angle, best_score = 0.0, -1.0
    for angle in np.linspace(-max_angle_deg, max_angle_deg, steps):
        shift = np.rint(np.tan(np.deg2rad(angle)) * xs).astype(np.int64)
        # histogram of (row + shift[col]) over ink pixels, computed
        # column-wise: rows of column x land in bins rows+shift[x]
        profile = np.zeros(h + 2 * base + 1, dtype=np.float64)
        for x in np.nonzero(col_ink)[0]:
            rows = np.nonzero(ink[:, x])[0]
            np.add.at(profile, rows + shift[x] + base, 1.0)
        score = float(profile.var())
        if score > best_score:
            best_score, best_angle = score, float(angle)
    return best_angle


def deskew_gray(gray: np.ndarray, cfg: ExtractConfig) -> np.ndarray:
    """Deskew the GRAY page (when cfg.deskew_enabled): estimate the skew on
    a binarized view, cancel it on the gray source.

    Must run on the gray page, before everything else: bboxes are computed
    in deskewed mask space but OCR crops slice the gray page
    (kernels/golden.extract_page), so deskewing only the binarized/mask
    path would misalign crops by tan(angle)*x pixels — more than a row
    height at page width for a 1-degree skew."""
    if not cfg.deskew_enabled:
        return gray
    binary = binarize_fused(gray, cfg.adaptive_block_size, cfg.adaptive_c)
    angle = estimate_skew(binary, cfg.deskew_max_angle)
    return deskew(gray, -angle) if angle else gray


def deskew(img: np.ndarray, angle_deg: float, fill: int = 255) -> np.ndarray:
    """Cancel a small skew by vertical column shear (round(tan(a) * x))."""
    if angle_deg == 0.0:
        return img
    h, w = img.shape
    shift = np.rint(np.tan(np.deg2rad(angle_deg)) * np.arange(w)).astype(np.int64)
    out = np.full_like(img, fill)
    for s in np.unique(shift):
        cols = shift == s
        s = int(s)
        if s == 0:
            out[:, cols] = img[:, cols]
        elif s > 0:
            out[: h - s, cols] = img[s:, cols]
        else:
            out[-s:, cols] = img[: h + s, cols]
    return out


def binarize_fused(img: np.ndarray, block_size: int = 13, c: float = 12.0) -> np.ndarray:
    """blur3 + adaptive Gaussian threshold in ONE strip pass — byte-identical
    to adaptive_threshold_gaussian(gaussian_blur3(img)), but the blurred
    image never materializes (memory-bandwidth is the scaling limiter with
    32 concurrent executor workers)."""
    sigma = 0.3 * ((block_size - 1) * 0.5 - 1) + 0.8
    k = _gaussian_kernel_1d(block_size, sigma).astype(np.float32)
    r = block_size // 2
    h, w = img.shape
    # reflect-101 halo for the blur, then replicate halo for the mean conv
    # (replicate of the *blurred* image == blurring a replicate-extended
    # image does NOT hold at edges, so build the blurred halo explicitly:
    # blur the reflect-101-padded raw, then edge-replicate the result)
    # keep the padded source uint8: each strip upcasts its own slice in
    # L2, so DRAM reads the page once at 1 byte/px instead of 2
    raw = _pad(img, 1, 1, "reflect101")
    out = np.empty((h, w), dtype=np.uint8)
    strip = max(32, (1 << 17) // (4 * (w + 2 * r)))  # 128 KB: see adaptive_threshold_gaussian
    thr_c = np.float32(c)
    L = block_size
    W = w + 2 * r
    # Preallocated per-image buffers, reused by every strip (all L2-scale).
    # The strip loop runs ~h/15 times on a full page, so per-strip np.pad
    # calls and fresh temporaries were a measurable constant cost; every op
    # below writes into one of these with out=.  The SUMMATION ORDER is
    # op-for-op the _sep_gauss_vertical/_sep_gauss_horizontal order — the
    # fused==two-step parity test pins it.
    sub = np.empty((strip + 2 * r, W), np.float32)   # blurred rows + halos
    t16a = np.empty((strip + 2 * r, w + 2), np.uint16)
    t16b = np.empty((strip + 2 * r, w), np.uint16)
    vtmp = np.empty((strip, W), np.float32)
    vbuf = np.empty((strip, W), np.float32)
    hacc = np.empty((strip, w), np.float32)
    hbuf = np.empty((strip, w), np.float32)

    for y0 in range(0, h, strip):
        y1 = min(h, y0 + strip)
        n = y1 - y0
        # blur3 of rows [y0-r, y1+r), edge-replicated into sub
        # (reflect-101 halo for the blur itself via `raw`; replicate halo
        # for the mean conv — blurring a replicate-extended image does NOT
        # equal replicating the blurred image at edges, so the blurred
        # halo is built explicitly)
        ya = y0 - r
        y0c, y1c = max(0, ya), min(h, y1 + r)
        m = y1c - y0c
        p = raw[y0c : y1c + 2]
        ta = t16a[:m]
        np.add(p[0:m], p[2 : m + 2], out=ta, dtype=np.uint16)
        np.add(ta, p[1 : m + 1], out=ta, dtype=np.uint16)
        np.add(ta, p[1 : m + 1], out=ta, dtype=np.uint16)
        tb = t16b[:m]
        np.add(ta[:, 0:w], ta[:, 2 : w + 2], out=tb)
        np.add(tb, ta[:, 1 : w + 1], out=tb)
        np.add(tb, ta[:, 1 : w + 1], out=tb)
        tb += 8
        tb >>= 4
        off = y0c - ya
        np.copyto(sub[off : off + m, r : r + w], tb)
        sub[off : off + m, :r] = sub[off : off + m, r : r + 1]
        sub[off : off + m, r + w :] = sub[off : off + m, r + w - 1 : r + w]
        if off:
            sub[:off] = sub[off]
        tail = n + 2 * r - (off + m)
        if tail:
            sub[off + m : n + 2 * r] = sub[off + m - 1]
        # vertical then horizontal Gaussian (symmetric-tap pairing)
        vt = vtmp[:n]
        np.multiply(sub[r : r + n], k[r], out=vt)
        vb = vbuf[:n]
        for i in range(r):
            np.add(sub[i : i + n], sub[L - 1 - i : L - 1 - i + n], out=vb)
            vb *= k[i]
            vt += vb
        ha = hacc[:n]
        np.multiply(vt[:, r : r + w], k[r], out=ha)
        hb = hbuf[:n]
        for i in range(r):
            np.add(vt[:, i : i + w], vt[:, L - 1 - i : L - 1 - i + w], out=hb)
            hb *= k[i]
            ha += hb
        np.rint(ha, out=ha)
        ha -= thr_c
        # compare against the BLURRED pixel (reference thresholds the
        # blurred image, scripts/dataset.py:35-43)
        out[y0:y1] = np.where(sub[r : r + n, r : r + w] > ha, np.uint8(255), np.uint8(0))
    return out


def otsu_threshold(img: np.ndarray, maxval: int = 255) -> np.ndarray:
    """Global Otsu binarization (robustness variant; not used in the
    reference-parity path, which is pinned to adaptive Gaussian)."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    omega = np.cumsum(hist) / total
    mu = np.cumsum(hist * np.arange(256)) / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(denom > 0, (mu_t * omega - mu) ** 2 / denom, 0.0)
    t = int(np.argmax(sigma_b))
    return np.where(img > t, maxval, 0).astype(np.uint8)


def sauvola_threshold(img: np.ndarray, window: int = 25, k: float = 0.2, r: float = 128.0) -> np.ndarray:
    """Sauvola local binarization (robustness variant)."""
    f = img.astype(np.float64)
    box = np.ones(window, dtype=np.float64) / window
    mean = _sepconv(f, box, "replicate")
    mean_sq = _sepconv(f * f, box, "replicate")
    std = np.sqrt(np.maximum(mean_sq - mean * mean, 0.0))
    thresh = mean * (1.0 + k * (std / r - 1.0))
    return np.where(f > thresh, 255, 0).astype(np.uint8)


# ---------------------------------------------------------------------------
# Morphology (binary uint8 {0,255}; rect kernels)
# ---------------------------------------------------------------------------

def _minmax_filter_1d(img: np.ndarray, size: int, axis: int, is_min: bool, pad_value: int) -> np.ndarray:
    if size <= 1:
        return img
    if axis == 1:
        return _minmax_filter_1d(img.T, size, 0, is_min, pad_value).T
    r_lo = (size - 1) // 2
    r_hi = size - 1 - r_lo
    n = img.shape[0]
    op = np.minimum if is_min else np.maximum
    if size >= 16:
        # van Herk/Gil-Werman: O(1) per pixel for large windows — window
        # [i-r_lo, i+r_hi] = op(suffix-scan, prefix-scan) over size-blocks
        total = n + r_lo + r_hi
        blocks = -(-total // size) * size
        padded = np.full((blocks, img.shape[1]), pad_value, dtype=img.dtype)
        padded[r_lo : r_lo + n] = img
        b = padded.reshape(-1, size, img.shape[1])
        g = op.accumulate(b, axis=1).reshape(blocks, -1)          # forward within block
        h = op.accumulate(b[:, ::-1, :], axis=1)[:, ::-1, :].reshape(blocks, -1)
        return op(h[0:n], g[size - 1 : size - 1 + n])
    padded = np.pad(img, ((r_lo, r_hi), (0, 0)), mode="constant", constant_values=pad_value)
    out = padded[0:n].copy()
    for i in range(1, size):
        op(out, padded[i : i + n], out=out)
    return out


def _effective(k: int, iterations: int) -> int:
    """k x k rect SE applied ``iterations`` times == one (k + (k-1)(it-1))
    rect SE (exact for flat structuring elements)."""
    return k + (k - 1) * (iterations - 1)


def erode(img: np.ndarray, kh: int, kw: int, iterations: int = 1) -> np.ndarray:
    """Rect-kernel erosion (min filter); border acts as foreground (255)."""
    out = _minmax_filter_1d(img, _effective(kh, iterations), 0, True, 255)
    return _minmax_filter_1d(out, _effective(kw, iterations), 1, True, 255)


def dilate(img: np.ndarray, kh: int, kw: int, iterations: int = 1) -> np.ndarray:
    """Rect-kernel dilation (max filter); border acts as background (0)."""
    out = _minmax_filter_1d(img, _effective(kh, iterations), 0, False, 0)
    return _minmax_filter_1d(out, _effective(kw, iterations), 1, False, 0)


def morph_open(img: np.ndarray, kh: int, kw: int, iterations: int = 1) -> np.ndarray:
    """OPEN with iterations=k: k erosions then k dilations
    (cv2.morphologyEx semantics; reference scripts/dataset.py:46-47)."""
    return dilate(erode(img, kh, kw, iterations), kh, kw, iterations)


def morph_close(img: np.ndarray, kh: int, kw: int, iterations: int = 1) -> np.ndarray:
    """CLOSE with iterations=k: k dilations then k erosions
    (reference scripts/dataset.py:14-15 uses a 1x50 vertical close).

    EVEN kernels: both passes use the same window anchor, whereas cv2's
    MORPH_CLOSE mirrors the anchor between dilate and erode — so for an
    even kernel this equals cv2's close shifted by one pixel along that
    axis (see find_vertical_line_bounds for why the 1-px shift is
    observably harmless in the one even-kernel call site)."""
    return erode(dilate(img, kh, kw, iterations), kh, kw, iterations)


def binary_erode_mask(mask: np.ndarray, ksize: int = 3) -> np.ndarray:
    """Erode a boolean mask with a ksize x ksize rect kernel (True shrinks).

    Matches cv2.erode on a {0,1} uint8 mask (reference
    scripts/post_process.py:126): cv2.erode's default borderValue is
    morphologyDefaultBorderValue() (+inf), i.e. the outside counts as
    FOREGROUND for a min filter, so pixels at the image edge do NOT erode
    and class regions touching the boundary keep their border pixels.
    Runs bit-packed (kernels/bitmorph.py).
    """
    from .bitmorph import binary_filter

    return binary_filter(np.asarray(mask, dtype=bool), ksize, ksize, erode=True, border=True)


# ---------------------------------------------------------------------------
# Margin detection + whiteout (reference scripts/dataset.py:8-29,49-51)
# ---------------------------------------------------------------------------

def find_vertical_line_bounds(img: np.ndarray, cfg: ExtractConfig) -> tuple[int, int]:
    """Locate the leftmost/rightmost vertical table borders in the LEFT HALF.

    Same observable algorithm as reference scripts/dataset.py:8-29:
    1. take left half of the (binarized) image
    2. vertical CLOSE with a 1-wide x 50-tall kernel — wipes ink features
       shorter than the kernel, keeping only tall vertical lines
    3. per-column count of black pixels; columns above 15% of the max are
       line columns
    4. bounds = (first_col - 10, last_col - 5) clamped to the half-width;
       blank pages (no lines) fall back to (0, half_width).
    """
    half_w = img.shape[1] // 2
    black = vline_black_mask(img, cfg)
    return vline_bounds_from_profile(black.sum(axis=0, dtype=np.int64), half_w, cfg)


def vline_black_mask(img: np.ndarray, cfg: ExtractConfig) -> np.ndarray:
    """Per-pixel black mask of the vertically-CLOSEd LEFT HALF — the
    distributive core of find_vertical_line_bounds: the column profile is
    the row-sum of this mask, so horizontal BANDS of the page can each
    contribute their core rows' partial sums and the combined profile is
    EXACT (the tile-split path, pipeline/tiling.py, relies on this;
    band callers must pass a halo >= 2*vline_kernel_h and slice it off)."""
    from .bitmorph import binary_filter

    half_w = img.shape[1] // 2
    left = img[:, :half_w]
    # vertical CLOSE bit-packed (== morph_close(left, kernel_h, 1)).
    # NOTE: for the even 50-tall kernel both passes use the same window
    # anchor, whereas cv2.morphologyEx(MORPH_CLOSE) mirrors the anchor
    # between dilate and erode — the result equals cv2's close shifted
    # vertically by one row.  Deliberate 1-px deviation: per-column black
    # COUNTS feed a 15%-of-max threshold, which a one-row shift at the
    # image top/bottom cannot flip.
    white = binary_filter(left > 0, cfg.vline_kernel_h, 1, erode=False, border=False)
    white = binary_filter(white, cfg.vline_kernel_h, 1, erode=True, border=True)
    return ~white


def vline_bounds_from_profile(
    col_profile: np.ndarray, half_w: int, cfg: ExtractConfig
) -> tuple[int, int]:
    """(lb, rb) decision from the per-column black-count profile — shared
    verbatim by the whole-page path above and the tile-split stitcher."""
    if col_profile.size == 0 or col_profile.max() == 0:
        return 0, half_w
    threshold = col_profile.max() * cfg.vline_profile_frac
    line_cols = np.where(col_profile > threshold)[0]
    if len(line_cols) == 0:
        return 0, half_w
    lb = max(0, int(line_cols[0]) - cfg.left_bound_pad)
    rb = min(half_w, int(line_cols[-1]) - cfg.right_bound_pad)
    return lb, rb


def whiteout_margins(img: np.ndarray, lb: int, rb: int) -> np.ndarray:
    """Set everything left of lb and right of rb to white (255); note this
    erases the rightmost table border itself — a reference quirk we keep
    (reference scripts/dataset.py:49-51 with rb = last_line_col - 5)."""
    out = img.copy()
    out[:, :lb] = 255
    out[:, rb:] = 255
    return out


# ---------------------------------------------------------------------------
# Resize (INTER_AREA integer decimation)
# ---------------------------------------------------------------------------

def resize_area(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Area-average downsample to (target_w, target_h).

    For integer factors this is an exact block mean (what INTER_AREA
    computes); non-integer factors use a general area-weighted average.
    Reference resizes with cv2.resize(..., INTER_AREA)
    (scripts/dataset.py:53); fixtures use exact 2x factors.
    """
    h, w = img.shape[:2]
    if h == target_h and w == target_w:
        return img.astype(np.uint8)
    if h % target_h == 0 and w % target_w == 0:
        fy, fx = h // target_h, w // target_w
        if fy == 2 and fx == 2:
            # 2x2 block mean via strided uint16 adds + rint lookup table —
            # no float temporaries (identical results: LUT[s] = rint(s/4))
            sums = img[0::2, 0::2].astype(np.uint16)
            sums += img[1::2, 0::2]
            sums += img[0::2, 1::2]
            sums += img[1::2, 1::2]
            lut = np.rint(np.arange(1021, dtype=np.float64) / 4.0).astype(np.uint8)
            return lut[sums]
        sums = img.reshape(target_h, fy, target_w, fx).astype(np.uint32).sum(axis=(1, 3))
        out = np.rint(sums.astype(np.float32) / (fy * fx))
        return out.astype(np.uint8)
    # General (non-integer factor) area average, SEPARABLE and fully
    # vectorized: per-axis cumulative sums gathered at the fractional
    # output-cell boundaries (linear interpolation of a cumsum == the
    # fractional-edge area weights).  The row pass is column-chunked so
    # the float64 cumsum never materializes more than ~256 MB — the old
    # bilinear-integral version allocated (h+1)x(w+1) float64 (2.5 GB on
    # a 315M-px giant page) and looped target pixels in PYTHON (~23 s
    # inside the tile-split stitch task; this path is <1.5 s there).
    ys = np.linspace(0, h, target_h + 1)
    xs = np.linspace(0, w, target_w + 1)
    yi = np.minimum(ys.astype(np.int64), h)
    fy = ys - yi
    yi1 = np.minimum(yi + 1, h)
    row_sums = np.empty((target_h, w), dtype=np.float64)
    chunk = max(1, (1 << 25) // (h + 1))  # ~256 MB of float64 per chunk
    for c0 in range(0, w, chunk):
        c1 = min(w, c0 + chunk)
        cum = np.zeros((h + 1, c1 - c0), dtype=np.float64)
        np.cumsum(img[:, c0:c1], axis=0, dtype=np.float64, out=cum[1:])
        bound = cum[yi] * (1.0 - fy)[:, None] + cum[yi1] * fy[:, None]
        row_sums[:, c0:c1] = bound[1:] - bound[:-1]
    xi = np.minimum(xs.astype(np.int64), w)
    fx = xs - xi
    xi1 = np.minimum(xi + 1, w)
    cum2 = np.zeros((target_h, w + 1), dtype=np.float64)
    np.cumsum(row_sums, axis=1, out=cum2[:, 1:])
    bound2 = cum2[:, xi] * (1.0 - fx)[None, :] + cum2[:, xi1] * fx[None, :]
    sums = bound2[:, 1:] - bound2[:, :-1]
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    return np.rint(sums / area).clip(0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Full preprocessing chain (reference scripts/dataset.py:31-57)
# ---------------------------------------------------------------------------

def preprocess(gray: np.ndarray, cfg: ExtractConfig) -> np.ndarray:
    """Binarize + denoise + margin-crop + resize a grayscale page.

    Mirrors reference preprocess() step-for-step (scripts/dataset.py:31-57):
    blur3 -> adaptive Gaussian threshold(BS, C) -> 3x3 OPEN x2 ->
    vertical-line margin whiteout -> INTER_AREA resize.  Input here is
    already grayscale (our media table stores grayscale pages; the
    reference's BGR->gray convert is the identity for them).  Returns the
    resized uint8 binary image (single channel; the reference's 3-channel
    stack at scripts/dataset.py:56 is a model-input formality we drop).
    """
    img = binarize_fused(gray, cfg.adaptive_block_size, cfg.adaptive_c)
    # OPEN x2 bit-packed end-to-end: white foreground, erode border =
    # foreground, dilate border = background (cv2 defaults; same result as
    # morph_open(img, 3, 3, iterations=2))
    from .bitmorph import open_u8

    img = open_u8(img, 5, 5)
    lb, rb = find_vertical_line_bounds(img, cfg)
    img = whiteout_margins(img, lb, rb)
    img = resize_area(img, cfg.target_width, cfg.target_height)
    return img
