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
    """Separable 2-D convolution with the same 1-D kernel on both axes."""
    k = kernel.astype(np.float64)
    r = len(k) // 2
    padded = _pad(img.astype(np.float64), r, r, border)
    # vertical pass
    h = img.shape[0]
    tmp = np.zeros((h, padded.shape[1]), dtype=np.float64)
    for i, kv in enumerate(k):
        tmp += kv * padded[i : i + h, :]
    # horizontal pass
    w = img.shape[1]
    out = np.zeros((h, w), dtype=np.float64)
    for i, kv in enumerate(k):
        out += kv * tmp[:, i : i + w]
    return out


def gaussian_blur3(img: np.ndarray) -> np.ndarray:
    """3x3 Gaussian blur, sigma auto (reference scripts/dataset.py:35)."""
    out = _sepconv(img, _gaussian_kernel_1d(3, 0.0), "reflect101")
    return np.rint(out).clip(0, 255).astype(np.uint8)


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
    """
    sigma = 0.3 * ((block_size - 1) * 0.5 - 1) + 0.8
    mean = _sepconv(img, _gaussian_kernel_1d(block_size, sigma), "replicate")
    mean_u8 = np.rint(mean).clip(0, 255).astype(np.int32)
    out = np.where(img.astype(np.int32) > mean_u8 - int(c), maxval, 0)
    return out.astype(np.uint8)


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
    r_lo = (size - 1) // 2
    r_hi = size - 1 - r_lo
    if axis == 0:
        padded = np.pad(img, ((r_lo, r_hi), (0, 0)), mode="constant", constant_values=pad_value)
        stack = [padded[i : i + img.shape[0], :] for i in range(size)]
    else:
        padded = np.pad(img, ((0, 0), (r_lo, r_hi)), mode="constant", constant_values=pad_value)
        stack = [padded[:, i : i + img.shape[1]] for i in range(size)]
    op = np.minimum if is_min else np.maximum
    out = stack[0]
    for s in stack[1:]:
        out = op(out, s)
    return out


def erode(img: np.ndarray, kh: int, kw: int, iterations: int = 1) -> np.ndarray:
    """Rect-kernel erosion (min filter); border acts as foreground (255)."""
    out = img
    for _ in range(iterations):
        out = _minmax_filter_1d(out, kh, 0, True, 255)
        out = _minmax_filter_1d(out, kw, 1, True, 255)
    return out


def dilate(img: np.ndarray, kh: int, kw: int, iterations: int = 1) -> np.ndarray:
    """Rect-kernel dilation (max filter); border acts as background (0)."""
    out = img
    for _ in range(iterations):
        out = _minmax_filter_1d(out, kh, 0, False, 0)
        out = _minmax_filter_1d(out, kw, 1, False, 0)
    return out


def morph_open(img: np.ndarray, kh: int, kw: int, iterations: int = 1) -> np.ndarray:
    """OPEN with iterations=k: k erosions then k dilations
    (cv2.morphologyEx semantics; reference scripts/dataset.py:46-47)."""
    return dilate(erode(img, kh, kw, iterations), kh, kw, iterations)


def morph_close(img: np.ndarray, kh: int, kw: int, iterations: int = 1) -> np.ndarray:
    """CLOSE with iterations=k: k dilations then k erosions
    (reference scripts/dataset.py:14-15 uses a 1x50 vertical close)."""
    return erode(dilate(img, kh, kw, iterations), kh, kw, iterations)


def binary_erode_mask(mask: np.ndarray, ksize: int = 3) -> np.ndarray:
    """Erode a boolean mask with a ksize x ksize rect kernel (True shrinks).

    Matches cv2.erode on a {0,1} uint8 mask (reference
    scripts/post_process.py:126) — border counts as 0 outside, so edge
    pixels erode away.
    """
    img = np.where(mask, np.uint8(255), np.uint8(0))
    out = _minmax_filter_1d(img, ksize, 0, True, 0)
    out = _minmax_filter_1d(out, ksize, 1, True, 0)
    return out > 0


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
    left = img[:, :half_w]
    closed = morph_close(left, cfg.vline_kernel_h, 1)
    col_profile = np.sum(closed == 0, axis=0)
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
        blocks = img.reshape(target_h, fy, target_w, fx).astype(np.float64)
        out = blocks.mean(axis=(1, 3))
        return np.rint(out).clip(0, 255).astype(np.uint8)
    # General area average via cumulative sums (slow path; fixtures avoid it).
    ys = np.linspace(0, h, target_h + 1)
    xs = np.linspace(0, w, target_w + 1)
    integral = np.zeros((h + 1, w + 1), dtype=np.float64)
    integral[1:, 1:] = np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)

    def rect_sum(y0, y1, x0, x1):
        # fractional-pixel area sum via bilinear interpolation of the integral
        def at(y, x):
            yi, xi = int(y), int(x)
            fy, fx = y - yi, x - xi
            yi1, xi1 = min(yi + 1, h), min(xi + 1, w)
            return (
                integral[yi, xi] * (1 - fy) * (1 - fx)
                + integral[yi1, xi] * fy * (1 - fx)
                + integral[yi, xi1] * (1 - fy) * fx
                + integral[yi1, xi1] * fy * fx
            )

        return at(y1, x1) - at(y0, x1) - at(y1, x0) + at(y0, x0)

    out = np.empty((target_h, target_w), dtype=np.float64)
    for j in range(target_h):
        for i in range(target_w):
            area = (ys[j + 1] - ys[j]) * (xs[i + 1] - xs[i])
            out[j, i] = rect_sum(ys[j], ys[j + 1], xs[i], xs[i + 1]) / area
    return np.rint(out).clip(0, 255).astype(np.uint8)


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
    img = gaussian_blur3(gray)
    img = adaptive_threshold_gaussian(img, cfg.adaptive_block_size, cfg.adaptive_c)
    img = morph_open(img, 3, 3, iterations=2)
    lb, rb = find_vertical_line_bounds(img, cfg)
    img = whiteout_margins(img, lb, rb)
    img = resize_area(img, cfg.target_width, cfg.target_height)
    return img
