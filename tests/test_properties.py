"""Property-based tests (hypothesis) for the pure-numpy kernels.

Complements the example-based and fuzz tests with shrinkable generated
cases: codec roundtrips, filter/idempotence laws, and equivalence of the
optimized implementations to their simple reference forms.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


small_masks = arrays(
    np.uint8,
    st.tuples(st.integers(1, 24), st.integers(1, 24)),
    elements=st.integers(0, 5),
)

small_grays = arrays(
    np.uint8,
    st.tuples(st.integers(1, 32), st.integers(1, 32)),
    elements=st.integers(0, 255),
)


@settings(max_examples=60, deadline=None)
@given(small_masks)
def test_rle_roundtrip(mask):
    from bsc_project_spark.kernels.rle import mask_to_rle, rle_to_mask

    h, w = mask.shape
    assert (rle_to_mask(mask_to_rle(mask), h, w) == mask).all()


@settings(max_examples=40, deadline=None)
@given(small_grays)
def test_binarize_fused_always_equals_two_step(img):
    from bsc_project_spark.kernels.imgproc import (
        adaptive_threshold_gaussian,
        binarize_fused,
        gaussian_blur3,
    )

    assert np.array_equal(
        binarize_fused(img, 13, 12),
        adaptive_threshold_gaussian(gaussian_blur3(img), 13, 12),
    )


@settings(max_examples=40, deadline=None)
@given(small_grays, st.integers(1, 4), st.integers(1, 4))
def test_resize_integer_factor_is_block_mean(img, fy, fx):
    from bsc_project_spark.kernels.imgproc import resize_area

    h, w = img.shape
    h, w = (h // fy) * fy, (w // fx) * fx
    if h == 0 or w == 0:
        return
    img = img[:h, :w]
    got = resize_area(img, w // fx, h // fy)
    want = np.rint(
        img.reshape(h // fy, fy, w // fx, fx).astype(np.float64).mean(axis=(1, 3))
    ).astype(np.uint8)
    assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(small_masks)
def test_open_u8_idempotent(mask):
    """OPEN is idempotent: open(open(x)) == open(x) (morphology law)."""
    from bsc_project_spark.kernels.bitmorph import open_u8

    img = np.where(mask > 2, np.uint8(255), np.uint8(0))
    once = open_u8(img, 3, 3)
    assert np.array_equal(open_u8(once, 3, 3), once)


@settings(max_examples=40, deadline=None)
@given(small_masks)
def test_multiclass_regions_match_per_class_label(mask):
    from bsc_project_spark.kernels import cc

    comps = cc.multiclass_regions(mask, 0, 5)
    for c in range(5):
        labels, n = cc.label(mask == c)
        want = sorted(
            (r.bbox[0], r.bbox[1], r.bbox[2], r.bbox[3], r.area)
            for r in cc.regionprops(labels)
        )
        assert sorted(comps[c]) == want


@settings(max_examples=30, deadline=None)
@given(small_masks.filter(lambda m: m.shape[0] > 2 and m.shape[1] > 2))
def test_deskew_roundtrip_interior(mask):
    from bsc_project_spark.kernels.imgproc import deskew

    img = np.where(mask > 2, np.uint8(255), np.uint8(0))
    h = img.shape[0]
    margin = max(1, int(np.tan(np.deg2rad(1.5)) * img.shape[1]) + 1)
    if 2 * margin >= h:
        return
    back = deskew(deskew(img, 1.5), -1.5)
    assert (back[margin : h - margin, :] == img[margin : h - margin, :]).all()
