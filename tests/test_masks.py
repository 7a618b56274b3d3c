"""Golden-mask regression (FIXTURES.md §5): RLE codec, golden-mask
fixtures, and the Spark mask-audit stage vs the single-process golden."""

from __future__ import annotations

import numpy as np
import pytest

from bsc_project_spark.kernels.rle import mask_to_rle, rle_to_mask


def test_rle_roundtrip_random_masks():
    rng = np.random.default_rng(7)
    for _ in range(5):
        mask = rng.integers(0, 6, size=(37, 53)).astype(np.uint8)
        assert (rle_to_mask(mask_to_rle(mask), 37, 53) == mask).all()


def test_rle_constant_mask_single_run():
    mask = np.full((100, 200), 5, dtype=np.uint8)
    rle = mask_to_rle(mask)
    assert rle == [(5, 20000)]
    assert (rle_to_mask(rle, 100, 200) == mask).all()


def test_rle_runs_cross_row_boundaries():
    mask = np.zeros((3, 4), dtype=np.uint8)
    mask[1, 2:] = 1
    mask[2, :] = 1
    # row-major flat order: six 0s, then a 1-run spanning rows 1 and 2
    assert mask_to_rle(mask) == [(0, 6), (1, 6)]


def test_rle_length_mismatch_raises():
    with pytest.raises(ValueError):
        rle_to_mask([(0, 5)], 2, 3)


def test_golden_masks_fixture_shape():
    from bsc_project_spark.fixtures.corpus import FIXTURE_CONFIG, build_golden_masks

    gm = build_golden_masks(4)
    assert list(gm.columns) == ["media_ref", "h", "w", "rle"]
    assert len(gm) == 4
    assert (gm["h"] == FIXTURE_CONFIG.target_height).all()
    assert (gm["w"] == FIXTURE_CONFIG.target_width).all()
    for _, r in gm.iterrows():
        assert sum(e["run"] for e in r["rle"]) == r["h"] * r["w"]
        assert all(0 <= e["class"] <= 5 for e in r["rle"])


def test_spark_mask_stage_matches_golden(spark, corpus):
    from bsc_project_spark.fixtures.corpus import FIXTURE_CONFIG, build_golden_masks
    from bsc_project_spark.fixtures.spark_io import media_df
    from bsc_project_spark.pipeline.masks import segment_masks

    n_pages = len(corpus.media)
    golden = build_golden_masks(n_pages)
    got = segment_masks(media_df(spark, corpus), FIXTURE_CONFIG).collect()
    assert len(got) == n_pages
    by_ref = {r["media_ref"]: r for r in got}
    for _, g in golden.iterrows():
        r = by_ref[g["media_ref"]]
        assert (r["h"], r["w"]) == (g["h"], g["w"])
        assert [(e["class"], e["run"]) for e in r["rle"]] == [
            (e["class"], e["run"]) for e in g["rle"]
        ]
