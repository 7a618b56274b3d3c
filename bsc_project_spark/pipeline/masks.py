"""Segmentation-mask audit stage (FIXTURES.md §5 golden_masks shape).

Runs the front half of the extraction kernel chain (preprocess -> segment
-> post_process_mask, reference scripts/dataset.py:31-57 +
scripts/post_process.py:176-195) over media pages and emits the final
class mask as row-major RLE — the compact, schema-typed form of the
reference's intermediate mask.  Used for per-kernel golden regression at
test time and for segmentation-quality audits at scale (mask drift between
engine versions diffs as cheap RLE rows instead of full images).

Same scale shape as the extraction stage: one row per UNIQUE page, all
pixel work inside one vectorized mapInPandas stage, zero per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame

from ..config import ExtractConfig
from ..io.png import decode_gray
from ..kernels.imgproc import deskew_gray, preprocess
from ..kernels.postprocess import post_process_mask
from ..kernels.rle import mask_to_rle
from ..kernels.segment import segment_page

MASK_STAGE_SCHEMA = (
    "media_ref string, h int, w int, rle array<struct<class: tinyint, run: int>>"
)


def _make_mask_udf(
    cfg: ExtractConfig,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    def mask_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_ref, content in zip(pdf["media_ref"], pdf["content"]):
                gray = deskew_gray(decode_gray(bytes(content)), cfg)
                mask = post_process_mask(segment_page(preprocess(gray, cfg), cfg), cfg)
                rle = [{"class": c, "run": r} for c, r in mask_to_rle(mask)]
                rows.append((media_ref, mask.shape[0], mask.shape[1], rle))
            yield pd.DataFrame(rows, columns=["media_ref", "h", "w", "rle"])

    return mask_batches


def segment_masks(media: DataFrame, cfg: ExtractConfig) -> DataFrame:
    """media(media_ref, content) -> (media_ref, h, w, rle) final class masks."""
    return media.select("media_ref", "content").mapInPandas(
        _make_mask_udf(cfg), schema=MASK_STAGE_SCHEMA
    )
