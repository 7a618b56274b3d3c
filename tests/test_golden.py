"""End-to-end single-process golden extraction: the kernels must recover
exactly the text that the fixture renderer drew (all 16 page archetypes,
incl. blank pages, noise blobs, tall glyphs, dot/tiny cells)."""

import pytest

from bsc_project_spark.fixtures.corpus import FIXTURE_CONFIG, page_spec
from bsc_project_spark.fixtures.render import render_page
from bsc_project_spark.kernels.golden import extract_page


@pytest.mark.parametrize("idx", range(16))
def test_page_extraction_matches_intent(idx):
    spec = page_spec(idx)
    img = render_page(spec)
    cells = extract_page(img, FIXTURE_CONFIG, 5)
    assert cells == sorted((c.row, c.col, c.text) for c in spec.cells)
