"""Cross-engine drift property test for the webtext HTML-synthesis
queries (round-2 verdict item 6).

The q_main_content / q_web_pipeline family relies on ``split(html, '<')``
(Spark, regex-literal) agreeing with ``string_split(html, '<')`` (DuckDB,
plain literal) for EVERY text payload — plus instr/substring/trim
agreeing on multi-byte input.  The fixture corpus never produces markup
characters, so this test feeds an adversarial documents table (payloads
containing '<', '>', fake tags, regex metachars, multi-byte chars,
trailing separators, whitespace-only) through both engines and compares
the full result sets the same way the driver gate does."""

from __future__ import annotations

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bsc_project_spark.queries import TABLES, all_queries

SF_DIR = "/root/testdata/sf0.001"

ADVERSARIAL_TEXTS = [
    "a < b and c > d plus more ordinary words here",
    "<p>injected paragraph tag with seven words inside</p>",
    "> leading gt then < stray lt and words to pass the density gate",
    "héllo wörld 漢字 ümläut tokens one two three four five",
    "many<<<consecutive<<<separators<<<with words enough to keep density up",
    "trailing separator at the end of this payload <",
    "regex metachars a.*b [x] (y) {z} |pipe| ^caret$ plus filler words",
    "quote ' and doublequote \" and backslash \\ with extra filler words",
    "tabs\tand\nnewlines\nmixed with ordinary filler words to pass",
    "   ",
    "",
    "<nav>fake nav payload that is not a real nav block honestly</nav>",
    "closing tag only </aside> then words words words words words words",
    "unicode separators     and emoji \U0001f600 with filler words",
]

QUERIES_UNDER_TEST = [
    "q_main_content",
    "q_web_pipeline",
    "q_repetition_filter",
    "q_paragraph_dedup",
    "q_pii_scrub",
]


def _canon_cell(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(
        "\x01".join(_canon_cell(r[i]) for i in order) for r in rows
    )


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_sf")
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    rows = {
        "doc_id": list(range(1, len(ADVERSARIAL_TEXTS) + 1)),
        "text": ADVERSARIAL_TEXTS,
        "lang": ["en"] * len(ADVERSARIAL_TEXTS),
        "source": ["adv"] * len(ADVERSARIAL_TEXTS),
        "n_chars": [len(t) for t in ADVERSARIAL_TEXTS],
    }
    table = pa.table(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    pq.write_table(table, d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize("qname", QUERIES_UNDER_TEST)
def test_webtext_queries_agree_on_adversarial_payloads(spark, adv_dir, qname):
    spec = all_queries()[qname]
    sdf = spec.spark(spark, adv_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{adv_dir}/{t}.parquet'"
        )
    res = con.execute(spec.oracle)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols)
    assert _canon(s_cols, s_rows) == _canon(d_cols, d_rows), (
        f"{qname}: engines drifted on adversarial payloads"
    )
