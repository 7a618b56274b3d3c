"""The M5/M6/M9 SQL aggregation halves (queries/relational.py) must compute
the SAME numbers as the numpy kernels (kernels/metrics.py) when fed the
kernels' own per-pixel flags / per-class instance counts.

The driver's oracle checks Spark-vs-DuckDB parity of these queries over the
lineitem fixture; these tests close the other edge of the triangle —
SQL-vs-kernel — on real masks, so the split (pixel half in-UDF, aggregation
half relational) is proven semantics-preserving.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from bsc_project_spark.kernels import cc, metrics
from bsc_project_spark.kernels.metrics import _sobel_magnitude
from bsc_project_spark.queries.relational import (
    _BOUNDARY_F1_AGG,
    _INSTANCE_SEP_AGG,
    _PIXEL_DIFF_AGG,
)

K = 4


def _masks(seed: int, n: int = 24) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    target = (rng.random((n, n)) * K).astype(np.int64)
    pred = target.copy()
    flip = rng.random((n, n)) < 0.2
    pred[flip] = (pred[flip] + 1) % K
    return pred, target


def test_boundary_f1_sql_matches_kernel():
    pred, target = _masks(0)
    ref = metrics.boundary_f1(pred, target, K)

    rows = []
    for c in range(K):
        pe = np.abs(_sobel_magnitude(pred == c))
        te = np.abs(_sobel_magnitude(target == c))
        pb = pe > (pe.mean() + pe.std())
        tb = te > (te.mean() + te.std())
        rows.extend((c, bool(p), bool(t)) for p, t in zip(pb.ravel(), tb.ravel()))

    con = duckdb.connect()
    con.register("px_src", pd.DataFrame(rows, columns=["cls", "pb", "tb"]))
    sql = _BOUNDARY_F1_AGG.format(px="SELECT cls, pb, tb FROM px_src")
    bp, br, bf = con.execute(sql).fetchone()
    assert abs(bp - ref["boundary_precision"]) < 2e-6
    assert abs(br - ref["boundary_recall"]) < 2e-6
    assert abs(bf - ref["boundary_f1"]) < 2e-6


def test_instance_sep_sql_matches_kernel():
    rows = []
    per_batch = []
    for batch in range(2):
        pred, target = _masks(batch + 10)
        per_batch.append(metrics.instance_separation(pred, target, K))
        for c in range(K):
            _, n_pred = cc.label(pred == c)
            _, n_target = cc.label(target == c)
            rows.append((batch, c, n_pred, n_target))

    con = duckdb.connect()
    con.register("r_src", pd.DataFrame(rows, columns=["batch", "cls", "pred_n", "target_n"]))
    sql = _INSTANCE_SEP_AGG.format(r="SELECT batch, cls, pred_n, target_n FROM r_src")
    (val,) = con.execute(sql).fetchone()
    assert abs(val - float(np.mean(per_batch))) < 2e-6


def test_pixel_diff_sql_matches_kernel():
    rows = []
    expected = {}
    for page in range(3):
        a, b = _masks(page + 20)
        expected[page] = metrics.pixel_diff_fraction(a, b) * 100.0
        rows.extend((page, int(x), int(y)) for x, y in zip(a.ravel(), b.ravel()))

    con = duckdb.connect()
    con.register("px_src", pd.DataFrame(rows, columns=["page", "pred", "gt"]))
    sql = _PIXEL_DIFF_AGG.format(px="SELECT page, pred, gt FROM px_src")
    for page, n_diff, pct in con.execute(sql).fetchall():
        a, b = _masks(page + 20)
        assert n_diff == int(np.sum(a != b))
        assert abs(pct - expected[page]) < 2e-6
