"""Every registered query must execute (not necessarily return rows)
against EMPTY input tables — the degenerate case a production run hits on
an empty partition, a fresh table, or a filter that matches nothing.
Caught live bugs: q_sort_rank built a malformed zero-tuple VALUES list,
q_ivf_kmeans np.stack'ed an empty centroid list."""

import pytest

from bsc_project_spark.queries import _REGISTERED_DIRS, TABLES, all_queries


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(f"{out}/{t}.parquet")
        )
    return out


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, spec in sorted(all_queries().items()):
        _REGISTERED_DIRS.clear()  # force views to rebind to the empty dir
        try:
            spec.spark(spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {str(ex).splitlines()[0][:120]}")
    _REGISTERED_DIRS.clear()  # don't leak empty views into other tests
    assert not failures, failures
