from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from bsc_project_spark.pipeline.session import get_spark

    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    # a streaming query still running would deadlock/stall the JVM shutdown
    for q in s.streams.active:
        q.stop()
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from bsc_project_spark.fixtures.corpus import build_corpus

    return build_corpus(n_docs=4)


@pytest.fixture(scope="session")
def skew_corpus():
    from bsc_project_spark.fixtures.corpus import build_corpus

    # every 2nd doc is a heavy doc carrying 16 media spans
    return build_corpus(n_docs=4, skew_every=2, skew_spans=16)
