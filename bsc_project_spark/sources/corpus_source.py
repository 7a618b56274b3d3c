"""Custom PySpark Data Source (Spark 4 Python Data Source API) serving the
deterministic synthetic corpus straight from executors:

    spark.dataSource.register(LogbookCorpusDataSource)
    docs  = (spark.read.format("logbook_corpus")
             .option("table", "documents").option("n_docs", 64).load())
    media = (spark.read.format("logbook_corpus")
             .option("table", "media").option("n_docs", 64).load())

Why a data source instead of a driver-side builder: generation happens IN
the partitions (each `read()` renders only its id range), so synthesizing
a bench corpus scales with the cluster instead of bottlenecking on the
driver — the same property a real warehouse scan has.  The rows are
byte-identical to `fixtures.corpus.build_corpus` (both call the shared
pure per-doc/per-page generators).

Also implements `pushFilters` (Spark 4.1): `=` and `IN` predicates on
`doc_id` / `media_ref` / `layout_id` prune generation to the matching id
range/set — the Python-source analogue of parquet partition pruning —
and every other predicate (or a partially-parseable IN) is returned to
Spark to re-apply.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..fixtures.spark_io import DOCUMENTS_SCHEMA, MEDIA_SCHEMA


@dataclass
class _IdRange(InputPartition):
    start: int
    end: int  # exclusive


def _doc_index(doc_id: str) -> int | None:
    """Index of a CANONICAL doc id, else None.  Round-trip validated:
    consuming a filter on a non-canonical value ('doc_42', 'doc_+41')
    would prune to the wrong doc while Spark, having handed the predicate
    over, never re-applies it — wrong rows, not just wasted work."""
    if isinstance(doc_id, str) and doc_id.startswith("doc_"):
        tail = doc_id[4:]
        if tail.isdigit() and f"doc_{int(tail):06d}" == doc_id:
            return int(tail)
    return None


def _page_index(media_ref: str) -> int | None:
    # canonical refs are "page_{pair:05d}-t" / "-b"
    # (fixtures.corpus._page_refs); same round-trip discipline as
    # _doc_index
    if not isinstance(media_ref, str):
        return None
    for k, suffix in ((0, "-t"), (1, "-b")):
        if media_ref.startswith("page_") and media_ref.endswith(suffix):
            tail = media_ref[5:-2]
            if tail.isdigit() and f"page_{int(tail):05d}{suffix}" == media_ref:
                return 2 * int(tail) + k
    return None


class _CorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.table = options.get("table", "documents")
        if self.table not in ("documents", "media"):
            raise ValueError(f"unknown table {self.table!r}")
        self.n_docs = int(options.get("n_docs", 8))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.skew_every = int(options.get("skew_every", 0))
        self.skew_spans = int(options.get("skew_spans", 24))
        # id domain: documents are doc indices, media are page indices
        self.lo = 0
        self.hi = self.n_docs if self.table == "documents" else 2 * self.n_docs
        self.id_set: set | None = None  # explicit ids from a pushed IN

    def _key_index(self, col: str, value) -> int | None:
        if self.table == "documents" and col == "doc_id":
            return _doc_index(value)
        if self.table == "media" and col == "media_ref":
            return _page_index(value)
        if self.table == "media" and col == "layout_id":
            return value if isinstance(value, int) else None
        return None

    def pushFilters(self, filters: list[Filter]):
        """Prune generation on supported key predicates — `=` narrows the
        id range, `IN` restricts to an explicit id set (consumed ONLY if
        every list element parses canonically; a partially-understood IN
        must go back to Spark whole).  Everything else is yielded back
        for Spark to evaluate."""
        for f in filters:
            consumed = False
            if len(getattr(f, "attribute", ())) == 1:
                (col,) = f.attribute
                if isinstance(f, EqualTo):
                    idx = self._key_index(col, f.value)
                    if idx is not None:
                        # empty range when the id is outside the corpus
                        self.lo = max(self.lo, min(idx, self.hi))
                        self.hi = min(self.hi, idx + 1)
                        consumed = True
                elif isinstance(f, In):
                    idxs = [self._key_index(col, v) for v in f.value]
                    if idxs and all(i is not None for i in idxs):
                        keep = {i for i in idxs if self.lo <= i < self.hi}
                        self.id_set = (
                            keep if self.id_set is None else self.id_set & keep
                        )
                        consumed = True
            if not consumed:
                yield f  # unsupported -> Spark re-applies it

    def partitions(self):
        if self.id_set is not None:
            ids = sorted(i for i in self.id_set if self.lo <= i < self.hi)
            return [_IdRange(i, i + 1) for i in ids] or [_IdRange(0, 0)]
        n = max(1, min(self.n_partitions, self.hi - self.lo))
        span = self.hi - self.lo
        if span <= 0:
            return [_IdRange(0, 0)]
        step = -(-span // n)
        return [
            _IdRange(self.lo + i * step, min(self.lo + (i + 1) * step, self.hi))
            for i in range(n)
            if self.lo + i * step < self.hi
        ]

    def read(self, part: _IdRange):
        if self.table == "documents":
            from ..fixtures.corpus import doc_row

            for d in range(part.start, part.end):
                yield doc_row(d, self.n_docs, self.skew_every, self.skew_spans)
        else:
            from ..fixtures.corpus import media_row

            for page_idx in range(part.start, part.end):
                r = media_row(page_idx)
                yield (
                    r["media_ref"],
                    r["content"],
                    r["width"],
                    r["height"],
                    r["layout_id"],
                )


class _CorpusStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the corpus: documents arrive in order, up to
    ``docs_per_batch`` per micro-batch, until ``n_docs`` are served.

    Offsets are just the next unserved doc index, so replay
    (``readBetweenOffsets``) regenerates any committed range
    deterministically — the exactly-once contract costs nothing when the
    source is a pure function of the offset range.  This is the arrival
    simulator for the continuous-ingest path (streaming/ingest.py).
    """

    def __init__(self, options: dict):
        if options.get("table", "documents") != "documents":
            raise ValueError("streaming corpus serves the documents table only")
        self.n_docs = int(options.get("n_docs", 8))
        self.docs_per_batch = int(options.get("docs_per_batch", 4))
        self.skew_every = int(options.get("skew_every", 0))
        self.skew_spans = int(options.get("skew_spans", 24))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, start: int, end: int):
        from ..fixtures.corpus import doc_row

        for d in range(start, end):
            yield doc_row(d, self.n_docs, self.skew_every, self.skew_spans)

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.docs_per_batch, self.n_docs)
        # list_iterator, not a generator: the engine's prefetch cache
        # needs an iterator it can next() AND copy.copy() — generators
        # reject copying; a batch is docs_per_batch-bounded anyway
        return iter(list(self._rows(lo, hi))), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(int(start["next"]), int(end["next"]))))


class LogbookCorpusDataSource(DataSource):
    """`format("logbook_corpus")` — distributed deterministic corpus
    synthesis with equality-predicate pruning (batch) and an in-order
    document arrival stream (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "logbook_corpus"

    def schema(self):
        table = self.options.get("table", "documents")
        return DOCUMENTS_SCHEMA if table == "documents" else MEDIA_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _CorpusReader(dict(self.options))

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _CorpusStreamReader(dict(self.options))
