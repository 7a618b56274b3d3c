"""`format("manifest_parquet")` — a Python Data Source (Spark 4 API)
implementing the engine's snapshot-commit contract at the DSv2 level:

- **write**: each partition writes its rows to a uniquely-named parquet
  file under ``<path>/data/`` (executor-side, no coordination) and
  returns the file name in its ``WriterCommitMessage``;
- **commit** (driver): all partitions' file lists land in ONE atomic
  manifest rename — readers never see a partial job.  ``append`` mode
  layers a new snapshot over the previous manifest; a crash before
  commit leaves only invisible orphan files;
- **abort** (driver): written files from the failed attempt are deleted;
- **read**: lists the COMMITTED files from the manifest (orphans are
  invisible, like reading an Iceberg snapshot), one partition per file.

This is the same commit protocol `pipeline/checkpoint.py` runs at job
granularity, expressed through the standard source/sink API so any
DataFrame can `.write.format("manifest_parquet")` into it.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_manifest.json")


def _read_manifest(path: str) -> dict:
    p = _manifest_path(path)
    if not os.path.exists(p):
        return {"version": 0, "files": []}
    with open(p) as f:
        return json.load(f)


_WRITE_CHUNK_ROWS = 1024


@dataclass
class _WroteFiles(WriterCommitMessage):
    files: list
    rows: int


class _ManifestWriter(DataSourceWriter):
    def __init__(self, options: dict, schema, overwrite: bool):
        self.path = options.get("path") or options.get("table_path")
        if not self.path:
            raise ValueError("manifest_parquet requires .option('path', ...)")
        self.schema = schema  # Spark StructType, picklable to executors
        self.overwrite = overwrite

    def write(self, iterator) -> _WroteFiles:
        # executor side: stream this partition's rows into one parquet
        # file in bounded chunks — peak Python heap is O(chunk), not
        # O(partition), which matters for a sink whose rows carry
        # MB-scale media payloads.  The arrow schema derives from the
        # DECLARED Spark schema — letting from_pylist infer per partition
        # would give all-null columns a null type and make partitions
        # disagree.
        import itertools

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        data_dir = os.path.join(self.path, "data")
        fname = f"part-{uuid.uuid4().hex}.parquet"
        writer = None
        n_rows = 0
        try:
            while True:
                chunk = [
                    r.asDict(recursive=True)
                    for r in itertools.islice(iterator, _WRITE_CHUNK_ROWS)
                ]
                if not chunk:
                    break
                if writer is None:
                    os.makedirs(data_dir, exist_ok=True)
                    writer = pq.ParquetWriter(
                        os.path.join(data_dir, fname), arrow_schema
                    )
                writer.write_table(pa.Table.from_pylist(chunk, schema=arrow_schema))
                n_rows += len(chunk)
        finally:
            if writer is not None:
                writer.close()
        if n_rows == 0:
            return _WroteFiles([], 0)
        return _WroteFiles([fname], n_rows)

    def commit(self, messages) -> None:
        # driver side: ONE atomic rename makes every partition's files
        # visible together.  The read-modify-write of the manifest is
        # serialized by an O_EXCL lock file: two concurrent committers
        # (or a retried job racing a second append) would otherwise both
        # read the same prev manifest and the later os.replace would
        # silently drop the earlier writer's files — with the lock the
        # loser fails loudly instead (optimistic-concurrency semantics,
        # like Iceberg's commit conflict).
        files = [f for m in messages for f in m.files]
        os.makedirs(self.path, exist_ok=True)
        lock = _manifest_path(self.path) + ".lock"
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise RuntimeError(
                f"manifest_parquet: concurrent commit in flight on {self.path} "
                f"(lock {lock} exists); retry after the other writer finishes, "
                "or remove a stale lock left by a crashed driver"
            ) from None
        try:
            os.close(fd)
            prev = _read_manifest(self.path)
            state = {
                "version": prev["version"] + 1,
                "files": files if self.overwrite else prev["files"] + files,
            }
            tmp = _manifest_path(self.path) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(state, f, indent=2, sort_keys=True)
            os.replace(tmp, _manifest_path(self.path))
        finally:
            os.unlink(lock)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for fname in m.files:
                p = os.path.join(self.path, "data", fname)
                if os.path.exists(p):
                    os.remove(p)


@dataclass
class _FilePartition(InputPartition):
    fname: str


class _ManifestReader(DataSourceReader):
    def __init__(self, options: dict, field_names: list):
        self.path = options.get("path") or options.get("table_path")
        if not self.path:
            raise ValueError("manifest_parquet requires .option('path', ...)")
        self.files = _read_manifest(self.path)["files"]
        self.field_names = field_names

    def partitions(self):
        return [_FilePartition(f) for f in self.files] or [_FilePartition("")]

    def read(self, part: _FilePartition):
        if not part.fname:
            return
        import pyarrow.parquet as pq

        table = pq.read_table(os.path.join(self.path, "data", part.fname))
        # emit values in the SCAN schema's field order, keyed by name:
        # files appended with a different column order would otherwise
        # come out positionally transposed (or crash)
        names = self.field_names
        for row in table.to_pylist():
            yield tuple(row[n] for n in names)


class ManifestParquetDataSource(DataSource):
    """Atomic-manifest parquet table as a standard Spark source/sink."""

    @classmethod
    def name(cls) -> str:
        return "manifest_parquet"

    def schema(self):
        # committed files define the schema; reading an empty table needs
        # an explicit .schema(...) from the caller
        path = self.options.get("path") or self.options.get("table_path")
        files = _read_manifest(path)["files"] if path else []
        if not files:
            raise ValueError(
                "manifest_parquet: empty/uncommitted table — pass an explicit "
                ".schema(...) to read, or write first"
            )
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        arrow_schema = pq.read_schema(os.path.join(path, "data", files[0]))
        return from_arrow_schema(arrow_schema)

    def reader(self, schema) -> DataSourceReader:
        return _ManifestReader(dict(self.options), [f.name for f in schema.fields])

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _ManifestWriter(dict(self.options), schema, overwrite)
