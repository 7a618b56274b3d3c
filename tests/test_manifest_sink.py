"""manifest_parquet data source: atomic-manifest commit through the
standard write path — partial/orphan files invisible, append snapshots
layer, abort cleans up."""

import json
import os

import pytest

from bsc_project_spark.sources.manifest_sink import (
    ManifestParquetDataSource,
    _ManifestWriter,
    _read_manifest,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(ManifestParquetDataSource)


def _write(df, path, mode="append"):
    df.write.format("manifest_parquet").option("path", path).mode(mode).save()


def test_write_read_roundtrip_and_append_snapshots(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df1 = spark.range(10).selectExpr("id", "CAST(id * 2 AS STRING) AS s")
    _write(df1, path)
    got = spark.read.format("manifest_parquet").option("path", path).load()
    assert got.count() == 10
    assert {r.s for r in got.collect()} == {str(2 * i) for i in range(10)}
    assert _read_manifest(path)["version"] == 1

    df2 = spark.range(10, 15).selectExpr("id", "CAST(id * 2 AS STRING) AS s")
    _write(df2, path)  # append = new snapshot layering over the old files
    got2 = spark.read.format("manifest_parquet").option("path", path).load()
    assert got2.count() == 15
    assert _read_manifest(path)["version"] == 2

    _write(df2, path, mode="overwrite")
    got3 = spark.read.format("manifest_parquet").option("path", path).load()
    assert got3.count() == 5
    assert _read_manifest(path)["version"] == 3


def test_orphan_files_are_invisible(spark, tmp_path):
    """A file in data/ that no committed manifest references (a crashed
    write attempt) must not appear to readers."""
    path = str(tmp_path / "tbl")
    _write(spark.range(4).selectExpr("id", "CAST(id AS STRING) AS s"), path)
    # simulate a crash AFTER file write, BEFORE commit: copy a committed
    # file under a fresh name without touching the manifest
    data_dir = os.path.join(path, "data")
    committed = sorted(os.listdir(data_dir))[0]
    with open(os.path.join(data_dir, committed), "rb") as f:
        blob = f.read()
    with open(os.path.join(data_dir, "part-orphan.parquet"), "wb") as f:
        f.write(blob)
    got = spark.read.format("manifest_parquet").option("path", path).load()
    assert got.count() == 4  # orphan invisible


def test_abort_removes_written_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    with open(os.path.join(path, "data", "part-x.parquet"), "w") as f:
        f.write("junk")
    from pyspark.sql.types import StructType

    w = _ManifestWriter({"path": path}, StructType([]), overwrite=False)

    class Msg:
        files = ["part-x.parquet"]

    w.abort([Msg(), None])  # None = failed task with no message
    assert not os.path.exists(os.path.join(path, "data", "part-x.parquet"))
    # nothing was ever committed
    assert _read_manifest(path) == {"version": 0, "files": []}


def test_append_with_reordered_columns_reads_by_name(spark, tmp_path):
    """Files appended with a different column order must read back
    correctly (rows are emitted keyed by the scan schema's field names,
    not file-positionally)."""
    path = str(tmp_path / "tbl")
    _write(spark.createDataFrame([(1, "a")], "id long, s string"), path)
    _write(
        spark.createDataFrame([("b", 2)], "s string, id long").select("s", "id"),
        path,
    )
    got = spark.read.format("manifest_parquet").option("path", path).load()
    assert {(r.id, r.s) for r in got.collect()} == {(1, "a"), (2, "b")}


def test_complex_types_roundtrip(spark, tmp_path):
    """The extracted-span shape (arrays of structs, binary) survives the
    sink+source roundtrip."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [("d1", [("text", "hello", None, 0), ("media", None, "p-1", 1)])],
        "doc_id string, spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    _write(df, path)
    got = spark.read.format("manifest_parquet").option("path", path).load()
    assert got.schema == df.schema
    assert got.exceptAll(df).count() == 0
    assert df.exceptAll(got).count() == 0


def test_concurrent_commit_fails_loudly_not_silently(spark, tmp_path):
    """Two racing committers must not both read the same prev manifest and
    silently drop one writer's files: a commit that finds the O_EXCL lock
    held fails with an explicit error, and succeeds after the lock clears."""
    path = str(tmp_path / "tbl")
    df = spark.range(5).selectExpr("id", "CAST(id AS STRING) AS s")
    _write(df, path)
    os.makedirs(path, exist_ok=True)
    lock = os.path.join(path, "_manifest.json.lock")
    with open(lock, "w"):
        pass
    with pytest.raises(Exception, match="concurrent commit"):
        _write(df, path)
    os.remove(lock)
    _write(df, path)
    got = spark.read.format("manifest_parquet").option("path", path).load()
    assert got.count() == 10


def test_writer_streams_in_bounded_chunks(spark, tmp_path):
    """Partitions larger than the write chunk stream through the
    ParquetWriter (several row groups, one file, exact row count)."""
    from bsc_project_spark.sources import manifest_sink

    path = str(tmp_path / "big")
    n = manifest_sink._WRITE_CHUNK_ROWS * 3 + 17
    df = spark.range(n).coalesce(1).selectExpr("id", "CAST(id AS STRING) AS s")
    _write(df, path)
    got = spark.read.format("manifest_parquet").option("path", path).load()
    assert got.count() == n
    files = _read_manifest(path)["files"]
    assert len(files) == 1
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(os.path.join(path, "data", files[0])).metadata
    assert meta.num_row_groups >= 3
