"""Snapshot-commit extraction job with per-bucket lineage + resume.

The north rule requires the job to be resumable from the last committed
snapshot with per-partition lineage rows.  pyspark 4.1.2 in this sandbox
ships no Iceberg runtime, so commits are emulated with identical semantics
(documented fallback, SURVEY.md §7 step 5): a bucket becomes *committed*
only when the manifest JSON is atomically replaced (write-temp + rename,
the same atomicity primitive an Iceberg snapshot commit relies on), and
readers see only committed buckets.

Two independently-resumable stages, because the unit of expensive work
(a unique page) and the unit of output (a document) have different keys:

1. **Page stage** — the distinct media_refs of the whole input are
   snapshotted once (``refs/``), hash-bucketed by media_ref, and each
   bucket runs the image-kernel stage exactly once, committing
   ``cells/pbucket=K`` + ``lineage/pbucket=K``.  A page referenced by
   documents in ten different doc-buckets is still extracted ONCE
   globally (the single-stage design re-extracted shared pages per
   doc-bucket).
2. **Doc stage** — documents are hash-bucketed by doc_id
   (pmod(xxhash64(doc_id), n)); each bucket joins the committed cells,
   restores span order with the per-doc window, and commits
   ``data/bucket=K`` + ``errors/bucket=K`` (quarantined unresolved refs)
   + ``doc_lineage/bucket=K`` (doc/span counts + wall time).

Resume = re-running the job: committed buckets of BOTH stages are skipped
(the anti-join-against-committed-lineage idea of SURVEY.md Q12; with hash
buckets the anti-join reduces to skipping bucket ids, zero recompute).
A crash mid-page-stage resumes page extraction; a crash mid-doc-stage
never re-runs any image kernel at all.

Snapshot history is append-only: every commit freezes its manifest under
``snapshots/vN.json`` before atomically flipping the current pointer, so
``read_extracted(..., as_of=N)`` time-travels to any past commit and
``rollback(out_dir, N)`` re-points the table at an older state as a NEW
snapshot (Iceberg snapshot/rollback semantics on plain parquet + JSON).

The reference's analogue is ``ocr_generate_more_crops`` resuming crop
numbering from files already on disk (reference
scripts/ocr_generate_more_crops.py:11-18,69-76).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ExtractConfig
from .extract import (
    assemble_spans,
    explode_spans,
    run_page_stage,
    split_stage_output,
)

DOC_LINEAGE_SCHEMA = (
    "bucket int, doc_count long, span_count long, unresolved_count long, "
    "wall_time_ms long"
)

# idempotency-ledger cap: far beyond any realistic replay horizon (the
# stream engine replays at most its last unacknowledged batches)
_MAX_UPDATE_TAGS = 1024


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def _snapshots_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "snapshots")


def read_manifest(out_dir: str, as_of: int | None = None) -> dict:
    """Current manifest, or (time travel) the immutable state at snapshot
    ``as_of`` — the manifest every commit froze under ``snapshots/vN.json``
    before flipping the current pointer."""
    if as_of is not None:
        path = os.path.join(_snapshots_dir(out_dir), f"v{as_of}.json")
        if not os.path.exists(path):
            raise ValueError(f"no snapshot v{as_of} under {out_dir}")
        with open(path) as f:
            return json.load(f)
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return {
            "run_id": None,
            "committed_buckets": [],
            "committed_page_buckets": [],
            "n_buckets": None,
            "n_page_buckets": None,
        }
    with open(path) as f:
        m = json.load(f)
    m.setdefault("committed_page_buckets", [])
    m.setdefault("n_page_buckets", None)
    m.setdefault("committed_updates", [])
    return m


def _commit_manifest(out_dir: str, manifest: dict) -> dict:
    """Atomic snapshot commit, Iceberg-style: write the new state as an
    IMMUTABLE numbered snapshot file first, then flip the current pointer
    with an atomic rename.  A reader holding snapshot N is never affected
    by later commits; a crash between the two writes leaves the pointer on
    the previous fully-written snapshot."""
    prev = read_manifest(out_dir)
    sid = int(prev.get("snapshot_id") or 0) + 1
    manifest = {
        **manifest,
        "snapshot_id": sid,
        "committed_at_ms": int(time.time() * 1000),
    }
    snaps = _snapshots_dir(out_dir)
    os.makedirs(snaps, exist_ok=True)
    spath = os.path.join(snaps, f"v{sid}.json")
    with open(spath + ".tmp", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(spath + ".tmp", spath)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))  # atomic pointer flip
    return manifest


def list_snapshots(out_dir: str) -> list[dict]:
    """Snapshot history, oldest first (id, commit time, bucket progress)."""
    snaps = _snapshots_dir(out_dir)
    if not os.path.isdir(snaps):
        return []
    out = []
    for name in os.listdir(snaps):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(snaps, name)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda m: m["snapshot_id"])


def rollback(out_dir: str, snapshot_id: int) -> dict:
    """Re-point the table at an older snapshot's state.  Like Iceberg's
    rollback this creates a NEW snapshot whose state equals the old one
    (history is append-only; the abandoned snapshots stay readable via
    ``as_of``).  A subsequent ``run_extraction_job`` recomputes exactly the
    buckets the rollback un-committed — their stale data files are
    invisible until then (readers go through the manifest) and are
    overwritten when recommitted."""
    old = read_manifest(out_dir, as_of=snapshot_id)
    state = {
        k: old.get(k)
        for k in (
            "run_id",
            "committed_buckets",
            "committed_page_buckets",
            "n_buckets",
            "n_page_buckets",
        )
    }
    state["committed_updates"] = old.get("committed_updates", [])
    if old.get("compaction"):
        state["compaction"] = old["compaction"]
    state["rolled_back_from"] = read_manifest(out_dir).get("snapshot_id")
    state["rolled_back_to"] = snapshot_id
    return _commit_manifest(out_dir, state)


def run_extraction_job(
    documents: DataFrame,
    media: DataFrame,
    cfg: ExtractConfig,
    out_dir: str,
    n_buckets: int = 4,
    n_page_buckets: int | None = None,
    run_id: str | None = None,
    fail_after_bucket: int | None = None,
    fail_after_page_bucket: int | None = None,
) -> dict:
    """Run (or resume) the two-stage bucketed extraction job.  Returns the
    manifest.

    ``fail_after_bucket`` / ``fail_after_page_bucket`` inject a crash after
    that bucket commits — test hooks for the kill/rerun resume tests
    (SURVEY.md §5.5).
    """
    spark = documents.sparkSession
    os.makedirs(out_dir, exist_ok=True)
    n_page_buckets = n_page_buckets or n_buckets
    manifest = read_manifest(out_dir)
    if manifest["n_buckets"] not in (None, n_buckets):
        raise ValueError(
            f"bucket count mismatch: manifest has {manifest['n_buckets']}, got {n_buckets}"
        )
    if manifest["n_page_buckets"] not in (None, n_page_buckets):
        raise ValueError(
            f"page-bucket count mismatch: manifest has {manifest['n_page_buckets']},"
            f" got {n_page_buckets}"
        )
    run_id = manifest["run_id"] or run_id or uuid.uuid4().hex[:12]
    committed_pages = set(manifest["committed_page_buckets"])
    committed = set(manifest["committed_buckets"])
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def commit() -> dict:
        state = {
            "run_id": run_id,
            "committed_buckets": sorted(committed),
            "committed_page_buckets": sorted(committed_pages),
            "n_buckets": n_buckets,
            "n_page_buckets": n_page_buckets,
        }
        # carry forward table-level state this job does not own (updates
        # committed earlier, an active compaction) — a resumed bucket
        # commit must not un-commit them
        current = read_manifest(out_dir)
        if current.get("committed_updates"):
            state["committed_updates"] = current["committed_updates"]
        if current.get("compaction"):
            state["compaction"] = current["compaction"]
        return _commit_manifest(out_dir, state)

    # ---- stage 1: pages (skipped entirely on a doc-stage-only resume) ----
    refs_dir = os.path.join(out_dir, "refs")
    if len(committed_pages) < n_page_buckets:
        if not os.path.exists(os.path.join(refs_dir, "_SUCCESS")):
            # snapshot the distinct refs once: page buckets of a resumed run
            # see the same ref set even if `documents` changed underneath
            (
                explode_spans(documents)
                .filter(F.col("kind") == "media")
                .select("media_ref")
                .distinct()
                .write.mode("overwrite")
                .parquet(refs_dir)
            )
        refs_all = spark.read.parquet(refs_dir)
        pbucket_col = F.pmod(F.xxhash64("media_ref"), F.lit(n_page_buckets))
        for pb in range(n_page_buckets):
            if pb in committed_pages:
                continue
            refs_b = refs_all.filter(pbucket_col == pb)
            # persist the raw stage so cells AND lineage consume one kernel
            # run (deriving lineage from a second pass would re-run kernels)
            stage = run_page_stage(media, refs_b, cfg, n_parts).persist()
            cells, lineage = split_stage_output(stage)
            cells.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"cells/pbucket={pb}")
            )
            if lineage.limit(1).count() == 0:
                # empty page bucket (no refs hashed here, or Spark skipped
                # empty partitions): still commit an explicit zero row so
                # the lineage table covers every committed bucket
                from .extract import LINEAGE_SCHEMA

                lineage = spark.createDataFrame([(-1, 0, 0, 0, 0)], LINEAGE_SCHEMA)
            (
                lineage.withColumn("run_id", F.lit(run_id))
                .withColumn("bucket", F.lit(pb))
                .withColumn("committed_at_ms", F.lit(int(time.time() * 1000)))
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, f"lineage/pbucket={pb}"))
            )
            stage.unpersist()
            committed_pages.add(pb)
            manifest = commit()
            if fail_after_page_bucket is not None and pb >= fail_after_page_bucket:
                raise RuntimeError(f"injected failure after page bucket {pb}")

    # ---- stage 2: documents (joins committed cells; no kernel ever reruns) ----
    cells_all = spark.read.parquet(
        *[os.path.join(out_dir, f"cells/pbucket={pb}") for pb in sorted(committed_pages)]
    )
    bucket_col = F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
    for bucket in range(n_buckets):
        if bucket in committed:
            continue
        t0 = time.monotonic()
        docs_b = documents.filter(bucket_col == bucket)
        extracted, unresolved = assemble_spans(docs_b, cells_all, media)
        extracted.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"data/bucket={bucket}")
        )
        unresolved.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"errors/bucket={bucket}")
        )
        # committed-ids ledger: one skinny (doc_id) file per bucket, so
        # ingest idempotency anti-joins read O(touched buckets) of doc ids
        # instead of scanning the full data table (see committed_doc_ids)
        docs_b.select("doc_id").distinct().write.mode("overwrite").parquet(
            os.path.join(out_dir, f"doc_ids/bucket={bucket}")
        )
        written = spark.read.parquet(os.path.join(out_dir, f"data/bucket={bucket}"))
        stats = written.agg(
            F.countDistinct("doc_id").alias("docs"), F.count("*").alias("spans")
        ).collect()[0]
        n_unresolved = spark.read.parquet(
            os.path.join(out_dir, f"errors/bucket={bucket}")
        ).count()
        doc_lineage = spark.createDataFrame(
            [(bucket, int(stats.docs), int(stats.spans), int(n_unresolved),
              int((time.monotonic() - t0) * 1000))],
            DOC_LINEAGE_SCHEMA,
        )
        (
            doc_lineage.withColumn("run_id", F.lit(run_id))
            .withColumn("committed_at_ms", F.lit(int(time.time() * 1000)))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"doc_lineage/bucket={bucket}"))
        )
        committed.add(bucket)
        manifest = commit()
        if fail_after_bucket is not None and bucket >= fail_after_bucket:
            raise RuntimeError(f"injected failure after bucket {bucket}")
    return manifest


def run_incremental_update(
    new_documents: DataFrame,
    media: DataFrame,
    cfg: ExtractConfig,
    out_dir: str,
    idempotency_key: str | None = None,
) -> dict:
    """Extract a batch of NEWLY-ARRIVED documents into an already-committed
    table (the continuous-ingest path; the reference's analogue is
    ``ocr_generate_more_crops`` continuing over images added after the
    first run, reference scripts/ocr_generate_more_crops.py:11-18,69-76).

    Page-level incremental dedup: the delta's media refs are anti-joined
    against every ref already extracted (the base snapshot + prior
    updates), so a new document citing an ALREADY-EXTRACTED page reuses
    its committed cells — no image kernel reruns, at any corpus size the
    kernel cost of an update is proportional to its genuinely-new pages.

    One update = one snapshot commit: all delta files (cells, lineage,
    data, errors, doc lineage under ``*/update=U``) are written first and
    become visible only when the manifest commit appends U to
    ``committed_updates``.  A crash mid-update leaves the table at the
    previous snapshot; rerunning the same delta recomputes U's files
    idempotently (same id, overwrite mode) and commits once.

    Callers own doc-id disjointness (append-only ingest): re-submitting an
    already-committed document duplicates it, exactly like appending the
    same rows to any table twice.  EXCEPTION: pass ``idempotency_key`` (a
    caller-chosen tag, e.g. a streaming batch id) and a re-delivery of an
    already-committed key is a NO-OP — the tag rides the same atomic
    manifest commit as the data, so "committed" and "tag recorded" cannot
    diverge.  This is what makes ``foreachBatch`` ingest exactly-once:
    Structured Streaming replays a batch after a crash, the replay finds
    its key in the ledger and skips.
    """
    spark = new_documents.sparkSession
    manifest = read_manifest(out_dir)
    update_tags: dict[str, int] = dict(manifest.get("update_tags", {}))
    if idempotency_key is not None and idempotency_key in update_tags:
        return manifest
    if manifest["run_id"] is None or len(manifest["committed_buckets"]) < (
        manifest["n_buckets"] or 0
    ):
        raise ValueError(
            f"{out_dir} has no fully-committed base run; run run_extraction_job first"
        )
    committed_updates: list[int] = list(manifest.get("committed_updates", []))
    uid = (committed_updates[-1] + 1) if committed_updates else 1
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # refs already extracted: base snapshot + prior update deltas
    known_ref_paths = [os.path.join(out_dir, "refs")] + [
        os.path.join(out_dir, f"refs_updates/update={u}") for u in committed_updates
    ]
    known_refs = spark.read.parquet(*known_ref_paths)
    delta_refs = (
        explode_spans(new_documents)
        .filter(F.col("kind") == "media")
        .select("media_ref")
        .distinct()
        .join(known_refs, on="media_ref", how="left_anti")
    )
    delta_refs.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"refs_updates/update={uid}")
    )
    delta_refs = spark.read.parquet(os.path.join(out_dir, f"refs_updates/update={uid}"))

    # page stage over ONLY the genuinely-new pages
    stage = run_page_stage(media, delta_refs, cfg, n_parts).persist()
    cells, lineage = split_stage_output(stage)
    cells.write.mode("overwrite").parquet(os.path.join(out_dir, f"cells/update={uid}"))
    if lineage.limit(1).count() == 0:
        from .extract import LINEAGE_SCHEMA

        lineage = spark.createDataFrame([(-1, 0, 0, 0, 0)], LINEAGE_SCHEMA)
    (
        lineage.withColumn("run_id", F.lit(manifest["run_id"]))
        .withColumn("bucket", F.lit(-uid))  # negative id marks update deltas
        .withColumn("committed_at_ms", F.lit(int(time.time() * 1000)))
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, f"lineage/update={uid}"))
    )
    stage.unpersist()

    # doc stage: join ALL committed cells (base + every update incl. this
    # one) so shared pages resolve without recompute
    t0 = time.monotonic()
    cell_paths = [
        os.path.join(out_dir, f"cells/pbucket={pb}")
        for pb in manifest["committed_page_buckets"]
    ] + [
        os.path.join(out_dir, f"cells/update={u}")
        for u in [*committed_updates, uid]
    ]
    cells_all = spark.read.parquet(*cell_paths)
    extracted, unresolved = assemble_spans(new_documents, cells_all, media)
    extracted.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"data/update={uid}")
    )
    unresolved.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"errors/update={uid}")
    )
    # committed-ids ledger delta, partitioned by the SAME doc-id bucket
    # function as the base run: a later batch's anti-join prunes every
    # update delta to its touched dbucket=K directories
    (
        new_documents.select("doc_id")
        .distinct()
        .withColumn(
            "dbucket", F.pmod(F.xxhash64("doc_id"), F.lit(manifest["n_buckets"]))
        )
        .write.mode("overwrite")
        .partitionBy("dbucket")
        .parquet(os.path.join(out_dir, f"doc_ids/update={uid}"))
    )
    written = spark.read.parquet(os.path.join(out_dir, f"data/update={uid}"))
    stats = written.agg(
        F.countDistinct("doc_id").alias("docs"), F.count("*").alias("spans")
    ).collect()[0]
    n_unresolved = spark.read.parquet(
        os.path.join(out_dir, f"errors/update={uid}")
    ).count()
    doc_lineage = spark.createDataFrame(
        [(-uid, int(stats.docs), int(stats.spans), int(n_unresolved),
          int((time.monotonic() - t0) * 1000))],
        DOC_LINEAGE_SCHEMA,
    )
    (
        doc_lineage.withColumn("run_id", F.lit(manifest["run_id"]))
        .withColumn("committed_at_ms", F.lit(int(time.time() * 1000)))
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, f"doc_lineage/update={uid}"))
    )

    # single atomic commit makes the whole update visible
    if idempotency_key is not None:
        update_tags[idempotency_key] = uid
        # bound the ledger: the stream engine only ever replays its most
        # recent unacknowledged batches, so a long-lived continuous ingest
        # must not grow (and rewrite) one tag per batch forever
        if len(update_tags) > _MAX_UPDATE_TAGS:
            keep = sorted(update_tags.values())[-_MAX_UPDATE_TAGS:]
            floor = keep[0]
            update_tags = {k: v for k, v in update_tags.items() if v >= floor}
    state = {
        "run_id": manifest["run_id"],
        "committed_buckets": manifest["committed_buckets"],
        "committed_page_buckets": manifest["committed_page_buckets"],
        "n_buckets": manifest["n_buckets"],
        "n_page_buckets": manifest["n_page_buckets"],
        "committed_updates": [*committed_updates, uid],
        "update_tags": update_tags,
    }
    if manifest.get("compaction"):
        state["compaction"] = manifest["compaction"]
    return _commit_manifest(out_dir, state)


def _data_paths(out_dir: str, manifest: dict) -> list[str]:
    """Doc-output dirs a manifest's state reads: the compacted dir (if the
    state has one) plus every bucket/update NOT covered by it."""
    comp = manifest.get("compaction") or {}
    covered_b = set(comp.get("buckets", []))
    covered_u = set(comp.get("updates", []))
    paths = []
    if comp:
        paths.append(os.path.join(out_dir, f"data/compacted={comp['id']}"))
    paths += [
        os.path.join(out_dir, f"data/bucket={b}")
        for b in manifest["committed_buckets"]
        if b not in covered_b
    ] + [
        os.path.join(out_dir, f"data/update={u}")
        for u in manifest.get("committed_updates", [])
        if u not in covered_u
    ]
    return paths


def committed_doc_ids(
    spark: SparkSession, out_dir: str, buckets: list[int] | None = None
) -> DataFrame:
    """Distinct doc_ids of the committed table, read from the skinny
    ``doc_ids/`` ledger instead of the data files.

    ``buckets`` prunes the scan to those doc-id buckets
    (``pmod(xxhash64(doc_id), n_buckets)``): base ledger dirs are
    selected by path, update-delta ledgers by their ``dbucket=K``
    partition directories — so an ingest batch's idempotency anti-join
    costs O(batch + touched buckets) however many snapshots the table
    has accumulated, instead of rescanning the whole committed data set
    every micro-batch.  Falls back to the data files for tables written
    before the ledger existed."""
    manifest = read_manifest(out_dir)
    comp = manifest.get("compaction") or {}
    covered_b = set(comp.get("buckets", []))
    covered_u = set(comp.get("updates", []))
    base = [b for b in manifest["committed_buckets"] if b not in covered_b]
    updates = [
        u for u in manifest.get("committed_updates", []) if u not in covered_u
    ]
    comp_path = (
        os.path.join(out_dir, f"doc_ids/compacted={comp['id']}") if comp else None
    )
    if comp_path is not None and not os.path.exists(comp_path):
        # compaction predates the ledger fold: its covered dirs still
        # exist, read them directly
        base = manifest["committed_buckets"]
        updates = manifest.get("committed_updates", [])
        comp_path = None
    if buckets is not None:
        wanted = set(buckets)
        base = [b for b in base if b in wanted]
    base_paths = [os.path.join(out_dir, f"doc_ids/bucket={b}") for b in base]
    upd_paths = [os.path.join(out_dir, f"doc_ids/update={u}") for u in updates]
    if any(not os.path.exists(p) for p in base_paths + upd_paths):
        # pre-ledger table: the old (full-scan) behavior
        return read_extracted(spark, out_dir).select("doc_id").distinct()
    # basePath anchors partition discovery at the ledger root (the
    # explicit path lists still gate visibility to committed dirs only);
    # without it Spark treats each bucket=K / update=U path as its own
    # root and raises CONFLICTING_DIRECTORY_STRUCTURES
    root = os.path.join(out_dir, "doc_ids")
    frames = []
    if comp_path is not None:
        cdf = spark.read.option("basePath", root).parquet(comp_path)
        if buckets is not None:
            cdf = cdf.where(F.col("dbucket").isin([int(b) for b in buckets]))
        frames.append(cdf.select("doc_id"))
    if base_paths:
        frames.append(
            spark.read.option("basePath", root).parquet(*base_paths).select("doc_id")
        )
    if upd_paths:
        upd = spark.read.option("basePath", root).parquet(*upd_paths)
        if buckets is not None:
            # dbucket is a partition-directory column: this filter prunes
            # directories at file-listing time, no data files are opened
            upd = upd.where(F.col("dbucket").isin([int(b) for b in buckets]))
        frames.append(upd.select("doc_id"))
    if not frames:
        return spark.createDataFrame([], "doc_id string")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.distinct()


def read_extracted(
    spark: SparkSession, out_dir: str, as_of: int | None = None
) -> DataFrame:
    """Read back only COMMITTED doc buckets (uncommitted files are
    invisible, like reading an Iceberg snapshot).  ``as_of`` reads the
    table as it stood at that snapshot id (time travel)."""
    manifest = read_manifest(out_dir, as_of=as_of)
    paths = _data_paths(out_dir, manifest)
    if not paths:
        raise ValueError(f"no committed buckets under {out_dir}")
    return spark.read.parquet(*paths)


def compact(spark: SparkSession, out_dir: str, target_partitions: int = 1) -> dict:
    """Rewrite the committed doc output into ``target_partitions`` coalesced
    files (Iceberg's rewrite_data_files analogue).  Small-file pressure is
    structural here: every bucket/update commit writes its own directory,
    so a long-lived table accretes one dir per commit; compaction folds
    them into one dir and commits a snapshot whose manifest records which
    buckets/updates the compacted dir COVERS.  Later commits (resumed
    buckets, new updates) simply append alongside it.  Old files are NOT
    deleted — older snapshots still reference them; reclaim space with
    ``expire_snapshots``."""
    manifest = read_manifest(out_dir)
    cid = int((manifest.get("compaction") or {}).get("id", 0)) + 1
    df = read_extracted(spark, out_dir)
    dest = os.path.join(out_dir, f"data/compacted={cid}")
    df.repartition(target_partitions).write.mode("overwrite").parquet(dest)
    if manifest.get("n_buckets"):
        # fold the committed-ids ledger too: without this a long-lived
        # continuous-ingest table accretes one doc_ids/update=U dir per
        # batch forever, and the ingest anti-join's touched-bucket scan
        # grows with update count instead of staying one dir per bucket
        (
            df.select("doc_id")
            .distinct()
            .withColumn(
                "dbucket",
                F.pmod(F.xxhash64("doc_id"), F.lit(manifest["n_buckets"])),
            )
            .write.mode("overwrite")
            .partitionBy("dbucket")
            .parquet(os.path.join(out_dir, f"doc_ids/compacted={cid}"))
        )
    state = {
        k: manifest.get(k)
        for k in (
            "run_id",
            "committed_buckets",
            "committed_page_buckets",
            "n_buckets",
            "n_page_buckets",
            "committed_updates",
        )
    }
    # the idempotency ledger must survive compaction, or a stream batch
    # replayed after a compact would re-commit its delta
    if manifest.get("update_tags"):
        state["update_tags"] = manifest["update_tags"]
    state["compaction"] = {
        "id": cid,
        "buckets": manifest["committed_buckets"],
        "updates": manifest.get("committed_updates", []),
    }
    return _commit_manifest(out_dir, state)


def expire_snapshots(out_dir: str, keep_from: int) -> list[str]:
    """Drop snapshots older than ``keep_from`` and garbage-collect doc-output
    dirs no RETAINED snapshot references (Iceberg expire_snapshots +
    remove_orphan_files in one).  Returns the deleted paths.  Cells and
    lineage are never collected — incremental updates anti-join against
    them regardless of snapshot retention."""
    import shutil

    kept = [m for m in list_snapshots(out_dir) if m["snapshot_id"] >= keep_from]
    if not kept:
        raise ValueError(f"keep_from={keep_from} would drop every snapshot")
    referenced: set[str] = set()
    for m in kept:
        referenced.update(os.path.abspath(p) for p in _data_paths(out_dir, m))
    deleted = []
    data_root = os.path.join(out_dir, "data")
    if os.path.isdir(data_root):
        for name in sorted(os.listdir(data_root)):
            p = os.path.abspath(os.path.join(data_root, name))
            if p not in referenced:
                shutil.rmtree(p)
                deleted.append(p)
    snaps = _snapshots_dir(out_dir)
    for m in list_snapshots(out_dir):
        if m["snapshot_id"] < keep_from:
            p = os.path.join(snaps, f"v{m['snapshot_id']}.json")
            os.remove(p)
            deleted.append(p)
    return deleted


def read_lineage(
    spark: SparkSession, out_dir: str, as_of: int | None = None
) -> DataFrame:
    """Page-stage lineage rows (per shuffle partition: page/cell/char
    counts + wall time) of committed page buckets."""
    manifest = read_manifest(out_dir, as_of=as_of)
    paths = [
        os.path.join(out_dir, f"lineage/pbucket={b}")
        for b in manifest["committed_page_buckets"]
    ] + [
        os.path.join(out_dir, f"lineage/update={u}")
        for u in manifest.get("committed_updates", [])
    ]
    if not paths:
        raise ValueError(f"no committed lineage under {out_dir}")
    return spark.read.parquet(*paths)


def read_doc_lineage(
    spark: SparkSession, out_dir: str, as_of: int | None = None
) -> DataFrame:
    """Doc-stage lineage rows (per doc bucket: doc/span/unresolved counts +
    wall time) of committed doc buckets; incremental updates appear with
    negative bucket ids (-update_id)."""
    manifest = read_manifest(out_dir, as_of=as_of)
    paths = [
        os.path.join(out_dir, f"doc_lineage/bucket={b}")
        for b in manifest["committed_buckets"]
    ] + [
        os.path.join(out_dir, f"doc_lineage/update={u}")
        for u in manifest.get("committed_updates", [])
    ]
    if not paths:
        raise ValueError(f"no committed doc lineage under {out_dir}")
    return spark.read.parquet(*paths)
