"""Corpus <-> Spark/parquet conversion (explicit schemas everywhere)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .corpus import Corpus, span_tuples

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_STRUCT)),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("layout_id", LongType()),
    ]
)

GOLDEN_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("order", IntegerType(), False),
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
    ]
)


def documents_df(spark: SparkSession, corpus: Corpus) -> DataFrame:
    rows = [
        (
            r.doc_id,
            span_tuples(r.spans),
        )
        for r in corpus.documents.itertuples()
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def media_df(spark: SparkSession, corpus: Corpus) -> DataFrame:
    rows = [
        (r.media_ref, r.content, r.width, r.height, r.layout_id)
        for r in corpus.media.itertuples()
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def golden_df(spark: SparkSession, corpus: Corpus) -> DataFrame:
    rows = [
        (r.doc_id, int(r.order), r.kind, r.text, r.media_ref)
        for r in corpus.golden.itertuples()
    ]
    return spark.createDataFrame(rows, GOLDEN_SCHEMA)


def write_corpus_parquet(corpus: Corpus, out_dir: str) -> None:
    """Persist documents/media as parquet (arrow schemas mirror the Spark
    ones) so benches can reuse a corpus without re-rendering."""
    os.makedirs(out_dir, exist_ok=True)
    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    doc_tbl = pa.table(
        {
            "doc_id": pa.array(corpus.documents["doc_id"], pa.string()),
            "spans": pa.array(
                [
                    [
                        {
                            "kind": s["kind"],
                            "text": s["text"],
                            "media_ref": s["media_ref"],
                            "offset": s["offset"],
                        }
                        for s in spans
                    ]
                    for spans in corpus.documents["spans"]
                ],
                span_type,
            ),
        }
    )
    pq.write_table(doc_tbl, os.path.join(out_dir, "documents.parquet"))
    media_tbl = pa.table(
        {
            "media_ref": pa.array(corpus.media["media_ref"], pa.string()),
            "content": pa.array(corpus.media["content"], pa.binary()),
            "width": pa.array(corpus.media["width"], pa.int32()),
            "height": pa.array(corpus.media["height"], pa.int32()),
            "layout_id": pa.array(corpus.media["layout_id"], pa.int64()),
        }
    )
    # small row groups (pages are ~1 MB each) so the scan splits into many
    # partitions and the CPU-bound extraction stage needs NO byte shuffle
    pq.write_table(media_tbl, os.path.join(out_dir, "media.parquet"), row_group_size=8)
