"""Structured Streaming: incremental span-corpus ingest.

The reference is batch-only; streaming here covers the engine's incremental
ingest path (SURVEY §1.3): new span files (Iceberg appends in production,
parquet drops locally) flow through the SAME reassembly + extraction
operators — mapInPandas works identically under a streaming plan — into an
append sink.  Spark's checkpoint directory provides exactly-once file-level
progress, complementing gmx.checkpoints' bucket-level lineage for batch.

``ingest_available`` uses Trigger.AvailableNow: each call drains whatever
arrived since the last checkpointed offset and stops — the incremental-batch
pattern (run it from a scheduler; restart-safe by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gmx import pipeline
from gmx.ingest import BINARY_FILE_SCHEMA, XML_GLOB, xml_files_to_spans
from gmx.schema import CORPUS_SCHEMA


def stream_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)


def extract_stream(corpus_stream: DataFrame) -> DataFrame:
    """Streaming plan: reassemble -> dispatch filter -> Arrow extraction.
    Catalog resolution needs a stream-static join: catalogs are read as a
    static side (they change slowly; refresh per restart)."""

    docs = pipeline.with_document_text(corpus_stream)
    wide = pipeline.extract_wide(docs)
    return wide.filter(F.col("standard").isin(*pipeline.METADATA_STANDARDS))


def stream_xml_directory(spark: SparkSession, xml_dir: str) -> DataFrame:
    """Streaming twin of gmx.ingest.corpus_from_xml_files: raw metadata XML
    files arriving in a directory become span-corpus rows incrementally
    (file-source streaming; each micro-batch picks up new files).  Shares
    the batch connector's glob and projection, so the same directory yields
    the same corpus either way."""

    raw = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", XML_GLOB)
        .load(xml_dir)
    )
    return xml_files_to_spans(raw)


def _drain_available(meta: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    q = (
        meta.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ingest_available(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all currently-available corpus files into the extracted table,
    resuming from the stream checkpoint; returns when caught up."""

    _drain_available(extract_stream(stream_corpus(spark, corpus_dir)), out_dir, checkpoint_dir)


def ingest_xml_available(
    spark: SparkSession,
    xml_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain currently-available raw XML files -> extracted parquet table,
    resuming from the stream checkpoint (incremental reference-input
    ingest: drop files in, run again, only new files are processed)."""

    _drain_available(extract_stream(stream_xml_directory(spark, xml_dir)), out_dir, checkpoint_dir)
