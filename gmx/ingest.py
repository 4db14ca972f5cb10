"""Source connectors: external document formats -> the span-corpus schema.

The reference accepts raw XML as file objects / strings / paths
(get_parsed_content, /root/reference/gis_metadata/metadata_parser.py:83-133).
Its users hold directories of metadata XML files; these readers land that
data in the engine's canonical input shape — the ``(doc_id, spans)`` table
of BASELINE.json's input_hint — after which every downstream operator
(extraction, conversion, spatial layer) applies unchanged.

Scale shape: ``binaryFile`` scans are ordinary distributed file scans
(splits by file; Spark lists in parallel); ingest is a narrow projection,
so the write to the corpus table is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gmx.schema import CORPUS_SCHEMA


def corpus_from_xml_files(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of raw XML documents -> span-corpus rows.

    One document per file; ``doc_id`` is the file name without extension.
    Ingested documents carry a single text span (offset 0) — the span
    contract only requires that spans reassemble to the document; section
    splitting is an emission concern (gmx.convert.respan_df), not an
    ingest requirement.  Media attachments are not a raw-XML concept, so
    ``media_ref`` stays empty."""

    raw = spark.read.format("binaryFile").load(path)
    xml = F.decode(F.col("content"), "UTF-8")
    return raw.select(
        F.regexp_extract(
            F.reverse(F.split(F.col("path"), "/"))[0], r"^(.*?)(?:\.[Xx][Mm][Ll])?$", 1
        ).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                xml.alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).cast(CORPUS_SCHEMA["spans"].dataType).alias("spans"),
    )


def corpus_from_xml_strings(spark: SparkSession, docs: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, xml_string) pairs -> span-corpus rows (the reference's
    string-content entry point, driver-side; for tests and small batches)."""

    rows = [
        (doc_id, [("text", xml, "", 0)])
        for doc_id, xml in docs
    ]
    return spark.createDataFrame(rows, schema=CORPUS_SCHEMA)
