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

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from gmx.schema import CORPUS_SCHEMA

# matches .xml in any case; shared by the batch and streaming connectors so
# the same directory yields the same corpus either way
XML_GLOB = "*.[xX][mM][lL]"

BINARY_FILE_SCHEMA = "path string, modificationTime timestamp, length long, content binary"


def _decoded_xml(content: Column) -> Column:
    """Encoding-aware text decode of a raw XML file (the reference reads
    file bytes through ElementTree, which honors BOMs and the XML
    declaration's encoding): UTF-16 BOMs -> UTF-16; a declared single-byte
    charset (iso-8859-1 / latin-1 / windows-1252) -> that charset; else
    UTF-8.  A decoded leading BOM char is stripped so ET never sees it."""

    utf16_bom = (
        (F.substring(content, 1, 2) == F.lit(bytes([0xFF, 0xFE])))
        | (F.substring(content, 1, 2) == F.lit(bytes([0xFE, 0xFF])))
    )
    # header peek via a byte-transparent charset; UTF-16 handled before this
    header = F.lower(F.decode(F.substring(content, 1, 200), "ISO-8859-1"))
    declared = F.regexp_extract(header, r'encoding=["\']([a-z0-9_\-]+)', 1)
    text = (
        F.when(utf16_bom, F.decode(content, "UTF-16"))
        .when(
            declared.isin("iso-8859-1", "latin-1", "latin1"),
            F.decode(content, "ISO-8859-1"),
        )
        .when(declared == "windows-1252", F.decode(content, "windows-1252"))
        .otherwise(F.decode(content, "UTF-8"))
    )
    return F.regexp_replace(text, "\\A\uFEFF", "")


def xml_files_to_spans(raw: DataFrame) -> DataFrame:
    """(path, content) binaryFile rows -> span-corpus rows.  One document
    per file; ``doc_id`` is the file path without scheme or .xml extension —
    path-based, so same-named files in different directories cannot collide
    into one key.  Ingested documents carry a single text span (offset 0) —
    the span contract only requires that spans reassemble to the document;
    section splitting is an emission concern (gmx.convert.respan_df).
    Media attachments are not a raw-XML concept, so ``media_ref`` stays
    empty."""

    doc_id = F.regexp_replace(
        F.regexp_replace(F.col("path"), r"^[A-Za-z0-9+.\-]+:(//)?", ""),
        r"\.[Xx][Mm][Ll]$",
        "",
    )
    return raw.select(
        doc_id.alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                _decoded_xml(F.col("content")).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).cast(CORPUS_SCHEMA["spans"].dataType).alias("spans"),
    )


def corpus_from_xml_files(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of raw XML documents -> span-corpus rows."""

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", XML_GLOB)
        .load(path)
    )
    return xml_files_to_spans(raw)


def corpus_from_xml_strings(spark: SparkSession, docs: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, xml_string) pairs -> span-corpus rows (the reference's
    string-content entry point, driver-side; for tests and small batches)."""

    rows = [
        (doc_id, [("text", xml, "", 0)])
        for doc_id, xml in docs
    ]
    return spark.createDataFrame(rows, schema=CORPUS_SCHEMA)
