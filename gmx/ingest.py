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

# marker emitted for a declared charset the JVM decode set cannot honor;
# xmlkit.parse_xml recognizes it and raises the message as the error row
INGEST_ERROR_PREFIX = "<?gmx-ingest-error unsupported declared encoding: "


def _decoded_xml(content: Column) -> Column:
    """Encoding-aware text decode of a raw XML file (the reference reads
    file bytes through ElementTree, which honors BOMs and the XML
    declaration's encoding): UTF-16 BOMs -> UTF-16; any declared charset in
    the JVM decode set (iso-8859-1/latin-1, windows-1252, us-ascii,
    utf-16/16le/16be) -> that charset; else UTF-8.  A file DECLARING a
    charset outside that set (e.g. shift_jis) is NOT silently mis-decoded as
    UTF-8 mojibake — it yields an ingest-error marker that parse_xml
    surfaces as the document's error row.  A decoded leading BOM char is
    stripped so ET never sees it."""

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
        .when(declared.isin("us-ascii", "ascii"), F.decode(content, "US-ASCII"))
        .when(declared == "utf-16le", F.decode(content, "UTF-16LE"))
        .when(declared == "utf-16be", F.decode(content, "UTF-16BE"))
        .when(declared == "utf-16", F.decode(content, "UTF-16"))
        .when(
            ~declared.isin("", "utf-8", "utf8"),
            F.concat(F.lit(INGEST_ERROR_PREFIX), declared, F.lit("?>")),
        )
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


_DECLARED_NAME = {
    "utf-8": "UTF-8", "utf8": "UTF-8",
    "iso-8859-1": "ISO-8859-1", "latin-1": "ISO-8859-1", "latin1": "ISO-8859-1",
    "windows-1252": "windows-1252",
    "us-ascii": "US-ASCII", "ascii": "US-ASCII",
    "utf-16": "UTF-16", "utf-16le": "UTF-16LE", "utf-16be": "UTF-16BE",
}


def write_xml_files(serialized: DataFrame, out_dir: str, encoding: str = "utf-8") -> None:
    """S5 sink: one ``.xml`` file per document with an XML declaration and
    byte encoding in ``encoding`` — the reference's
    ``write(out_file_or_path, encoding=...)`` (metadata_parser.py:377-391)
    as a distributed file sink.  Input is the (doc_id, xml) output of
    gmx.convert.serialize_df; filenames derive from doc_id (path separators
    sanitized).  The declared charset matches what corpus_from_xml_files
    honors, so write -> re-ingest round-trips."""

    import hashlib
    import os
    import re as _re

    declared = _DECLARED_NAME.get(encoding.lower())
    if declared is None:
        raise ValueError(f"unsupported encoding: {encoding}")

    def write_part(rows) -> None:
        os.makedirs(out_dir, exist_ok=True)
        for row in rows:
            # leading '_'/'.' files are invisible to Spark file sources
            # (metadata-file convention) — strip so re-ingest sees them
            safe = _re.sub(r"[^A-Za-z0-9._-]", "_", row.doc_id).lstrip("_.")
            if safe != row.doc_id:
                # sanitization can collide distinct ids ('a/b' vs 'a_b') or
                # empty out entirely — suffix a stable hash of the original
                tag = hashlib.sha1(row.doc_id.encode()).hexdigest()[:10]
                safe = (safe + "-" if safe else "") + tag
            name = safe + ".xml"
            decl = f"<?xml version='1.0' encoding='{declared}'?>\n"
            with open(os.path.join(out_dir, name), "wb") as fh:
                fh.write((decl + row.xml).encode(encoding))

    serialized.select("doc_id", "xml").foreachPartition(write_part)


def corpus_from_xml_strings(spark: SparkSession, docs: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, xml_string) pairs -> span-corpus rows (the reference's
    string-content entry point, driver-side; for tests and small batches)."""

    rows = [
        (doc_id, [("text", xml, "", 0)])
        for doc_id, xml in docs
    ]
    return spark.createDataFrame(rows, schema=CORPUS_SCHEMA)
