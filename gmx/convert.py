"""Cross-standard conversion and serialization as Spark operators.

Q1 (convert_parser_to, metadata_parser.py:25-43): because extraction already
lands every standard in ONE wide schema, conversion is just serialization
with a different dialect's template — ``convert_df`` re-emits each record as
XML in the target standard and (optionally) re-extracts it to prove
round-trip equality.  S4/S5: ``serialize_df`` is the write path (one Arrow
pass; writes only primary locations, erasing secondary ones — U1's rule).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from gmx.extract import extract_record
from gmx.schema import METADATA_SCHEMA
from gmx.serialize import serialize

SERIALIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("standard", T.StringType()),
    T.StructField("xml", T.StringType()),
])

_REC_FIELDS = [
    f.name for f in METADATA_SCHEMA.fields
    if f.name not in ("doc_id", "standard", "error", "media_refs")
]


def _to_plain(v):
    """Arrow->pandas hands back numpy arrays (whose truthiness raises) and
    nested dicts; normalize to plain lists/dicts for the serialize kernel."""

    if v is None or isinstance(v, (str, int, float)):
        return v
    if isinstance(v, dict):
        return {k: _to_plain(x) for k, x in v.items()}
    if hasattr(v, "tolist") or isinstance(v, (list, tuple)):
        return [_to_plain(x) for x in (v.tolist() if hasattr(v, "tolist") else v)]
    return v


def serialize_df(meta: DataFrame, target_standard: str | None = None) -> DataFrame:
    """Wide rows -> canonical XML (S4).  ``target_standard`` of None keeps
    each row's own standard; naming one performs Q1 conversion."""

    cols = ["doc_id", "standard"] + _REC_FIELDS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = pdf.to_dict("records")
            out = {"doc_id": [], "standard": [], "xml": []}
            for rec in recs:
                rec = {k: _to_plain(v) for k, v in rec.items()}
                std = target_standard or rec["standard"]
                out["doc_id"].append(rec["doc_id"])
                out["standard"].append(std)
                out["xml"].append(serialize(rec, std))
            yield pd.DataFrame(out)

    return meta.select(*cols).mapInPandas(run, schema=SERIALIZED_SCHEMA)


def reextract_df(serialized: DataFrame) -> DataFrame:
    """XML back to wide rows — used to assert conversion round-trips."""

    out_fields = [f.name for f in METADATA_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id, xml in zip(pdf["doc_id"], pdf["xml"]):
                rec = extract_record(xml)
                rec["doc_id"] = doc_id
                rec["media_refs"] = []
                recs.append(rec)
            yield pd.DataFrame({name: [r.get(name) for r in recs] for name in out_fields})

    return serialized.mapInPandas(run, schema=METADATA_SCHEMA)


def convert_df(meta: DataFrame, target_standard: str) -> DataFrame:
    """Q1: re-emit every record in ``target_standard`` and re-extract."""

    return reextract_df(serialize_df(meta, target_standard))


def respan_df(meta: DataFrame) -> DataFrame:
    """Wide rows -> span sequences (the parity emission surface): one text
    span per top-level XML section + zero-length media spans from
    ``media_refs``, offsets running — the exact span contract the corpus
    carries, so corpus.spans == respan(extract(corpus)).spans is the
    engine's end-to-end invariant."""

    from gmx.schema import CORPUS_SCHEMA
    from gmx.serialize import serialize_sections

    cols = ["doc_id", "standard", "media_refs"] + _REC_FIELDS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "spans": []}
            for rec in pdf.to_dict("records"):
                rec = {k: _to_plain(v) for k, v in rec.items()}
                # re-emit the document as stored: inline attributes, not the
                # catalog-resolved view
                rec["attributes"] = rec.get("attributes_inline") or rec["attributes"]
                sections = serialize_sections(rec, rec["standard"])
                spans, offset = [], 0
                for sec in sections:
                    spans.append({"kind": "text", "text": sec, "media_ref": "", "offset": offset})
                    offset += len(sec)
                for ref in rec.get("media_refs") or []:
                    spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": offset})
                out["doc_id"].append(rec["doc_id"])
                out["spans"].append(spans)
            yield pd.DataFrame(out)

    return meta.select(*cols).mapInPandas(run, schema=CORPUS_SCHEMA)
