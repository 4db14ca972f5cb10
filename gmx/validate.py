"""Validation as dataflow: quarantine DataFrames instead of exceptions.

The reference raises ``ValidationError`` per document (validate_any cascade,
/root/reference/gis_metadata/utils.py:525-710).  At 10^12 docs an exception
is not an option: rules become boolean column expressions and offending rows
are routed to a violations side-channel (doc_id, property, rule, detail) —
the same information ``ValidationError.invalid/missing`` carries
(exceptions.py:43-50), joinable back to the corpus for repair.

Structural rules (Q4/Q5/Q8 — keys subset of definition, leaf types) are
enforced by the StructType schema at write time and therefore cannot be
violated inside the engine; the runtime rules that remain data-dependent are
implemented here:
- Q6 date-type enum + cardinality matrix (utils.py:599-641)
- bounding-box numeric/range rules (SURVEY §2.7; see also geometry.extents)
- emptiness/shape rules for complex lists (labels present, etc.)
Q2 (required-property schema completeness, utils.py:672-685) is a driver-side
plan assertion: validate_schema raises before any job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gmx.specs import SUPPORTED_PROPS

DATE_TYPES = ("", "single", "multiple", "range")


class SchemaValidationError(ValueError):
    pass


def validate_schema(meta: DataFrame, required: tuple[str, ...] = SUPPORTED_PROPS) -> None:
    """Q2: every supported property must be bound as a column (driver-side,
    mirrors validate_properties raising with the missing set)."""

    missing = sorted(set(required) - set(meta.columns))
    if missing:
        raise SchemaValidationError(f"Missing property names: {','.join(missing)}")


def _violation(df: DataFrame, cond, prop: str, rule: str, detail) -> DataFrame:
    return df.filter(cond).select(
        "doc_id",
        F.lit(prop).alias("property"),
        F.lit(rule).alias("rule"),
        detail.cast("string").alias("detail"),
    )


def validation_report(meta: DataFrame) -> DataFrame:
    """All rule violations in the corpus: (doc_id, property, rule, detail)."""

    n_vals = F.coalesce(F.size("dates.values"), F.lit(0))
    dtype = F.coalesce(F.col("dates.type"), F.lit(""))

    parts = [
        # Q6: date type enum
        _violation(
            meta, F.col("dates").isNotNull() & ~dtype.isin(*DATE_TYPES),
            "dates", "type_not_in_enum", dtype,
        ),
        # Q6: cardinality matrix — missing=0, single=1, range=2, multiple>=2
        _violation(
            meta,
            F.col("dates").isNotNull()
            & (
                ((dtype == "") & (n_vals != 0))
                | ((dtype == "single") & (n_vals != 1))
                | ((dtype == "range") & (n_vals != 2))
                | ((dtype == "multiple") & (n_vals < 2))
            ),
            "dates", "cardinality_mismatch", F.concat_ws(":", dtype, n_vals),
        ),
        # bbox numeric + range rules
        _violation(
            meta,
            F.col("bounding_box").isNotNull()
            & (
                F.col("bounding_box.west").try_cast("double").isNull()
                | F.col("bounding_box.east").try_cast("double").isNull()
                | F.col("bounding_box.south").try_cast("double").isNull()
                | F.col("bounding_box.north").try_cast("double").isNull()
            ),
            "bounding_box", "not_numeric",
            F.to_json("bounding_box"),
        ),
        _violation(
            meta,
            F.col("bounding_box").isNotNull()
            & F.col("bounding_box.west").try_cast("double").isNotNull()
            & (
                (F.abs(F.col("bounding_box.west").try_cast("double")) > 180)
                | (F.abs(F.col("bounding_box.east").try_cast("double")) > 180)
                | (F.abs(F.col("bounding_box.south").try_cast("double")) > 90)
                | (F.abs(F.col("bounding_box.north").try_cast("double")) > 90)
                | (
                    F.col("bounding_box.south").try_cast("double")
                    > F.col("bounding_box.north").try_cast("double")
                )
            ),
            "bounding_box", "out_of_range", F.to_json("bounding_box"),
        ),
        # attributes must carry a label (reference requires str label at write)
        _violation(
            meta,
            F.exists("attributes", lambda a: a["label"] == ""),
            "attributes", "empty_label", F.size("attributes"),
        ),
        # ingest errors routed rather than raised (NoContent/InvalidContent)
        _violation(meta, F.col("error") != "", "_document", "ingest_error", F.col("error")),
    ]

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def quarantine_split(meta: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — quarantined rows are those with >= 1 violation;
    anti-join keeps the clean path shuffle-free on the big side."""

    bad_ids = validation_report(meta).select("doc_id").distinct()
    clean = meta.join(bad_ids, "doc_id", "left_anti")
    bad = meta.join(bad_ids, "doc_id", "left_semi")
    return clean, bad
