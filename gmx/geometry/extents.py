"""Derived geometry layer: wide metadata -> typed, validated extents.

The parity layer keeps coordinates as strings (reference typing, SURVEY §1.2);
this is the first place values become doubles.  Validation follows SURVEY §2.7:
reject lon outside [-180,180], lat outside [-90,90], south>north; west>east is
*not* rejected — it is an antimeridian-crossing box and is split into two rows
(``part`` column 0/1) so every downstream operator sees west<=east.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def extents_df(meta: DataFrame, split_antimeridian: bool = True) -> DataFrame:
    """(doc_id, west, south, east, north) doubles from ``bounding_box``;
    invalid rows are dropped (use :func:`quarantine_df` to collect them)."""

    e = meta.select(
        "doc_id",
        "standard",
        F.col("bounding_box.west").try_cast("double").alias("west"),
        F.col("bounding_box.south").try_cast("double").alias("south"),
        F.col("bounding_box.east").try_cast("double").alias("east"),
        F.col("bounding_box.north").try_cast("double").alias("north"),
    ).filter(
        F.col("west").isNotNull() & F.col("south").isNotNull()
        & F.col("east").isNotNull() & F.col("north").isNotNull()
    )

    valid = (
        (F.col("west") >= -180) & (F.col("west") <= 180)
        & (F.col("east") >= -180) & (F.col("east") <= 180)
        & (F.col("south") >= -90) & (F.col("north") <= 90)
        & (F.col("south") <= F.col("north"))
    )
    e = e.filter(valid)

    if not split_antimeridian:
        return e.filter(F.col("west") <= F.col("east"))

    # west>east crosses the antimeridian: split into [west,180] (part 0) and
    # [-180,east] (part 1).  ``split`` marks both rows of a crossing box so
    # pair-emitting joins can dedup pairs a counterpart reaches via BOTH
    # parts; non-crossing rows are part 0, split=false.
    crossing = F.col("west") > F.col("east")
    whole = (
        e.filter(~crossing)
        .withColumn("part", F.lit(0))
        .withColumn("split", F.lit(False))
    )
    left = (
        e.filter(crossing)
        .withColumn("east", F.lit(180.0))
        .withColumn("part", F.lit(0))
        .withColumn("split", F.lit(True))
    )
    right = (
        e.filter(crossing)
        .withColumn("west", F.lit(-180.0))
        .withColumn("part", F.lit(1))
        .withColumn("split", F.lit(True))
    )
    return whole.unionByName(left).unionByName(right)


def quarantine_df(meta: DataFrame) -> DataFrame:
    """Rows whose bounding box fails validation — the error side-channel
    (reference raises ValidationError per doc, utils.py:696-710; at scale we
    route rows instead of raising)."""

    b = meta.select(
        "doc_id",
        F.col("bounding_box.west").try_cast("double").alias("west"),
        F.col("bounding_box.south").try_cast("double").alias("south"),
        F.col("bounding_box.east").try_cast("double").alias("east"),
        F.col("bounding_box.north").try_cast("double").alias("north"),
        F.col("bounding_box").isNotNull().alias("has_box"),
    )
    bad = (
        F.col("has_box")
        & (
            F.col("west").isNull() | F.col("east").isNull()
            | F.col("south").isNull() | F.col("north").isNull()
            | (F.col("west") < -180) | (F.col("west") > 180)
            | (F.col("east") < -180) | (F.col("east") > 180)
            | (F.col("south") < -90) | (F.col("north") > 90)
            | (F.col("south") > F.col("north"))
        )
    )
    return b.filter(bad).drop("has_box")
