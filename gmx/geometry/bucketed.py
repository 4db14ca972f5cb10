"""Bucketed cell-index tables: shuffle-free repeated spatial joins.

PLANS.md §11 prices the cell-index equi-joins at c x ~48 B per doc PER
QUERY — the dominant recurring shuffle at corpus scale.  Spark's native
answer is bucketing: persist the exploded (cell, doc) covering index ONCE,
bucketed and sorted by ``cell``; every later join keyed on ``cell`` between
co-bucketed sides then runs with NO Exchange on the bucketed side(s) — the
shuffle is paid once at write time, not per query.

This is catalog-level metadata, so the index must be written with
``bucketBy(...).saveAsTable(...)`` (a path-only parquet write cannot carry
bucketing info).  The tables are external (``option("path", ...)``) so the
data lives where the caller says; on a real deployment these are Iceberg
tables with a bucket partition transform and the same join shape.

Reference: none (north-rule scale mechanism; the reference processes one
document at a time and has no joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gmx.geometry.cellgrid import DEFAULT_LEVEL, cell_id_expr, cell_ix_expr, cell_iy_expr
from gmx.geometry.joins import DEFAULT_LARGE_CAP, _overlap, _with_tier, cover_cells


def write_cell_index(
    extents: DataFrame,
    table: str,
    path: str,
    level: int = DEFAULT_LEVEL,
    large_cap: int = DEFAULT_LARGE_CAP,
    buckets: int = 16,
) -> None:
    """Materialize the small-tier covering index as a bucketed+sorted table.

    Only the small tier is indexed (the large/split tier goes through the
    broadcast or overflow path exactly as in the on-the-fly joins, and is
    stored alongside as ``<table>_large`` — a tiny unbucketed table).
    ``buckets`` must match between any two tables that will be joined
    shuffle-free; at corpus scale pick buckets ~ O(cluster cores).
    """

    ext = _with_tier(extents, level, large_cap)
    small = ext.filter(~F.col("is_large"))
    idx = cover_cells(small, level)
    (
        idx.write.mode("overwrite")
        .bucketBy(buckets, "cell")
        .sortBy("cell")
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )
    large = ext.filter(F.col("is_large")).select(
        "doc_id", "west", "south", "east", "north", "split"
    )
    (
        large.write.mode("overwrite")
        .option("path", f"{path}_large")
        .format("parquet")
        .saveAsTable(f"{table}_large")
    )


def index_self_join(spark: SparkSession, table: str, level: int = DEFAULT_LEVEL) -> DataFrame:
    """The small x small overlap pairs from the bucketed index alone —
    both join inputs are bucketed scans of the same table, so the physical
    plan contains NO Exchange (asserted in tests): the per-query shuffle is
    gone."""

    idx = spark.table(table)
    a, b = idx.alias("a"), idx.alias("b")
    corner_ix = cell_ix_expr(F.greatest("a.west", "b.west"), level)
    corner_iy = cell_iy_expr(F.greatest("a.south", "b.south"), level)
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & _overlap("a", "b")
            & (F.col("a.cell") == cell_id_expr(level, corner_ix, corner_iy)),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
    )


def bbox_overlap_pairs_from_index(spark: SparkSession, table: str, level: int = DEFAULT_LEVEL) -> DataFrame:
    """Self-join the bucketed index on ``cell``: same semantics as
    ``bbox_overlap_pairs`` (reference-point dedup, two-tier), but the
    small x small join consumes bucket metadata — ``.explain`` shows no
    Exchange under either join input (asserted in tests).  The shuffle was
    paid once, at :func:`write_cell_index` time."""

    small_pairs = index_self_join(spark, table, level)

    idx = spark.table(table)
    large = spark.table(f"{table}_large")
    # distinct extents from the index (one row per (doc, part)) for the
    # large-tier counterpart stream
    other_small = (
        idx.select("doc_id", "west", "south", "east", "north")
        .dropDuplicates(["doc_id"])  # small-tier docs carry one extent each
        .withColumn("is_large", F.lit(False))
        .withColumn("split", F.lit(False))
    )
    other = other_small.unionByName(
        large.withColumn("is_large", F.lit(True)).select(
            "doc_id", "west", "south", "east", "north", "is_large", "split"
        )
    )
    l_ns = large.filter(~F.col("split"))
    l_s = large.filter(F.col("split"))

    def ljoin(o_side: DataFrame, l_side: DataFrame) -> DataFrame:
        o, l = o_side.alias("o"), l_side.alias("l")
        return (
            o.join(
                F.broadcast(l),
                _overlap("l", "o")
                & (F.col("o.doc_id") != F.col("l.doc_id"))
                & (~F.col("o.is_large") | (F.col("o.doc_id") > F.col("l.doc_id"))),
            )
            .select(
                F.least("l.doc_id", "o.doc_id").alias("a_id"),
                F.greatest("l.doc_id", "o.doc_id").alias("b_id"),
            )
        )

    large_pairs = ljoin(other.filter(~F.col("split")), l_ns)
    split_pairs = (
        ljoin(other.filter(F.col("split")), l_ns)
        .unionByName(ljoin(other, l_s))
        .dropDuplicates(["a_id", "b_id"])
    )
    return small_pairs.unionByName(large_pairs).unionByName(split_pairs)


def point_in_bbox_from_index(
    spark: SparkSession,
    points: DataFrame,
    table: str,
    level: int = DEFAULT_LEVEL,
    buckets: int = 16,
) -> DataFrame:
    """Points vs the bucketed index: the index side reads WITHOUT an
    Exchange (bucket metadata); only the (small) point stream shuffles to
    the index's bucketing.  Same semantics as ``point_in_bbox``."""

    from gmx.geometry.cellgrid import point_cell_expr

    idx = spark.table(table)
    pts = points.withColumn("cell", point_cell_expr(F.col("lon"), F.col("lat"), level))
    contains = (
        (F.col("west") <= F.col("lon")) & (F.col("lon") <= F.col("east"))
        & (F.col("south") <= F.col("lat")) & (F.col("lat") <= F.col("north"))
    )
    small_hits = pts.join(idx, on="cell").filter(contains).select("point_id", "doc_id")
    large = spark.table(f"{table}_large")
    large_hits = (
        points.join(
            F.broadcast(large),
            (F.col("west") <= F.col("lon")) & (F.col("lon") <= F.col("east"))
            & (F.col("south") <= F.col("lat")) & (F.col("lat") <= F.col("north")),
        ).select("point_id", "doc_id")
    )
    return small_hits.unionByName(large_hits)
