"""Spatial joins over the cell-grid index: filter-and-refine, skew-aware.

All operators follow the same scale pattern (SURVEY.md §2.7):

1. **Filter**: explode each extent's cell covering -> equi-join on cell id
   (a shuffle Catalyst plans natively; AQE skew-join enabled in gmx.session).
2. **Refine**: exact interval predicates on the original coordinates.
3. **Dedup-free pair emission**: a pair is emitted only from the cell that
   contains the intersection's (max-west, max-south) corner — the classic
   reference-point technique, which removes the need for a global
   ``dropDuplicates`` shuffle over the (potentially enormous) pair stream.

Skew handling ("hot cells from whole-world boxes", the north rule's named
hazard; the corpus plants one whole-world bbox per 97 docs):

- **Cell-splitting / tiering**: extents whose covering would exceed
  ``large_cap`` cells (whole-world and near-global boxes) are pulled OUT of
  the exploded index entirely and joined via a broadcast nested-loop pass —
  so hot cells never materialize in the shuffle.  At 100 TB the large tier is
  a tiny fraction (must fit broadcast; the cap is configurable and the tier
  is counted so a runaway fraction is observable in metrics).
- **Salting**: ``salt`` replicates index rows S ways and routes probes by
  ``pmod(hash(key), S)`` for residual per-cell hotspots.
- **AQE**: runtime skew-join splitting for anything left.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from gmx.geometry.cellgrid import (
    DEFAULT_LEVEL,
    cell_id_expr,
    cell_ix_expr,
    cell_iy_expr,
    cells_for_ranges,
    covering_expr,
    covering_size_expr,
    nx,
    point_cell_expr,
)

DEFAULT_LARGE_CAP = 64  # coverings above this many cells go to the broadcast tier

# Count-budgeted overflow (the 10^12-doc mechanism, PLANS.md §11): when the
# broadcast tier exceeds ``large_budget`` rows it cannot be a broadcast —
# ~400 GB at a 10^12-doc whole-world fraction of 1/97.  Over budget, the
# non-split large extents are routed through a COARSE-cell equi-join
# instead: both sides explode their covering at OVERFLOW_LEVEL (whole-world
# = 16 cells at level 2), the index side is salted OVERFLOW_SALT ways for
# parallelism beyond the handful of coarse keys, and the same exact refine +
# reference-point dedup applies.  Budget=None (default) skips the tier-count
# job entirely and keeps the plain broadcast — callers at corpus scale set a
# budget (and should cache the extents input, since deciding costs one count
# over it).
OVERFLOW_LEVEL = 2
OVERFLOW_SALT = 8


def _with_tier(extents: DataFrame, level: int, large_cap: int) -> DataFrame:
    size = covering_size_expr(F.col("west"), F.col("south"), F.col("east"), F.col("north"), level)
    e = extents
    if "split" not in e.columns:  # extents not built by extents_df carry no parts
        e = e.withColumn("split", F.lit(False))
    # antimeridian-crossing boxes (split parts) always ride the broadcast
    # tier: they are as rare as whole-world boxes, and keeping them out of
    # the exploded index means the reference-point dedup never sees a doc
    # twice — cross-tier duplicate pairs become impossible
    return e.withColumn("n_cells", size).withColumn(
        "is_large", (F.col("n_cells") > large_cap) | F.col("split")
    )


def tier_stats(
    extents: DataFrame, level: int = DEFAULT_LEVEL, large_cap: int = DEFAULT_LARGE_CAP
) -> DataFrame:
    """Observability for the two-tier join strategy: per (is_large, split)
    tier — row count, total and max covering-cell count.  These are the
    numbers that tell you whether the broadcast tier still fits a broadcast
    at your corpus scale (a runaway whole-world fraction shows up here
    before it shows up as an OOM)."""

    ext = _with_tier(extents, level, large_cap)
    return ext.groupBy("is_large", "split").agg(
        F.count("*").alias("n_extents"),
        F.sum("n_cells").alias("total_cells"),
        F.max("n_cells").alias("max_cells"),
    )


def _coarse_explode(df: DataFrame, level: int, extra: list[str] | None = None) -> DataFrame:
    """Explode a bbox frame over its coarse-cell covering (overflow tier)."""

    return df.select(
        *(extra or df.columns),
        F.explode(
            covering_expr(F.col("west"), F.col("south"), F.col("east"), F.col("north"), level)
        ).alias("ccell"),
    )


def _salt_replicate(df: DataFrame, salt: int) -> DataFrame:
    """Replicate index rows ``salt`` ways (fragment side of a
    fragment-replicate join — probes route by hash, replicas by explode)."""

    return df.withColumn("osalt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))


def _overflow_pairs(
    l_ns: DataFrame, others: DataFrame, overflow_level: int, salt: int
) -> DataFrame:
    """Coarse-cell equi-join replacing the broadcast for an over-budget
    large tier: overflow extents (replicated ``salt`` ways) join counterpart
    extents routed by doc-id hash; exact overlap refine + reference-point
    dedup at the coarse level; overflow x overflow pairs emit from the
    lexicographically-smaller side only.  ``others`` must carry
    ``is_overflow`` marking rows that are ALSO in the overflow tier."""

    cols = ["doc_id", "west", "south", "east", "north"]
    lidx = _salt_replicate(_coarse_explode(l_ns.select(*cols), overflow_level, cols), salt)
    ridx = _coarse_explode(
        others.select(*cols, "is_overflow"), overflow_level, cols + ["is_overflow"]
    ).withColumn("osalt", F.pmod(F.hash("doc_id"), F.lit(salt)))

    l, o = lidx.alias("l"), ridx.alias("o")
    corner_ix = cell_ix_expr(F.greatest("l.west", "o.west"), overflow_level)
    corner_iy = cell_iy_expr(F.greatest("l.south", "o.south"), overflow_level)
    return (
        l.join(
            o,
            (F.col("l.ccell") == F.col("o.ccell"))
            & (F.col("l.osalt") == F.col("o.osalt"))
            & (F.col("l.doc_id") != F.col("o.doc_id"))
            & _overlap("l", "o")
            & (F.col("l.ccell") == cell_id_expr(overflow_level, corner_ix, corner_iy))
            & (~F.col("o.is_overflow") | (F.col("l.doc_id") < F.col("o.doc_id"))),
        )
        .select(
            F.least("l.doc_id", "o.doc_id").alias("a_id"),
            F.greatest("l.doc_id", "o.doc_id").alias("b_id"),
        )
    )


def _ljoin_large(o_side: DataFrame, l_side: DataFrame) -> DataFrame:
    """Broadcast join of the large tier against a counterpart stream with
    the pair-dedup rules: large x large emits in one doc-id order only,
    EXCEPT counterparts living in the overflow tier (``is_overflow``), whose
    pairs with broadcast rows must emit regardless of order (the coarse
    overflow join's right side excludes split rows).  Shared by the on-the-
    fly joins and the bucketed-index variants so the dedup predicate cannot
    drift between them."""

    o, l = o_side.alias("o"), l_side.alias("l")
    return (
        o.join(
            F.broadcast(l),
            _overlap("l", "o")
            & (F.col("o.doc_id") != F.col("l.doc_id"))
            & (
                ~F.col("o.is_large")
                | F.col("o.is_overflow")
                | (F.col("o.doc_id") > F.col("l.doc_id"))
            ),
        )
        .select(
            F.least("l.doc_id", "o.doc_id").alias("a_id"),
            F.greatest("l.doc_id", "o.doc_id").alias("b_id"),
        )
    )


def _large_tier_pairs(other: DataFrame, l_ns: DataFrame, l_s: DataFrame) -> DataFrame:
    """Standard (non-overflow) large-tier pair assembly: non-split large
    rows join the non-split counterpart stream once (no dedup shuffle);
    split-involved combinations route through separate near-empty joins and
    dedup there."""

    large_pairs = _ljoin_large(other.filter(~F.col("split")), l_ns)
    split_pairs = (
        _ljoin_large(other.filter(F.col("split")), l_ns)
        .unionByName(_ljoin_large(other, l_s))
        .dropDuplicates(["a_id", "b_id"])
    )
    return large_pairs.unionByName(split_pairs)


def recommend_salt(
    extents: DataFrame,
    level: int = DEFAULT_LEVEL,
    large_cap: int = DEFAULT_LARGE_CAP,
    rows_per_shard: int = 50_000,
    max_salt: int = 32,
) -> int:
    """Derive the small-tier join salt from the OBSERVED hot-cell occupancy
    instead of a hand-picked constant: the salt exists to split one hot
    cell's join work across tasks, so the right value is
    ceil(max cell occupancy / rows_per_shard), clamped to [1, max_salt].

    The signal is the same (cell, count) histogram ``spatial_cell_histogram``
    exposes for observability — one map-side-combined aggregate over the
    exploded small-tier covering (the large/whole-world tier is already
    pulled out by ``large_cap`` and never lands in the salted join).
    ``rows_per_shard`` is the index-rows-per-(cell,salt)-shard target a
    task should handle comfortably; at corpus scale compute this once per
    index build, not per query (it is one eager Spark job — cache
    ``extents``, like the ``large_budget`` probe)."""

    import math

    ext = _with_tier(extents, level, large_cap)
    mx = (
        cover_cells(ext.filter(~F.col("is_large")), level)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()["mx"]
    ) or 0
    return max(1, min(max_salt, math.ceil(mx / rows_per_shard)))


def cover_cells(extents: DataFrame, level: int = DEFAULT_LEVEL) -> DataFrame:
    """Exploded (cell, doc) covering index — the tile-assignment operator.
    ``part``/``split`` columns (antimeridian parts from extents_df) pass
    through when present; the two parts of a crossing box cover disjoint
    longitude ranges, so a (doc, cell) row never duplicates."""

    extra = [c for c in ("part", "split") if c in extents.columns]
    return extents.select(
        "doc_id", "west", "south", "east", "north", *extra,
        F.explode(
            covering_expr(F.col("west"), F.col("south"), F.col("east"), F.col("north"), level)
        ).alias("cell"),
    )


def _overlap(a: str, b: str) -> Column:
    return (
        (F.col(f"{a}.west") <= F.col(f"{b}.east"))
        & (F.col(f"{b}.west") <= F.col(f"{a}.east"))
        & (F.col(f"{a}.south") <= F.col(f"{b}.north"))
        & (F.col(f"{b}.south") <= F.col(f"{a}.north"))
    )


def bbox_overlap_pairs(
    extents: DataFrame,
    level: int = DEFAULT_LEVEL,
    large_cap: int = DEFAULT_LARGE_CAP,
    large_budget: int | None = None,
    overflow_level: int = OVERFLOW_LEVEL,
    overflow_salt: int = OVERFLOW_SALT,
) -> DataFrame:
    """All distinct overlapping pairs (a_id < b_id) among extents.

    small x small: cell equi-join + reference-point dedup (no distinct).
    large x anything: broadcast nested-loop over the (tiny) large tier.

    ``large_budget``: when set and the non-split large tier exceeds that many
    rows, the tier is NOT broadcast — it routes through the salted
    coarse-cell equi-join (:func:`_overflow_pairs`) so the broadcast size
    stays bounded by the (rare) antimeridian-split rows alone.  Deciding
    costs one ``limit(budget+1).count()`` job over the tier, so callers
    should cache ``extents``; ``None`` (default) skips the probe.
    """

    ext = _with_tier(extents, level, large_cap)
    small = ext.filter(~F.col("is_large"))
    large = ext.filter(F.col("is_large")).select(
        "doc_id", "west", "south", "east", "north", "split"
    )

    idx = cover_cells(small, level)
    a, b = idx.alias("a"), idx.alias("b")
    corner_ix = cell_ix_expr(F.greatest("a.west", "b.west"), level)
    corner_iy = cell_iy_expr(F.greatest("a.south", "b.south"), level)
    small_pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & _overlap("a", "b")
            & (F.col("a.cell") == cell_id_expr(level, corner_ix, corner_iy)),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
    )

    # broadcast the (tiny) LARGE tier; the full extent stream stays distributed.
    # Split-involved combinations are routed through SEPARATE (near-empty)
    # joins and deduped there: a counterpart overlapping BOTH parts of a
    # crossing box would otherwise emit the pair once per part combo.  The
    # inputs are split BEFORE joining so the heavy non-split stream is joined
    # exactly once with no dedup shuffle (filtering the join OUTPUT twice
    # would re-execute the broadcast join per branch).
    l_ns = large.filter(~F.col("split"))
    l_s = large.filter(F.col("split"))
    overflow = (
        large_budget is not None
        and l_ns.limit(large_budget + 1).count() > large_budget
    )
    other = ext.select(
        "doc_id", "west", "south", "east", "north", "is_large", "split"
    ).withColumn(
        # rows that live in the overflow tier (emitted there, so the split
        # broadcast must emit their pairs with split rows regardless of
        # doc-id order — the coarse join's right side excludes split rows)
        "is_overflow",
        F.lit(overflow) & F.col("is_large") & ~F.col("split"),
    )

    if overflow:
        # non-split large tier: salted coarse-cell join vs small + itself
        large_pairs = _overflow_pairs(
            l_ns, other.filter(~F.col("split")), overflow_level, overflow_salt
        )
        # split tier (still broadcast — bounded): pairs with EVERYTHING,
        # including overflow rows in either doc-id order
        split_pairs = _ljoin_large(other, l_s).dropDuplicates(["a_id", "b_id"])
        return small_pairs.unionByName(large_pairs).unionByName(split_pairs)

    return small_pairs.unionByName(_large_tier_pairs(other, l_ns, l_s))


def point_in_bbox(
    points: DataFrame,
    extents: DataFrame,
    level: int = DEFAULT_LEVEL,
    large_cap: int = DEFAULT_LARGE_CAP,
    salt: int | str | None = None,
    large_budget: int | None = None,
    overflow_level: int = OVERFLOW_LEVEL,
    overflow_salt: int = OVERFLOW_SALT,
    salt_rows_per_shard: int = 50_000,
) -> DataFrame:
    """(point_id, doc_id) pairs where the point lies inside the doc extent
    (closed intervals).  Two-tier like the overlap join; optional salting
    replicates the small-tier index ``salt`` ways for residual hot cells.
    ``salt="auto"`` derives the factor from the measured hot-cell occupancy
    (:func:`recommend_salt` — one eager aggregate over ``extents``; cache
    the input, same caveat as ``large_budget``) instead of a hand-picked
    constant.

    ``large_budget``: over budget, the ENTIRE large tier (split parts are
    plain rectangles for containment — no pair-dedup hazard) probes through
    the salted coarse-cell equi-join instead of a broadcast: each point maps
    to exactly one coarse cell, so no dedup is needed."""

    if salt == "auto":
        s = recommend_salt(extents, level, large_cap, salt_rows_per_shard)
        salt = s if s > 1 else None

    ext = _with_tier(extents, level, large_cap)
    small = ext.filter(~F.col("is_large"))
    large = ext.filter(F.col("is_large")).select("doc_id", "west", "south", "east", "north")

    idx = cover_cells(small, level)
    pts = points.withColumn("cell", point_cell_expr(F.col("lon"), F.col("lat"), level))

    if salt:
        idx = idx.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        pts = pts.withColumn("salt", F.pmod(F.hash("point_id"), F.lit(salt)))
        keys = ["cell", "salt"]
    else:
        keys = ["cell"]

    contains = (
        (F.col("west") <= F.col("lon")) & (F.col("lon") <= F.col("east"))
        & (F.col("south") <= F.col("lat")) & (F.col("lat") <= F.col("north"))
    )
    small_hits = (
        pts.join(idx, on=keys).filter(contains).select("point_id", "doc_id")
    )
    if (
        large_budget is not None
        and large.limit(large_budget + 1).count() > large_budget
    ):
        large_hits = _pip_overflow_hits(points, large, overflow_level, overflow_salt)
    else:
        large_hits = (
            points.join(
                F.broadcast(large),
                (F.col("west") <= F.col("lon")) & (F.col("lon") <= F.col("east"))
                & (F.col("south") <= F.col("lat")) & (F.col("lat") <= F.col("north")),
            ).select("point_id", "doc_id")
        )
    return small_hits.unionByName(large_hits)


def _pip_overflow_hits(
    points: DataFrame, large: DataFrame, overflow_level: int, overflow_salt: int
) -> DataFrame:
    """Over-budget large-tier containment: points route to their single
    coarse cell (no dedup needed), the large extents explode + salt-replicate
    — shared by the on-the-fly and bucketed-index PIP joins."""

    contains = (
        (F.col("west") <= F.col("lon")) & (F.col("lon") <= F.col("east"))
        & (F.col("south") <= F.col("lat")) & (F.col("lat") <= F.col("north"))
    )
    cols = ["doc_id", "west", "south", "east", "north"]
    lidx = _salt_replicate(
        _coarse_explode(large.select(*cols), overflow_level, cols), overflow_salt
    )
    pts_c = points.withColumn(
        "ccell", point_cell_expr(F.col("lon"), F.col("lat"), overflow_level)
    ).withColumn("osalt", F.pmod(F.hash("point_id"), F.lit(overflow_salt)))
    return (
        pts_c.join(lidx, on=["ccell", "osalt"])
        .filter(contains)
        .select("point_id", "doc_id")
    )


def knn_points(
    points: DataFrame,
    extents: DataFrame,
    k: int = 5,
    level: int = 6,
    ring: int = 1,
) -> DataFrame:
    """k nearest doc-extent centroids per query point.

    Distance = squared equirectangular degrees (exact on the corpus lattice),
    tie-broken by doc_id.  Plan: each centroid indexes into ONE cell; each
    point probes its (2*ring+1)^2 cell neighborhood (a bounded fan-out
    equi-join, not a cross join); a window takes the top k.  Candidates are
    provably complete when the k-th distance is within the point's exact
    distance to the nearest probed-window edge (any unseen centroid lies
    beyond that edge; window edges at the world boundary have nothing
    beyond them and count as infinite).  Points that fail the bound
    (possible only in near-empty regions) fall back to an exact broadcast
    pass — so results are exact at every density.
    Returns (point_id, rank, doc_id, dist_sq).
    """

    # one centroid per doc: an antimeridian-crossing box is represented by
    # its eastern-hemisphere part (part 0, [west,180]) — deterministic and
    # single-rowed, so a doc can never appear twice in one point's top-k
    base_ext = extents.filter(F.col("part") == 0) if "part" in extents.columns else extents
    cents = base_ext.select(
        "doc_id",
        ((F.col("west") + F.col("east")) / 2).alias("cx"),
        ((F.col("south") + F.col("north")) / 2).alias("cy"),
    )
    cent_idx = cents.withColumn("cell", point_cell_expr(F.col("cx"), F.col("cy"), level))
    return _knn_probe(points, cents, cent_idx, k, level, ring)


# Every _knn_probe invocation's internal candidate/straggler caches, in
# spawn order.  The returned DataFrame reads them lazily, so they cannot be
# freed at return time; instead each _knn_probe call releases every PRIOR
# generation at entry (so a long-lived driver looping kNN through the
# public API holds at most one generation — unbounded growth was an r5
# review finding), and release_knn_caches() frees the last one.  kNN calls
# are assumed sequential per process; unpersisting a still-un-materialized
# prior result is correctness-safe (its plan recomputes from lineage).
_KNN_CACHES: list[DataFrame] = []


def release_knn_caches() -> None:
    """Unpersist every cache any prior kNN call left behind.  Safe to call
    while a result is still un-materialized — the plan recomputes instead
    of reading cache (correct, just slower)."""

    while _KNN_CACHES:
        _KNN_CACHES.pop().unpersist()


def _knn_probe(
    points: DataFrame,
    cents: DataFrame,
    cent_idx: DataFrame,
    k: int,
    level: int,
    ring: int,
) -> DataFrame:
    """The escalating-ring kNN core over a prebuilt centroid index.

    ``cent_idx`` is (doc_id, cx, cy, cell) — computed on the fly by
    :func:`knn_points` or read from a bucketed table by
    ``gmx.geometry.bucketed.knn_from_index`` (where the index side of the
    probe join plans without an Exchange); ``cents`` is the same rows
    without the cell column, feeding the exact broadcast fallback."""

    # cap the registry at one live generation: prior calls' caches are
    # already materialized (this function's emptiness probes run jobs at
    # call time), and any not-yet-collected prior RESULT recomputes from
    # lineage — correct, just slower
    release_knn_caches()

    n = nx(level)
    dist = (F.col("lon") - F.col("cx")) ** 2 + (F.col("lat") - F.col("cy")) ** 2
    w = Window.partitionBy("point_id").orderBy(F.col("dist_sq").asc(), F.col("doc_id").asc())
    out_cols = ("point_id", "rank", "doc_id", "dist_sq")

    def ranked_for(pts: DataFrame, r: int) -> DataFrame:
        px = cell_ix_expr(F.col("lon"), level)
        py = cell_iy_expr(F.col("lat"), level)
        x0, x1 = F.greatest(F.lit(0), px - r), F.least(F.lit(n - 1), px + r)
        y0, y1 = F.greatest(F.lit(0), py - r), F.least(F.lit(n - 1), py + r)
        neighbor_cells = cells_for_ranges(x0, x1, y0, y1, level)
        # exact completeness bound: distance to the nearest probed-window
        # edge (an unseen centroid must lie beyond one); edges clamped at
        # the world boundary have nothing beyond them -> effectively inf
        cw, ch = 360.0 / n, 180.0 / n
        big = F.lit(1e18)
        safe = F.least(
            F.when(x0 == 0, big).otherwise(F.col("lon") - (x0 * cw - 180.0)),
            F.when(x1 == n - 1, big).otherwise((x1 + 1) * cw - 180.0 - F.col("lon")),
            F.when(y0 == 0, big).otherwise(F.col("lat") - (y0 * ch - 90.0)),
            F.when(y1 == n - 1, big).otherwise((y1 + 1) * ch - 90.0 - F.col("lat")),
        )
        probes = pts.select(
            "point_id", "lon", "lat",
            (safe * safe).alias("bound_sq"),
            F.explode(neighbor_cells).alias("cell"),
        )
        # bound pre-filter (sound, big window-shuffle cut): a candidate with
        # dist_sq > bound_sq can never belong to a PROVABLY-complete top-k —
        # if the true k-th distance is < bound, all k true neighbors pass the
        # filter (so the filtered top-k is the true top-k and the strict
        # kth < bound check is unchanged); if it is >= bound, the point fails
        # the completeness check with or without the filter and escalates.
        # Dropping them map-side (after the probe join, before the window)
        # shrinks the rank shuffle ~10x at ring 1 (measured: ~450 raw
        # candidates per point for k=5; only the within-bound handful rank).
        return (
            probes.join(cent_idx, on="cell")
            .select("point_id", "lon", "lat", "bound_sq", "doc_id", dist.alias("dist_sq"))
            .filter(F.col("dist_sq") <= F.col("bound_sq"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    # Escalating rounds: most points complete at the tight ring; stragglers
    # (sparse neighborhoods, lat-clamp edges) re-probe with a 4x ring before
    # the exact broadcast fallback — the fallback population shrinks
    # geometrically, so the cross join only ever sees a residue.  Escalation
    # is adaptive: a per-round emptiness probe on the (tiny, persisted)
    # straggler set prunes dead rounds and the fallback from the plan, so
    # this operator launches jobs at call time like other iterative Spark
    # algorithms.
    results: list[DataFrame] = []
    stragglers: list[DataFrame] = []  # unpersisted on exit (can be large)
    cands: list[DataFrame] = []  # stay cached; exposed via _gmx_cached below
    remaining = points
    for r in (ring, ring * 4):
        # persisted: feeds the result slice, the completeness stats, and the
        # next round's anti-join; cands stay cached (<= k rows per point,
        # referenced lazily by the returned DataFrame)
        cand = ranked_for(remaining, r).persist()
        cands.append(cand)
        complete_ids = (
            cand.groupBy("point_id")
            .agg(
                F.count("*").alias("cnt"),
                F.max("dist_sq").alias("kth_sq"),
                F.first("bound_sq").alias("bound_sq"),
            )
            # strict <: with kth_sq == bound_sq an unseen centroid could sit
            # exactly ON the window edge with a smaller doc_id and win the
            # (dist_sq, doc_id) tie-break — ties fall through to the next
            # ring / exact fallback instead
            .filter((F.col("cnt") >= k) & (F.col("kth_sq") < F.col("bound_sq")))
            .select("point_id")
        )
        results.append(cand.join(complete_ids, "point_id", "leftsemi").select(*out_cols))
        remaining = remaining.join(complete_ids, "point_id", "left_anti").persist()
        stragglers.append(remaining)
        if remaining.isEmpty():
            remaining = None
            break

    if remaining is not None:
        results.append(
            remaining.crossJoin(cents)
            .select("point_id", "lon", "lat", "doc_id", dist.alias("dist_sq"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(*out_cols)
        )

    # straggler sets can be a large fraction of the points; every round's
    # cand is already materialized, so only the final set (feeding the
    # fallback lazily) must stay cached
    for s in stragglers:
        if s is not remaining:
            s.unpersist()

    out = results[0]
    for part in results[1:]:
        out = out.unionByName(part)
    # the per-round candidate caches (and the fallback's straggler set) stay
    # persisted because the returned plan reads them lazily; callers that
    # re-run kNN repeatedly (bench reps, batch drivers) can release them
    # after materializing via this attribute — without it the caches also
    # make a REPEATED identical call partially cache-served (Spark's cache
    # manager substitutes matching plan subtrees), which misstates repeat
    # timings as operator speed.  The attribute is fragile (any
    # transformation drops it), so the caches are ALSO registered in the
    # module-level _KNN_CACHES list; release_knn_caches() frees every
    # generation regardless of what the caller did to the DataFrame.
    live = list(cands) + ([remaining] if remaining is not None else [])
    out._gmx_cached = live
    _KNN_CACHES.extend(live)
    return out


def tile_boxes(tiles: DataFrame) -> DataFrame:
    """(tile_id, z, x, y) -> (tile_id, west, south, east, north): the
    closed-form footprint of an equirectangular raster tile.  Shared by the
    on-the-fly tile join and the bucketed-index variant so the tile
    geometry cannot drift between them."""

    tz = F.pow(F.lit(2.0), F.col("z"))
    return tiles.select(
        "tile_id",
        (F.lit(-180.0) + F.col("x") * (F.lit(360.0) / tz)).alias("west"),
        (F.lit(-90.0) + F.col("y") * (F.lit(180.0) / tz)).alias("south"),
        (F.lit(-180.0) + (F.col("x") + 1) * (F.lit(360.0) / tz)).alias("east"),
        (F.lit(-90.0) + (F.col("y") + 1) * (F.lit(180.0) / tz)).alias("north"),
    )


def tile_cell_hits(tbox: DataFrame, idx: DataFrame, level: int) -> DataFrame:
    """Small-tier tile↔extent pairs over an exploded (cell, doc) covering
    index: cell equi-join + exact overlap refine + reference-point dedup.
    Shared by :func:`tile_extent_join` and the bucketed-index variant."""

    t = (
        tbox.withColumn(
            "cells",
            covering_expr(F.col("west"), F.col("south"), F.col("east"), F.col("north"), level),
        )
        .select("tile_id", "west", "south", "east", "north", F.explode("cells").alias("cell"))
        .alias("t")
    )
    d = idx.alias("d")
    corner_ix = cell_ix_expr(F.greatest("t.west", "d.west"), level)
    corner_iy = cell_iy_expr(F.greatest("t.south", "d.south"), level)
    return (
        t.join(
            d,
            (F.col("t.cell") == F.col("d.cell"))
            & _overlap("t", "d")
            & (F.col("t.cell") == cell_id_expr(level, corner_ix, corner_iy)),
        )
        .select("tile_id", "doc_id")
    )


def tile_extent_join(
    tiles: DataFrame,
    extents: DataFrame,
    level: int = DEFAULT_LEVEL,
    large_cap: int = DEFAULT_LARGE_CAP,
    large_budget: int | None = None,
    overflow_level: int = OVERFLOW_LEVEL,
    overflow_salt: int = OVERFLOW_SALT,
) -> DataFrame:
    """(tile_id, doc_id) pairs where a raster tile's footprint overlaps a doc
    extent.  ``tiles`` needs (tile_id, z, x, y) on the equirectangular grid;
    the tile bbox is closed-form, then the same tiered filter-and-refine.

    ``large_budget``: over budget, the non-split large tier joins tiles
    through the salted coarse-cell equi-join with reference-point dedup
    (split parts stay broadcast — bounded by crossing-box rarity)."""

    tbox = tile_boxes(tiles)

    ext = _with_tier(extents, level, large_cap)
    small = ext.filter(~F.col("is_large"))
    large = ext.filter(F.col("is_large")).select(
        "doc_id", "west", "south", "east", "north", "split"
    )

    small_hits = tile_cell_hits(tbox, cover_cells(small, level), level)
    # a tile can overlap both parts of an antimeridian-crossing box; the
    # split slice joins separately (near-empty input) and dedups there, so
    # the non-split broadcast join runs once with no dedup shuffle
    l_ns = large.filter(~F.col("split"))
    if (
        large_budget is not None
        and l_ns.limit(large_budget + 1).count() > large_budget
    ):
        dcols = ["doc_id", "west", "south", "east", "north"]
        didx = _salt_replicate(
            _coarse_explode(l_ns.select(*dcols), overflow_level, dcols), overflow_salt
        ).alias("d")
        tcols = ["tile_id", "west", "south", "east", "north"]
        tidx = (
            _coarse_explode(tbox.select(*tcols), overflow_level, tcols)
            .withColumn("osalt", F.pmod(F.hash("tile_id"), F.lit(overflow_salt)))
            .alias("t")
        )
        c_ix = cell_ix_expr(F.greatest("t.west", "d.west"), overflow_level)
        c_iy = cell_iy_expr(F.greatest("t.south", "d.south"), overflow_level)
        large_hits = (
            tidx.join(
                didx,
                (F.col("t.ccell") == F.col("d.ccell"))
                & (F.col("t.osalt") == F.col("d.osalt"))
                & _overlap("t", "d")
                & (F.col("t.ccell") == cell_id_expr(overflow_level, c_ix, c_iy)),
            )
            .select("tile_id", "doc_id")
        )
    else:
        large_hits = (
            tbox.alias("t")
            .join(F.broadcast(l_ns.alias("d")), _overlap("t", "d"))
            .select("tile_id", "doc_id")
        )
    split_hits = (
        tbox.alias("t")
        .join(F.broadcast(large.filter(F.col("split")).alias("d")), _overlap("t", "d"))
        .select("tile_id", "doc_id")
        .dropDuplicates(["tile_id", "doc_id"])
    )
    return small_hits.unionByName(large_hits).unionByName(split_hits)
