"""Spatial-join correctness vs single-node brute-force oracles (SURVEY.md §5
our-strategy (f): join row counts + tile assignments vs a single-node oracle)."""

from __future__ import annotations

import itertools

import pytest

from gmx.corpus import bbox_halfdeg
from gmx.geometry import (
    bbox_overlap_pairs,
    cover_cells,
    extents_df,
    knn_points,
    point_in_bbox,
    tile_extent_join,
)


@pytest.fixture(scope="module")
def boxes(doc_ids):
    return {f"doc-{i:08d}": tuple(v / 2 for v in bbox_halfdeg(i)) for i in doc_ids}


@pytest.fixture(scope="module")
def extents(metadata):
    e = extents_df(metadata)
    e.cache().count()
    return e


@pytest.fixture(scope="module")
def points(spark):
    pts = [(k, (-360 + (k * 91) % 720) / 2.0, (-180 + (k * 73) % 360) / 2.0) for k in range(150)]
    df = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    df.cache().count()
    return pts, df


def test_overlap_pairs_exact(extents, boxes):
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(boxes), 2)
        if boxes[a][0] <= boxes[b][2] and boxes[b][0] <= boxes[a][2]
        and boxes[a][1] <= boxes[b][3] and boxes[b][1] <= boxes[a][3]
    }
    got = {(r.a_id, r.b_id) for r in bbox_overlap_pairs(extents).collect()}
    assert got == want


def test_point_in_bbox_exact(extents, boxes, points):
    pts, df = points
    want = {
        (k, d)
        for (k, x, y) in pts
        for d, (w, s, e, n) in boxes.items()
        if w <= x <= e and s <= y <= n
    }
    assert {(r.point_id, r.doc_id) for r in point_in_bbox(df, extents).collect()} == want
    assert {(r.point_id, r.doc_id) for r in point_in_bbox(df, extents, salt=4).collect()} == want


def knn_oracle(pts, boxes, k=5):
    cents = {d: ((w + e) / 2, (s + n) / 2) for d, (w, s, e, n) in boxes.items()}
    want = set()
    for pid, x, y in pts:
        order = sorted(((x - cx) ** 2 + (y - cy) ** 2, d) for d, (cx, cy) in cents.items())
        want.update((pid, r + 1, d) for r, (_, d) in enumerate(order[:k]))
    return want


def test_knn_exact(extents, boxes, points):
    pts, df = points
    want = knn_oracle(pts, boxes)
    got = {(r.point_id, r.rank, r.doc_id) for r in knn_points(df, extents).collect()}
    assert got == want


def test_knn_exact_with_forced_fallback(extents, boxes, points):
    """Fine cells + small ring force the completeness-bound fallback path."""

    pts, df = points
    want = knn_oracle(pts, boxes)
    got = {(r.point_id, r.rank, r.doc_id)
           for r in knn_points(df, extents, level=8, ring=1).collect()}
    assert got == want


def test_tile_join_exact(spark, extents, boxes):
    tiles = [(f"t4-{x}-{y}", 4, x, y) for x in range(16) for y in range(16)]
    tdf = spark.createDataFrame(tiles, "tile_id string, z int, x int, y int")
    want = set()
    for t, z, x, y in tiles:
        tw, ts = -180 + x * 360 / 2**z, -90 + y * 180 / 2**z
        te, tn = tw + 360 / 2**z, ts + 180 / 2**z
        for d, (w, s, e, n) in boxes.items():
            if tw <= e and w <= te and ts <= n and s <= tn:
                want.add((t, d))
    got = {(r.tile_id, r.doc_id) for r in tile_extent_join(tdf, extents).collect()}
    assert got == want


def test_antimeridian_crossing_boxes(spark):
    """A west>east box splits into flagged parts; pair-emitting joins must
    yield each (a, b) exactly once even when a counterpart overlaps BOTH
    parts (the duplicate hazard the split introduces)."""

    boxes = {
        "band": (-180.0, -20.0, 180.0, 20.0),   # overlaps both parts of cross
        "cross": (170.0, -10.0, -170.0, 10.0),  # antimeridian-crossing
        "east": (175.0, -5.0, 179.0, 5.0),      # overlaps part 0 only
        "far": (0.0, 40.0, 10.0, 50.0),         # no overlap with cross
        "west2": (-179.0, -5.0, -175.0, 5.0),   # overlaps part 1 only
    }
    meta = spark.createDataFrame(
        [(d, "iso", tuple(str(v) for v in b)) for d, b in boxes.items()],
        "doc_id string, standard string, "
        "bounding_box struct<west:string,south:string,east:string,north:string>",
    )
    ext = extents_df(meta)

    parts = sorted(
        (r.part, r.west, r.east) for r in ext.filter("doc_id = 'cross'").collect()
    )
    assert parts == [(0, 170.0, 180.0), (1, -180.0, -170.0)]
    assert all(r.split for r in ext.filter("doc_id = 'cross'").collect())

    def lon_parts(w, e):
        return [(w, e)] if w <= e else [(w, 180.0), (-180.0, e)]

    def olap(a, b):
        lon = any(
            pw <= qe and qw <= pe
            for pw, pe in lon_parts(a[0], a[2])
            for qw, qe in lon_parts(b[0], b[2])
        )
        return lon and a[1] <= b[3] and b[1] <= a[3]

    want = {
        (x, y)
        for x, y in itertools.combinations(sorted(boxes), 2)
        if olap(boxes[x], boxes[y])
    }
    got = [(r.a_id, r.b_id) for r in bbox_overlap_pairs(ext).collect()]
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    assert set(got) == want

    # whole-world tile overlaps every box (and both parts of cross): each
    # (tile, doc) pair exactly once
    tdf = spark.createDataFrame([("t0-0-0", 0, 0, 0)], "tile_id string, z int, x int, y int")
    tj = [(r.tile_id, r.doc_id) for r in tile_extent_join(tdf, ext).collect()]
    assert sorted(tj) == sorted({("t0-0-0", d) for d in boxes})

    # kNN: the split doc appears at most once per point (part-0 centroid)
    pdf = spark.createDataFrame(
        [(1, 179.0, 0.0), (2, -179.0, 0.0)], "point_id long, lon double, lat double"
    )
    res = knn_points(pdf, ext, k=3).collect()
    assert len(res) == len({(r.point_id, r.doc_id) for r in res}) == 6


def test_count_budgeted_overflow_tier(extents, boxes, points, spark):
    """large_budget=0 forces the whole-world tier (planted 1/97 in the
    corpus) off the broadcast and through the salted coarse-cell equi-join;
    results must be identical to the broadcast path for all three joins, and
    the overflow plan must actually contain the coarse-cell join (ccell)."""

    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(boxes), 2)
        if boxes[a][0] <= boxes[b][2] and boxes[b][0] <= boxes[a][2]
        and boxes[a][1] <= boxes[b][3] and boxes[b][1] <= boxes[a][3]
    }
    over = bbox_overlap_pairs(extents, large_budget=0)
    got = [(r.a_id, r.b_id) for r in over.collect()]
    assert len(got) == len(set(got)), "overflow path emitted duplicate pairs"
    assert set(got) == want
    plan = over._jdf.queryExecution().optimizedPlan().toString()
    assert "ccell" in plan  # the coarse join is really in the plan
    default_plan = bbox_overlap_pairs(extents)._jdf.queryExecution().optimizedPlan().toString()
    assert "ccell" not in default_plan  # and absent under the budget-less default

    pts, df = points
    want_pts = {
        (k, d)
        for (k, x, y) in pts
        for d, (w, s, e, n) in boxes.items()
        if w <= x <= e and s <= y <= n
    }
    got_pts = {
        (r.point_id, r.doc_id)
        for r in point_in_bbox(df, extents, large_budget=0).collect()
    }
    assert got_pts == want_pts

    tiles = [(f"t3-{x}-{y}", 3, x, y) for x in range(8) for y in range(8)]
    tdf = spark.createDataFrame(tiles, "tile_id string, z int, x int, y int")
    want_tiles = set()
    for t, z, x, y in tiles:
        tw, ts = -180 + x * 360 / 2**z, -90 + y * 180 / 2**z
        te, tn = tw + 360 / 2**z, ts + 180 / 2**z
        for d, (w, s, e, n) in boxes.items():
            if tw <= e and w <= te and ts <= n and s <= tn:
                want_tiles.add((t, d))
    got_tiles = [
        (r.tile_id, r.doc_id)
        for r in tile_extent_join(tdf, extents, large_budget=0).collect()
    ]
    assert len(got_tiles) == len(set(got_tiles))
    assert set(got_tiles) == want_tiles

    # under budget: the probe runs but the broadcast path is kept
    assert set(
        (r.a_id, r.b_id)
        for r in bbox_overlap_pairs(extents, large_budget=10**9).collect()
    ) == want


def test_overflow_tier_with_split_boxes(spark):
    """Forced overflow on a corpus that ALSO has antimeridian-split parts:
    the split slice stays broadcast and pair emission remains exactly-once
    even when a counterpart overlaps both parts and an overflow row pairs
    with a split row in either doc-id order."""

    boxes = {
        "band": (-180.0, -20.0, 180.0, 20.0),   # whole-world -> overflow tier
        "cross": (170.0, -10.0, -170.0, 10.0),  # split parts (broadcast)
        "east": (175.0, -5.0, 179.0, 5.0),
        "far": (0.0, 40.0, 10.0, 50.0),
        "west2": (-179.0, -5.0, -175.0, 5.0),
        "zband": (-180.0, -25.0, 180.0, 25.0),  # second overflow row, doc_id AFTER cross
    }
    meta = spark.createDataFrame(
        [(d, "iso", tuple(str(v) for v in b)) for d, b in boxes.items()],
        "doc_id string, standard string, "
        "bounding_box struct<west:string,south:string,east:string,north:string>",
    )
    ext = extents_df(meta)

    def lon_parts(w, e):
        return [(w, e)] if w <= e else [(w, 180.0), (-180.0, e)]

    def olap(a, b):
        lon = any(
            pw <= qe and qw <= pe
            for pw, pe in lon_parts(a[0], a[2])
            for qw, qe in lon_parts(b[0], b[2])
        )
        return lon and a[1] <= b[3] and b[1] <= a[3]

    want = {
        (x, y)
        for x, y in itertools.combinations(sorted(boxes), 2)
        if olap(boxes[x], boxes[y])
    }
    for budget in (None, 0):
        got = [
            (r.a_id, r.b_id)
            for r in bbox_overlap_pairs(ext, large_budget=budget).collect()
        ]
        assert len(got) == len(set(got)), f"duplicates at budget={budget}"
        assert set(got) == want, f"wrong pairs at budget={budget}"

    tdf = spark.createDataFrame(
        [("t0-0-0", 0, 0, 0)], "tile_id string, z int, x int, y int"
    )
    tj = [
        (r.tile_id, r.doc_id)
        for r in tile_extent_join(tdf, ext, large_budget=0).collect()
    ]
    assert sorted(tj) == sorted({("t0-0-0", d) for d in boxes})

    pdf = spark.createDataFrame(
        [(1, 179.0, 0.0), (2, -179.0, 0.0), (3, 5.0, 45.0)],
        "point_id long, lon double, lat double",
    )
    want_pts = {
        (pid, d)
        for pid, x, y in ((1, 179.0, 0.0), (2, -179.0, 0.0), (3, 5.0, 45.0))
        for d, b in boxes.items()
        if any(pw <= x <= pe for pw, pe in lon_parts(b[0], b[2])) and b[1] <= y <= b[3]
    }
    got_pts = {
        (r.point_id, r.doc_id)
        for r in point_in_bbox(pdf, ext, large_budget=0).collect()
    }
    assert got_pts == want_pts


def test_tier_stats_observability(extents, spark):
    """tier_stats reports the whole-world (large) tier the corpus plants
    (1/97 docs) and flags crossing boxes as their own slice."""
    from gmx.geometry import tier_stats

    rows = {(r.is_large, r.split): r for r in tier_stats(extents).collect()}
    assert (False, False) in rows and (True, False) in rows
    small, large = rows[(False, False)], rows[(True, False)]
    assert small.n_extents > large.n_extents > 0
    assert large.max_cells > 64  # whole-world coverings exceed the cap

    meta = spark.createDataFrame(
        [("x", "iso", ("170", "-10", "-170", "10"))],
        "doc_id string, standard string, "
        "bounding_box struct<west:string,south:string,east:string,north:string>",
    )
    cross = {(r.is_large, r.split) for r in tier_stats(extents_df(meta)).collect()}
    assert cross == {(True, True)}  # both parts routed to the broadcast tier


def test_aqe_skew_join_splits_planted_hot_cell(spark):
    """Turns the documented skew story into a proven one: with salting OFF
    and one planted hot cell (every extent in the same half-degree cell),
    AQE's skew-join must split the hot partition — asserted by reading
    `skew=true` out of the final adaptive physical plan.  Thresholds are
    lowered to test scale; production relies on the same mechanism at its
    defaults (gmx/session.py enables AQE + skewJoin)."""

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        # 20k tiny extents all inside one cell near (0.1..0.15, 0.1..0.15)
        ext = spark.range(20_000).selectExpr(
            "concat('d-', id) AS doc_id",
            "0.1 + (id % 100) * 0.0004 AS west",
            "0.1 + (id % 100) * 0.0004 AS south",
            "0.1001 + (id % 100) * 0.0004 AS east",
            "0.1001 + (id % 100) * 0.0004 AS north",
        )
        # non-constant coords so the cell key is computed per row (a literal
        # would constant-fold the equi-join into a cartesian filter)
        pts = spark.range(50).selectExpr(
            "id AS point_id",
            "0.12 + id * 1e-7 AS lon",
            "0.12 + id * 1e-7 AS lat",
        )
        out = point_in_bbox(pts, ext, salt=None)
        # collect() drives THIS DataFrame's QueryExecution, so its adaptive
        # plan is final afterwards (count() would execute a sibling plan)
        assert len(out.collect()) > 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_auto_salt_from_cell_histogram(spark, extents):
    """The join salt is derived from the measured hot-cell occupancy, not a
    hand-picked constant: a planted hot cell (20k extents in one cell) makes
    recommend_salt scale the factor up; the uniform sf corpus resolves to 1;
    and point_in_bbox(salt='auto') returns the same rows as unsalted."""

    from gmx.geometry.joins import recommend_salt

    ext = spark.range(20_000).selectExpr(
        "concat('d-', id) AS doc_id",
        "0.1 + (id % 100) * 0.0004 AS west",
        "0.1 + (id % 100) * 0.0004 AS south",
        "0.1001 + (id % 100) * 0.0004 AS east",
        "0.1001 + (id % 100) * 0.0004 AS north",
    ).cache()
    s = recommend_salt(ext, rows_per_shard=1_000)
    assert s == 20  # ceil(20000 / 1000): every extent lands in one cell
    assert recommend_salt(ext, rows_per_shard=1_000, max_salt=8) == 8
    # the uniform small corpus needs no salt at the production shard target
    assert recommend_salt(extents) == 1

    pts = spark.range(50).selectExpr(
        "id AS point_id",
        "0.12 + id * 1e-7 AS lon",
        "0.12 + id * 1e-7 AS lat",
    )
    unsalted = {(r.point_id, r.doc_id) for r in point_in_bbox(pts, ext).collect()}
    auto = {
        (r.point_id, r.doc_id)
        for r in point_in_bbox(pts, ext, salt="auto", salt_rows_per_shard=1_000).collect()
    }
    assert auto == unsalted and len(auto) > 0
    ext.unpersist()


def test_bucketed_cell_index_joins(spark, extents, boxes, points, tmp_path):
    """Bucketed index tables make repeated spatial joins shuffle-free: the
    index self-join's physical plan has NO Exchange (bucket metadata
    co-locates both sides), and results equal the on-the-fly joins."""

    from gmx.geometry.bucketed import (
        bbox_overlap_pairs_from_index,
        index_self_join,
        point_in_bbox_from_index,
        write_cell_index,
    )

    table = "gmx_test_cellidx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_large")
    write_cell_index(extents, table, str(tmp_path / "cellidx"))

    # at corpus scale the index self-join is a sort-merge join; the test
    # table is broadcast-sized, so pin SMJ to expose the bucketed scan
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sj = index_self_join(spark, table)
        plan = sj._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:3000]  # the whole point of bucketing
        assert "Bucketed: true" in plan, plan[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(boxes), 2)
        if boxes[a][0] <= boxes[b][2] and boxes[b][0] <= boxes[a][2]
        and boxes[a][1] <= boxes[b][3] and boxes[b][1] <= boxes[a][3]
    }
    got = [(r.a_id, r.b_id) for r in bbox_overlap_pairs_from_index(spark, table).collect()]
    assert len(got) == len(set(got))
    assert set(got) == want

    pts, df = points
    want_pts = {
        (k, d)
        for (k, x, y) in pts
        for d, (w, s, e, n) in boxes.items()
        if w <= x <= e and s <= y <= n
    }
    got_pts = {
        (r.point_id, r.doc_id)
        for r in point_in_bbox_from_index(spark, df, table).collect()
    }
    assert got_pts == want_pts

    # tile join from the same index equals the on-the-fly join exactly
    from gmx.geometry.bucketed import tile_extent_join_from_index

    tiles = [(f"t4-{x}-{y}", 4, x, y) for x in range(16) for y in range(16)]
    tdf = spark.createDataFrame(tiles, "tile_id string, z int, x int, y int")
    want_tiles = {
        (r.tile_id, r.doc_id) for r in tile_extent_join(tdf, extents).collect()
    }
    got_tiles = [
        (r.tile_id, r.doc_id)
        for r in tile_extent_join_from_index(spark, tdf, table).collect()
    ]
    assert len(got_tiles) == len(set(got_tiles))
    assert set(got_tiles) == want_tiles
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_large")


def test_bucketed_index_forced_overflow(spark, extents, points, tmp_path):
    """The count-budgeted overflow tier works on the bucketed-index path
    too: with large_budget=0 the whole-world tier routes through the salted
    coarse-cell equi-join instead of a broadcast, with identical results."""

    from gmx.geometry.bucketed import (
        bbox_overlap_pairs_from_index,
        point_in_bbox_from_index,
        write_cell_index,
    )

    table = "gmx_test_ovfidx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_large")
    write_cell_index(extents, table, str(tmp_path / "ovfidx"))
    assert spark.table(f"{table}_large").count() > 0  # whole-world boxes exist

    base = {(r.a_id, r.b_id) for r in bbox_overlap_pairs_from_index(spark, table).collect()}
    ovf = [(r.a_id, r.b_id)
           for r in bbox_overlap_pairs_from_index(spark, table, large_budget=0).collect()]
    assert len(ovf) == len(set(ovf))  # coarse reference-point dedup holds
    assert set(ovf) == base

    _, df = points
    base_pts = {(r.point_id, r.doc_id)
                for r in point_in_bbox_from_index(spark, df, table).collect()}
    ovf_pts = {(r.point_id, r.doc_id)
               for r in point_in_bbox_from_index(spark, df, table, large_budget=0).collect()}
    assert ovf_pts == base_pts
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_large")


def test_bucketed_centroid_index_knn(spark, extents, boxes, points, tmp_path):
    """knn_from_index equals knn_points exactly, and the probe join reads
    the centroid side from bucket metadata (bucketed scan, no Exchange
    above it)."""

    from gmx.geometry.bucketed import knn_from_index, write_centroid_index

    table = "gmx_test_centidx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_centroid_index(extents, table, str(tmp_path / "centidx"))

    pts, df = points
    want = knn_oracle(pts, boxes)
    got = {(r.point_id, r.rank, r.doc_id)
           for r in knn_from_index(spark, df, table).collect()}
    assert got == want

    # plan check on the first-round probe join shape: points side shuffles
    # to the index's bucketing, index side scans its buckets directly
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from pyspark.sql import functions as F
        from gmx.geometry.cellgrid import covering_expr

        idx = spark.table(table)
        probe = df.select(
            "point_id",
            F.explode(
                covering_expr(F.col("lon") - 1, F.col("lat") - 1,
                              F.col("lon") + 1, F.col("lat") + 1, 6)
            ).alias("cell"),
        ).join(idx, on="cell")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan[:3000]
        # exactly one Exchange (the probe side); none above the bucketed scan
        assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_cover_cells_match_oracle(extents, boxes):
    import math

    want = set()
    for d, (w, s, e, n) in boxes.items():
        ix0, ix1 = (min(max(math.floor((v + 180) / 360 * 16), 0), 15) for v in (w, e))
        iy0, iy1 = (min(max(math.floor((v + 90) / 180 * 16), 0), 15) for v in (s, n))
        for ix in range(ix0, ix1 + 1):
            for iy in range(iy0, iy1 + 1):
                want.add((d, (4 * 2**28 + ix) * 2**28 + iy))
    got = {(r.doc_id, r.cell) for r in cover_cells(extents, 4).collect()}
    assert got == want


def test_index_level_memoized(spark, extents, tmp_path, monkeypatch):
    """After a write (or one cold lookup) index_level is a pure dict hit:
    from-index plan construction runs NO driver job / SQL round-trip.
    VERDICT r4 #5."""

    from gmx.geometry import bucketed
    from gmx.geometry.bucketed import (
        index_level,
        invalidate_index_level,
        write_cell_index,
    )

    table = "gmx_test_levelmemo"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_large")
    write_cell_index(extents, table, str(tmp_path / "lvlidx"))

    # the writer primed the memo — a repeated lookup must not touch the
    # catalog at all (any spark.sql would blow up here)
    lvl = index_level(spark, table)
    monkeypatch.setattr(
        spark, "sql", lambda *a, **k: (_ for _ in ()).throw(AssertionError("SQL issued"))
    )
    for _ in range(5):
        assert index_level(spark, table) == lvl
    monkeypatch.undo()

    # invalidation forces a real re-read and re-primes the memo; keys are
    # scoped to the current database so bare names cannot collide across
    # databases (r5 review)
    key = bucketed._memo_key(spark, table)
    assert key.endswith("." + table)
    invalidate_index_level(table)
    assert key not in bucketed._LEVEL_MEMO
    assert index_level(spark, table) == lvl
    assert bucketed._LEVEL_MEMO[key] == lvl

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_large")
