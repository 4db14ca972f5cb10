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
