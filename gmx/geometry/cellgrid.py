"""Hierarchical equirectangular cell grid (H3/S2-style discrete global grid).

Neither the h3 nor s2geometry wheels exist in this environment, so the engine
ships its own discrete global grid with the same *join semantics* (hierarchical
covering -> equi-join -> exact refine).  Level ``L`` divides lon [-180,180)
into 2^L columns and lat [-90,90) into 2^L rows; a cell id packs
``(level, ix, iy)`` into one int64 via pure integer arithmetic:

    cell_id = (L * 2^28 + ix) * 2^28 + iy

Everything is closed-form integer math on the half-degree coordinate lattice
(gmx.corpus), so cell assignment is bit-identical between Spark column
expressions, numpy, and the DuckDB oracle SQL — no library dependence, no
floating-point grid-boundary ambiguity.

Parent/child relation: cell at L+1 has ix//2, iy//2 at L — used to coarsen
coverings of huge (whole-world) extents instead of emitting thousands of
fine cells (skew control, SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

CELL_BASE = 1 << 28  # packing radix; supports levels up to 27

DEFAULT_LEVEL = 4  # 22.5 deg x 11.25 deg cells; whole-world covering = 256 cells


def nx(level: int) -> int:
    return 1 << level


def cell_ix_expr(lon: Column, level: int) -> Column:
    """Column: longitude (deg) -> column index at ``level``, clamped."""

    n = nx(level)
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw)).cast("long")


def cell_iy_expr(lat: Column, level: int) -> Column:
    n = nx(level)
    raw = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(n))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw)).cast("long")


def cell_id_expr(level: int, ix: Column, iy: Column) -> Column:
    base = F.lit(CELL_BASE).cast("long")
    return (F.lit(level).cast("long") * base + ix) * base + iy


def point_cell_expr(lon: Column, lat: Column, level: int) -> Column:
    return cell_id_expr(level, cell_ix_expr(lon, level), cell_iy_expr(lat, level))


def cells_for_ranges(ix0: Column, ix1: Column, iy0: Column, iy1: Column, level: int) -> Column:
    """Array<long> of cell ids for an inclusive index-range window — built
    with sequence + nested transform + flatten so the generated code is a
    loop, not an unrolled expression (unrolling blows janino's 64KB method
    limit for large windows)."""

    return F.flatten(
        F.transform(
            F.sequence(ix0, ix1),
            lambda ix: F.transform(F.sequence(iy0, iy1), lambda iy: cell_id_expr(level, ix, iy)),
        )
    )


def covering_expr(west: Column, south: Column, east: Column, north: Column, level: int) -> Column:
    """Array<long> of cell ids covering a bbox at ``level`` — pure JVM
    expressions, no UDF."""

    ix0, ix1 = cell_ix_expr(west, level), cell_ix_expr(east, level)
    iy0, iy1 = cell_iy_expr(south, level), cell_iy_expr(north, level)
    return cells_for_ranges(ix0, ix1, iy0, iy1, level)


def covering_size_expr(west: Column, south: Column, east: Column, north: Column, level: int) -> Column:
    ix0, ix1 = cell_ix_expr(west, level), cell_ix_expr(east, level)
    iy0, iy1 = cell_iy_expr(south, level), cell_iy_expr(north, level)
    return (ix1 - ix0 + 1) * (iy1 - iy0 + 1)


# ----------------------------------------------------------- numpy twin
# Used by single-node oracles in tests; must match the Spark expressions
# exactly (integer/double arithmetic is identical by construction).

def np_cell_ix(lon: np.ndarray, level: int) -> np.ndarray:
    n = nx(level)
    return np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)


def np_cell_iy(lat: np.ndarray, level: int) -> np.ndarray:
    n = nx(level)
    return np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)


def np_cell_id(level: int, ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (level * CELL_BASE + ix) * CELL_BASE + iy
