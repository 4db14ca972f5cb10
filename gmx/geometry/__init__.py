from gmx.geometry.cellgrid import (
    CELL_BASE,
    cell_id_expr,
    cell_ix_expr,
    cell_iy_expr,
    covering_expr,
)
from gmx.geometry.extents import extents_df
from gmx.geometry.joins import (
    bbox_overlap_pairs,
    cover_cells,
    knn_points,
    point_in_bbox,
    tier_stats,
    tile_extent_join,
)

__all__ = [
    "CELL_BASE", "bbox_overlap_pairs", "cell_id_expr", "cell_ix_expr",
    "cell_iy_expr", "cover_cells", "covering_expr", "extents_df",
    "knn_points", "point_in_bbox", "tier_stats", "tile_extent_join",
]
