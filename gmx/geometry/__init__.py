from gmx.geometry.cellgrid import (
    CELL_BASE,
    cell_id_expr,
    cell_ix_expr,
    cell_iy_expr,
    covering_expr,
)
from gmx.geometry.bucketed import (
    bbox_overlap_pairs_from_index,
    knn_from_index,
    point_in_bbox_from_index,
    write_cell_index,
    write_centroid_index,
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
    "CELL_BASE", "bbox_overlap_pairs", "bbox_overlap_pairs_from_index",
    "cell_id_expr", "cell_ix_expr", "cell_iy_expr", "cover_cells",
    "covering_expr", "extents_df", "knn_from_index", "knn_points",
    "point_in_bbox", "point_in_bbox_from_index", "tier_stats",
    "tile_extent_join", "write_cell_index", "write_centroid_index",
]
