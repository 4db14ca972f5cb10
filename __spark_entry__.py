"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship pipeline on sf0.001: span corpus -> dispatch ->
              wide extraction -> catalog join -> extents -> cell-covering
              tile assignment histogram.
``queries`` — one entry per implemented operator (SURVEY.md §2 ids noted in
              gmx.queries docstrings).
``oracle_sql`` — DuckDB SQL recomputing expected outputs from corpus
              arithmetic (gmx.oracles).  EVERY query carries an oracle —
              including media_decode_stub, whose deterministic fake decode
              is hash-gated against a DuckDB md5-byte twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from gmx import oracles, queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""

    from gmx.cache import cached_metadata
    from gmx.geometry import cover_cells, extents_df

    meta = cached_metadata(spark, "/root/testdata/sf0.001")
    ext = extents_df(meta)
    return (
        cover_cells(ext, level=4)
        .groupBy("cell")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("cell")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # extraction / dispatch (EP1)
        "extract_standard_counts": Q.extract_standard_counts,
        "extract_titles": Q.extract_titles,
        "extract_bbox": Q.extract_bbox,
        "extract_dates": Q.extract_dates,
        "extract_keywords": Q.extract_keywords,
        "extract_arcgis_keywords": Q.extract_arcgis_keywords,
        "extract_contacts": Q.extract_contacts,
        "extract_attributes": Q.extract_attributes,
        "extract_digital_forms": Q.extract_digital_forms,
        "extract_process_steps": Q.extract_process_steps,
        "extract_larger_works": Q.extract_larger_works,
        "extract_raster_info": Q.extract_raster_info,
        "extract_distribution_fields": Q.extract_distribution_fields,
        "convert_to_iso": Q.convert_to_iso,
        "convert_to_fgdc": Q.convert_to_fgdc,
        "convert_to_arcgis": Q.convert_to_arcgis,
        "validate_quarantine": Q.validate_quarantine,
        "spans_roundtrip_violations": Q.spans_roundtrip_violations,
        "update_preserve_violations": Q.update_preserve_violations,
        "media_refs_extract": Q.media_refs_extract,
        "events_windowed_counts": Q.events_windowed_counts,
        "events_sliding_counts": Q.events_sliding_counts,
        "events_sessionize": Q.events_sessionize,
        "events_sessionize_stream": Q.events_sessionize_stream,
        # spatial layer (north rule)
        "spatial_tile_cover": Q.spatial_tile_cover,
        "spatial_cell_histogram": Q.spatial_cell_histogram,
        "spatial_place_keyword_cells": Q.spatial_place_keyword_cells,
        "spatial_bbox_overlap_join": Q.spatial_bbox_overlap_join,
        "spatial_point_in_bbox": Q.spatial_point_in_bbox,
        "spatial_knn": Q.spatial_knn,
        "spatial_raster_tile_join": Q.spatial_raster_tile_join,
        "spatial_bbox_overlap_indexed": Q.spatial_bbox_overlap_indexed,
        "spatial_point_in_bbox_indexed": Q.spatial_point_in_bbox_indexed,
        "spatial_tile_join_indexed": Q.spatial_tile_join_indexed,
        "spatial_knn_indexed": Q.spatial_knn_indexed,
        # training-data ops
        "dedup_exact": Q.dedup_exact,
        "text_token_count": Q.text_token_count,
        "text_token_count_regex": Q.text_token_count_regex,
        "text_quality": Q.text_quality,
        "text_repetition": Q.text_repetition,
        "text_decontaminate": Q.text_decontaminate,
        "text_lang_id": Q.text_lang_id,
        "dedup_ngram_jaccard": Q.dedup_ngram_jaccard,
        "ann_cosine_topk": Q.ann_cosine_topk,
        "dedup_embedding_cosine": Q.dedup_embedding_cosine,
        "dedup_embedding_lsh": Q.dedup_embedding_lsh,
        "text_fingerprint": Q.text_fingerprint,
        "dedup_minhash_lsh": Q.dedup_minhash_lsh,
        "dedup_simhash": Q.dedup_simhash,
        "dedup_simhash_pairs": Q.dedup_simhash_pairs,
        "ann_lsh_topk": Q.ann_lsh_topk,
        "ann_ivf_topk": Q.ann_ivf_topk,
        "dedup_clusters": Q.dedup_clusters,
        "dedup_clusters_star": Q.dedup_clusters_star,
        "sample_stratified": Q.sample_stratified,
        # media codec stub (deterministic fake decode, hash-gated)
        "media_decode_stub": Q.media_decode_stub,
    }


def oracle_sql() -> dict[str, str]:
    return oracles.oracle_sql()
