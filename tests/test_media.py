"""Multimodal media plumbing: typed binary table, stub decode, thumbnails,
frame samples — schemas and batch shapes are real; the codec is stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmx import pipeline
from gmx.media import decode_images, frame_samples, media_table, thumbnails


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    m = media_table(pipeline.corpus_df(spark, sf_dir))
    m.cache().count()
    return m


def test_media_table_kinds_and_payloads(media):
    kinds = {r.media_kind for r in media.select("media_kind").distinct().collect()}
    assert kinds == {"tile", "catalog"}
    assert media.filter(F.col("n_bytes") != F.length("payload")).count() == 0
    assert media.filter(F.col("n_bytes") < 512).count() == 0


def test_media_payloads_deterministic(media, spark, sf_dir):
    again = media_table(pipeline.corpus_df(spark, sf_dir))
    a = {(r.doc_id, r.media_ref): bytes(r.payload) for r in media.collect()}
    b = {(r.doc_id, r.media_ref): bytes(r.payload) for r in again.collect()}
    assert a == b


def test_decode_images_stub(media):
    dec = decode_images(media)
    rows = dec.collect()
    assert rows and all(r.decoder == "stub" for r in rows)
    assert all(64 <= r.width and 64 <= r.height and 0 <= r.mean_luma < 256 for r in rows)
    # only tiles decode as images
    assert dec.count() == media.filter("media_kind = 'tile'").count()


def test_thumbnails_fixed_size(media):
    th = thumbnails(media, side=16)
    assert th.filter(F.col("thumb_bytes") != 16 * 16).count() == 0


def test_media_embeddings_feed_ann(media):
    """Feature-extract stub: unit-norm array<float> per tile, deterministic,
    and directly consumable by the embedding near-dup operator."""
    import math

    from gmx.media import media_embeddings
    from gmx.textops.similarity import embedding_near_dup_lsh

    emb = media_embeddings(media)
    rows = emb.collect()
    assert rows and all(len(r.embedding) == 16 for r in rows)
    assert all(
        abs(math.fsum(x * x for x in r.embedding) - 1.0) < 1e-3 for r in rows
    )
    assert emb.count() == media.filter("media_kind = 'tile'").count()

    # identical payloads (same media_ref fetched for different docs) are
    # exact embedding duplicates -> the ANN near-dup path finds them
    keyed = emb.select(
        F.monotonically_increasing_id().alias("vec_id"), "embedding"
    )
    dups = embedding_near_dup_lsh(keyed, threshold_hundredths=99)
    shared = (
        emb.groupBy("media_ref").count().filter("count > 1").count()
    )
    assert (dups.count() > 0) == (shared > 0)


def test_frame_samples_expressions(media):
    fs = frame_samples(media, every_bytes=256)
    row = fs.first()
    assert row.frame_offsets[0] == 0
    assert all(
        o % 256 == 0 for o in row.frame_offsets
    )
