"""Multimodal media operators: opaque binary payloads + typed metadata.

Media spans (``kind='media'``) reference raster tiles and remote catalogs.
This module gives them the treatment a training-data pipeline needs: a typed
media table (binary payload + metadata columns), decode / feature-extract /
thumbnail / frame-sample operators as Arrow ``mapInPandas`` passes with real
schemas, partitioning, and batch shapes.

The actual codec step is a clearly-marked STUB: no image/audio libraries
exist in this container, so ``_decode_payload`` first tries Pillow and falls
back to a deterministic fake decode (dimensions/stats derived from the
payload bytes).  Everything AROUND the codec — the binary column flow, the
per-batch UDF signatures, the explode/join topology — is real and tested;
swapping in a real codec changes one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_TABLE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("media_kind", T.StringType()),   # tile | catalog | other
    T.StructField("payload", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.IntegerType()),
    T.StructField("decoder", T.StringType()),      # 'pillow' | 'stub'
])

THUMB_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("thumb", T.BinaryType()),
    T.StructField("thumb_bytes", T.LongType()),
])


def _fake_payload(ref: str) -> bytes:
    """Deterministic opaque bytes for a media ref — the local stand-in for
    fetching the object from blob storage (payload size scales with ref
    hash so batches carry realistic variation)."""

    seed = hashlib.md5(ref.encode()).digest()
    n = 512 + seed[0] * 8
    return (seed * ((n // len(seed)) + 1))[:n]


def media_table(corpus: DataFrame) -> DataFrame:
    """Span corpus -> typed media table with binary payloads (one Arrow pass).

    At 100 TB payloads would come from object storage via the media_ref; the
    dataflow (explode media spans -> fetch -> binary column) is identical."""

    refs = corpus.select(
        "doc_id",
        F.explode(
            F.transform(
                F.filter("spans", lambda s: s["kind"] == F.lit("media")),
                lambda s: s["media_ref"],
            )
        ).alias("media_ref"),
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_fake_payload(r) for r in pdf["media_ref"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "media_kind": [
                    "tile" if r.startswith("tile://")
                    else "catalog" if r.startswith("catalog://") else "other"
                    for r in pdf["media_ref"]
                ],
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads],
            })

    return refs.mapInPandas(fetch, schema=MEDIA_TABLE_SCHEMA)


def _decode_payload(ref: str, payload: bytes) -> tuple[int, int, int, str]:
    """STUB codec boundary.  Tries Pillow; no imaging stack exists in this
    container, so the deterministic fallback derives (width, height,
    mean_luma) from the payload bytes — stable, testable plumbing."""

    try:  # pragma: no cover - Pillow absent in this environment
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        grey = img.convert("L")
        hist = grey.histogram()
        total = sum(hist)
        luma = int(sum(i * c for i, c in enumerate(hist)) / max(total, 1))
        return img.width, img.height, luma, "pillow"
    except Exception:
        # ImportError (no imaging stack — this container) OR a decode error
        # (e.g. UnidentifiedImageError on the synthetic md5-repeat payloads
        # if Pillow were ever installed): fall through to the deterministic
        # stub so the op degrades to testable plumbing instead of crashing.
        pass
    width = 64 + payload[0] * 4
    height = 64 + payload[1] * 4
    luma = sum(payload[:256]) % 256
    return width, height, luma, "stub"


def decode_images(media: DataFrame) -> DataFrame:
    """Tile payloads -> image metadata (Arrow batch pass over binary col)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _decode_payload(r, bytes(p))
                for r, p in zip(pdf["media_ref"], pdf["payload"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "width": [r[0] for r in rows],
                "height": [r[1] for r in rows],
                "mean_luma": [r[2] for r in rows],
                "decoder": [r[3] for r in rows],
            })

    return media.filter(F.col("media_kind") == "tile").mapInPandas(run, schema=DECODED_SCHEMA)


def thumbnails(media: DataFrame, side: int = 16) -> DataFrame:
    """Resize stub: emits a fixed-size thumbnail payload per tile (real
    plumbing: binary in -> binary out, batch-shaped)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                hashlib.md5(bytes(p)).digest() * ((side * side) // 16)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "thumb": thumbs,
                "thumb_bytes": [len(t) for t in thumbs],
            })

    return media.filter(F.col("media_kind") == "tile").mapInPandas(run, schema=THUMB_SCHEMA)


def media_embeddings(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction stub: payload -> unit-norm embedding vector
    (array<float>), batch-shaped like a real vision encoder (numpy over the
    Arrow batch; swapping in a real model changes one function).  Output
    plugs directly into the ANN/near-dup operators in gmx.textops.similarity
    — media near-duplicate detection is `embedding_near_dup_lsh` over this
    table.  Returns (doc_id, media_ref, embedding)."""

    import numpy as np

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for p in pdf["payload"]:
                buf = np.frombuffer(bytes(p)[: dim * 4], dtype=np.uint8)
                if len(buf) % 4 or not len(buf):
                    # short/ragged payloads: zero-pad to a whole 4-byte group
                    # so reshape can't kill the Arrow worker
                    buf = np.pad(buf, (0, 4 - len(buf) % 4 if len(buf) % 4 else 4))
                raw = buf.astype(np.float64).reshape(-1, 4).mean(axis=1) - 127.5  # "pooled features"
                raw = raw / max(float(np.linalg.norm(raw)), 1e-9)
                vecs.append(raw.astype(np.float32).tolist())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "embedding": vecs,
            })

    return media.filter(F.col("media_kind") == "tile").mapInPandas(run, schema=schema)


def frame_samples(media: DataFrame, every_bytes: int = 256) -> DataFrame:
    """Frame-sampling stub for time-series media: pure column expressions
    producing sample offsets from the payload length."""

    n_frames = F.greatest(F.floor(F.col("n_bytes") / every_bytes).cast("int"), F.lit(1))
    return media.select(
        "doc_id", "media_ref",
        F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_bytes)
        .alias("frame_offsets"),
    )
