"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k as a broadcast join + window — exact, and
the yardstick for any approximate path.  Scale path: LSH bucketing via
random-hyperplane signs (sign bits of dot products with fixed pseudo-random
planes), which turns the all-pairs comparison into an equi-join on bucket.

Cross-engine determinism: embeddings are quantized to integers
(floor(x*1000 + 0.5), exact for float32 inputs), so dot products and norms
are exact integer arithmetic and the final score sqrt/divide are correctly
rounded IEEE ops — bit-identical between Spark and the DuckDB oracle, which
makes top-k ranking (score desc, id asc) reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

QUANT = 1000


def _quantized(col):
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_topk(
    embeddings: DataFrame,
    k: int = 5,
    query_mod: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: every ``query_mod``-th vector queries the corpus.

    Plan: broadcast the (small) query side against the corpus stream, score
    JVM-side with zip_with/aggregate (no Python), window per query.
    Returns (query_id, rank, neighbor_id)."""

    base = embeddings.select(
        F.col(id_col).alias("nid"),
        _quantized(F.col(vec_col)).alias("nvec"),
    ).withColumn("nnorm", _dot(F.col("nvec"), F.col("nvec")))

    queries = (
        base.filter(F.pmod(F.col("nid"), F.lit(query_mod)) == 0)
        .select(F.col("nid").alias("qid"), F.col("nvec").alias("qvec"), F.col("nnorm").alias("qnorm"))
    )

    score = _dot(F.col("qvec"), F.col("nvec")) / F.sqrt((F.col("qnorm") * F.col("nnorm")).cast("double"))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        base.join(F.broadcast(queries), F.col("qid") != F.col("nid"))
        .select("qid", "nid", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("rank"),
            F.col("nid").alias("neighbor_id"),
        )
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold_hundredths: int = 35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id, cos >= t).

    The threshold test is pure integer arithmetic on quantized vectors:
      cos >= t/100  <=>  dot >= 0  AND  100^2 * dot^2 >= t^2 * na * nb
    so both engines agree exactly.  Baseline is the all-pairs self-join
    (fine at oracle scale); at corpus scale block with lsh_buckets first —
    same predicate, candidates restricted to shared buckets."""

    t2 = threshold_hundredths * threshold_hundredths
    base = embeddings.select(
        F.col(id_col).alias("vid"), _quantized(F.col(vec_col)).alias("v")
    ).withColumn("nrm", _dot(F.col("v"), F.col("v")))
    a = base.select(
        F.col("vid").alias("a_id"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("vid").alias("b_id"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dot = _dot(F.col("va"), F.col("vb"))
    pairs = (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("dot", dot)
        .filter(
            (F.col("dot") > 0)
            & (F.lit(10000).cast("long") * F.col("dot") * F.col("dot")
               >= F.lit(t2).cast("long") * F.col("na") * F.col("nb"))
        )
    )
    return pairs.select("a_id", "b_id")


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    query_mod: int = 100,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket —
    the scale path that replaces the brute-force broadcast with an equi-join
    on bucket.  Deterministic (fixed pseudo-random planes); recall vs the
    exact cosine_topk is asserted in tests."""

    from pyspark.sql import Window

    buckets = lsh_buckets(embeddings, planes=planes, id_col=id_col, vec_col=vec_col)
    base = embeddings.select(
        F.col(id_col).alias("nid"), _quantized(F.col(vec_col)).alias("nvec")
    ).withColumn("nnorm", _dot(F.col("nvec"), F.col("nvec")))
    base = base.join(buckets.withColumnRenamed("vec_id", "nid"), "nid")

    queries = (
        base.filter(F.pmod(F.col("nid"), F.lit(query_mod)) == 0)
        .select(
            F.col("nid").alias("qid"), F.col("nvec").alias("qvec"),
            F.col("nnorm").alias("qnorm"), F.col("bucket").alias("qbucket"),
        )
    )
    score = _dot(F.col("qvec"), F.col("nvec")) / F.sqrt(
        (F.col("qnorm") * F.col("nnorm")).cast("double")
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        base.join(queries, (F.col("bucket") == F.col("qbucket")) & (F.col("qid") != F.col("nid")))
        .select("qid", "nid", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), "rank", F.col("nid").alias("neighbor_id"))
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    query_mod: int = 100,
    lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) index — the second scale
    path next to LSH: a small set of coarse centroids partitions the corpus
    into ``lists`` inverted lists; each query probes its ``nprobe`` nearest
    lists, so the all-pairs comparison becomes an equi-join on list id with
    a corpus-side fan-out of 1 (each vector lives in exactly one list — no
    candidate dedup needed, unlike multi-band LSH).

    Centroids are a deterministic stride sample of the corpus (no k-means
    training pass; at 100 TB the sample is a driver-side collect of
    ``lists`` rows).  Assignment is an Arrow-batched pandas UDF doing one
    numpy matmul per batch — vectorized, no per-row Python.  Recall vs the
    exact ``cosine_topk`` is asserted in tests."""

    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col).alias("nid"), _quantized(F.col(vec_col)).alias("nvec")
    ).withColumn("nnorm", _dot(F.col("nvec"), F.col("nvec")))

    # deterministic coarse quantizer: stride-sampled centroids (tiny collect);
    # corpora too small/sparse for the stride fall back to the first ids,
    # and an empty corpus returns an empty (correctly-typed) result
    cents = (
        base.filter(F.pmod(F.col("nid"), F.lit(37)) == 0)
        .orderBy("nid")
        .limit(lists)
        .select("nvec")
        .collect()
    )
    if not cents:
        cents = base.orderBy("nid").limit(lists).select("nvec").collect()
    if not cents:
        return base.select(
            F.col("nid").alias("query_id"),
            F.lit(1).cast("int").alias("rank"),
            F.col("nid").alias("neighbor_id"),
        ).limit(0)
    C = np.asarray([r["nvec"] for r in cents], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf("array<int>")
    def probe_lists(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        V = np.stack(vecs.to_numpy()).astype(np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(Vn @ Cn.T), kind="stable", axis=1)[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    assigned = base.withColumn("probes", probe_lists("nvec"))
    corpus = assigned.withColumn("list_id", F.col("probes")[0]).drop("probes")
    queries = (
        assigned.filter(F.pmod(F.col("nid"), F.lit(query_mod)) == 0)
        .select(
            F.col("nid").alias("qid"), F.col("nvec").alias("qvec"),
            F.col("nnorm").alias("qnorm"), F.explode("probes").alias("list_id"),
        )
    )

    score = _dot(F.col("qvec"), F.col("nvec")) / F.sqrt(
        (F.col("qnorm") * F.col("nnorm")).cast("double")
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        corpus.join(queries, on="list_id")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), "rank", F.col("nid").alias("neighbor_id"))
    )


def lsh_buckets(embeddings: DataFrame, planes: int = 16, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH signature: bit p = sign(dot(vec, plane_p)) with
    plane components derived from a fixed hash of (p, dim) — reproducible
    without shipping plane data.  Returns (vec_id, bucket)."""

    q = _quantized(F.col(vec_col))
    idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)

    def plane_dot(p: int):
        # pseudo-random +/-1 plane from xxhash64(p, dim) parity
        return F.aggregate(
            F.zip_with(
                q,
                idx,
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(F.lit(p), i), F.lit(2)) == 0, x
                ).otherwise(-x),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bucket = bucket + F.when(plane_dot(p) > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return embeddings.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))
