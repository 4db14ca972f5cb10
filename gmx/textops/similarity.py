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


def _near_dup_predicate(threshold_hundredths: int):
    """Exact integer cosine-threshold test on quantized vectors:
    cos >= t/100  <=>  dot > 0  AND  100^2 * dot^2 >= t^2 * na * nb —
    bit-identical between Spark and the DuckDB oracle."""

    t2 = threshold_hundredths * threshold_hundredths
    return (F.col("dot") > 0) & (
        F.lit(10000).cast("long") * F.col("dot") * F.col("dot")
        >= F.lit(t2).cast("long") * F.col("na") * F.col("nb")
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold_hundredths: int = 35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid_blocks: int = 8,
) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (a_id < b_id, cos >= t),
    as a grid-partitioned theta join (the 1-bucket scheme of Okcan &
    Riedewald, SIGMOD'11): rows hash into ``grid_blocks`` blocks, each row is
    replicated to its row/column of the upper-triangular block-pair grid, and
    the comparison becomes an EQUI-join on (i, j) — every block pair is one
    evenly-sized task, no cartesian join node, no skew, task memory bounded
    by (n/blocks) rows.  Replication factor is (blocks+1)/2 per side; pick
    blocks ~ sqrt(2 * cluster cores) to keep every core busy.

    Honesty note on scale: a *low* threshold (0.35 here — the corpus'
    qualifying pairs measure cos 0.35-0.51, i.e. random-direction tails, not
    planted near-dups) makes the join inherently comparison-quadratic; no
    blocking scheme has 100% recall below ~cos 0.8.  This grid path keeps the
    exact semantics distributable at moderate n; for true near-dup thresholds
    at corpus scale use :func:`embedding_near_dup_lsh` (sub-quadratic,
    recall-characterized, identical verify predicate)."""

    B = grid_blocks
    base = embeddings.select(
        F.col(id_col).alias("vid"), _quantized(F.col(vec_col)).alias("v")
    ).withColumn("nrm", _dot(F.col("v"), F.col("v"))).withColumn(
        "blk", F.pmod(F.xxhash64(F.col("vid")), F.lit(B)).cast("int")
    )
    # a-side: block i owns its row of the grid (j >= i); b-side: column j (i <= j)
    a = base.select(
        F.col("vid").alias("a_id"), F.col("v").alias("va"), F.col("nrm").alias("na"),
        F.col("blk").alias("i"), F.explode(F.sequence(F.col("blk"), F.lit(B - 1))).alias("j"),
    )
    b = base.select(
        F.col("vid").alias("b_id"), F.col("v").alias("vb"), F.col("nrm").alias("nb"),
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("i"), F.col("blk").alias("j"),
    )
    # off-diagonal block pairs see each doc pair exactly once (x from the
    # smaller block on the a-side); diagonal blocks see both orders, so only
    # there the id order filters
    pairs = (
        a.join(b, ["i", "j"])
        .filter((F.col("i") < F.col("j")) | (F.col("a_id") < F.col("b_id")))
        .withColumn("dot", _dot(F.col("va"), F.col("vb")))
        .filter(_near_dup_predicate(threshold_hundredths))
    )
    return pairs.select(
        F.least("a_id", "b_id").alias("a_id"), F.greatest("a_id", "b_id").alias("b_id")
    )


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold_hundredths: int = 90,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    band_bits: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs via multi-band hyperplane LSH blocking — the
    sub-quadratic scale path: ``bands`` independent signatures of
    ``band_bits`` sign bits each; docs sharing ANY band key become
    candidates (equi-join on band key, corpus never self-compared), then the
    same exact integer predicate verifies — so no false positives ever, and
    scores/threshold semantics match :func:`embedding_near_dup` exactly.

    Recall: a pair at cosine c agrees per plane with p = 1 - acos(c)/pi;
    candidate probability = 1 - (1 - p^band_bits)^bands.  Defaults (8x8) give
    ~0.999 at c=0.98, ~0.99 at c=0.95 — sized for true near-duplicates;
    test_embedding_near_dup_lsh_equals_exact pins pair-set equality vs the
    grid-exact path on planted near-dups."""

    q = _quantized(F.col(vec_col))
    base = embeddings.select(
        F.col(id_col).alias("vid"), q.alias("v")
    ).withColumn("nrm", _dot(F.col("v"), F.col("v")))
    keys = _band_keys(F.col("v"), bands, band_bits, hash_mode)
    exploded = base.select("vid", "v", "nrm", F.explode(keys).alias("band_key"))
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("a_id"), F.col("b.vid").alias("b_id"),
            F.col("a.v").alias("va"), F.col("a.nrm").alias("na"),
            F.col("b.v").alias("vb"), F.col("b.nrm").alias("nb"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    return (
        cand.withColumn("dot", _dot(F.col("va"), F.col("vb")))
        .filter(_near_dup_predicate(threshold_hundredths))
        .select("a_id", "b_id")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    query_mod: int = 100,
    bands: int = 24,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_mode: str = "xxhash64",
    candidate_mode: str = "join_back",
) -> DataFrame:
    """Approximate top-k via multi-band (OR-amplified) hyperplane LSH:
    corpus and queries each explode into ``bands`` band keys; a neighbor is a
    candidate when ANY band key matches (equi-join on key, candidate (qid,
    nid) dedup, then exact scoring + window).  Versus a single signature this
    raises recall from 1 - miss to 1 - miss^bands at the same join shape;
    recall >= 0.9 vs the exact cosine_topk is asserted in tests.
    Deterministic (fixed pseudo-random planes).

    ``candidate_mode`` (PLANS.md §11): "join_back" (default, matching the
    MinHash and n-gram paths) shuffles only (id, band_key) per band and
    joins vectors back onto the deduped candidate pairs — at corpus scale
    the band shuffle carries ~16 B/doc/band instead of band x vector
    bytes; "ride" carries vectors through the band explode (no join-back),
    cheaper only when vectors are tiny relative to the keys.  Identical
    results (mode-equality pytest)."""

    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col).alias("nid"), _quantized(F.col(vec_col)).alias("nvec")
    ).withColumn("nnorm", _dot(F.col("nvec"), F.col("nvec")))

    score = _dot(F.col("qvec"), F.col("nvec")) / F.sqrt(
        (F.col("qnorm") * F.col("nnorm")).cast("double")
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())

    if candidate_mode == "join_back":
        keys = base.select(
            "nid", F.explode(_band_keys(F.col("nvec"), bands, band_bits, hash_mode)).alias("band_key")
        )
        qkeys = keys.filter(F.pmod(F.col("nid"), F.lit(query_mod)) == 0).select(
            F.col("nid").alias("qid"), F.col("band_key").alias("qkey")
        )
        pairs = (
            keys.join(qkeys, (F.col("band_key") == F.col("qkey")) & (F.col("qid") != F.col("nid")))
            .select("qid", "nid")
            .dropDuplicates(["qid", "nid"])
        )
        scored = (
            pairs.join(base, "nid")
            .join(
                base.select(
                    F.col("nid").alias("qid"), F.col("nvec").alias("qvec"),
                    F.col("nnorm").alias("qnorm"),
                ),
                "qid",
            )
            .select("qid", "nid", score.alias("score"))
        )
    else:
        idx = base.select(
            "nid", "nvec", "nnorm",
            F.explode(_band_keys(F.col("nvec"), bands, band_bits, hash_mode)).alias("band_key"),
        )
        queries = (
            idx.filter(F.pmod(F.col("nid"), F.lit(query_mod)) == 0)
            .select(
                F.col("nid").alias("qid"), F.col("nvec").alias("qvec"),
                F.col("nnorm").alias("qnorm"), F.col("band_key").alias("qkey"),
            )
        )
        scored = (
            idx.join(queries, (F.col("band_key") == F.col("qkey")) & (F.col("qid") != F.col("nid")))
            .dropDuplicates(["qid", "nid"])
            .select("qid", "nid", score.alias("score"))
        )

    return (
        scored.withColumn("rank", F.row_number().over(w))
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
    assign_mode: str = "float",
    train_iters: int = 0,
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) index — the second scale
    path next to LSH: a small set of coarse centroids partitions the corpus
    into ``lists`` inverted lists; each query probes its ``nprobe`` nearest
    lists, so the all-pairs comparison becomes an equi-join on list id with
    a corpus-side fan-out of 1 (each vector lives in exactly one list — no
    candidate dedup needed, unlike multi-band LSH).

    Centroids start as a deterministic stride sample of the corpus (a
    driver-side collect of ``lists`` rows); ``train_iters`` > 0 refines
    them with that many distributed Lloyd iterations (spherical k-means:
    Arrow-batched nearest-centroid assignment -> posexplode ->
    per-(list, dim) mean — one matmul stage + one map-side-combined agg per
    iteration, with only lists x dim aggregate rows ever collected).
    Training balances the inverted lists on clustered real embeddings, so
    a probe visits fewer off-target lists; recall >= the untrained baseline
    is asserted in tests ON BOTH MODES.  In float mode, assignment is an
    Arrow-batched pandas UDF doing one numpy matmul per batch — vectorized,
    no per-row Python — and trained centroids are float means.  In int mode
    (r4 verdict #6) the SAME Lloyd loop runs with the exact-integer
    quantizer: per-(list, dim) SUM/COUNT are exact BIGINTs and each trained
    coordinate is floor(double(sum)/count + 0.5) — one correctly-rounded
    IEEE divide on exact inputs — so the trained centroids, and therefore
    the whole trained dataflow, stay bit-identical in DuckDB and the driver
    gate runs WITH training.  Recall vs the exact ``cosine_topk`` is
    asserted in tests.

    ``assign_mode`` (like the dedup ops' hash_mode):
    - "float" (default, production): numpy matmul over unit-normalized
      float64 — fast, but the summation order is not reproducible in SQL.
    - "int": coarse assignment ranks centroids by
      sign(dot) * dot^2 / |c|^2 over the QUANTIZED integer vectors (the
      monotone image of cosine — |v| cancels across centroids), evaluated as
      one exact-integer dot per centroid plus a correctly-rounded IEEE
      divide; ties break on centroid index.  Bit-identical in DuckDB, so
      the whole IVF dataflow is oracle-gatable.  Both modes pick the same
      lists except when two centroids tie to double precision."""

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
    if assign_mode == "int":
        import math

        def _int_probes_expr(cent_vecs, n_take):
            ranked = []
            for i, c in enumerate(cent_vecs):
                nc = sum(x * x for x in c) or 1
                cdot = F.aggregate(
                    F.zip_with(
                        F.col("nvec"),
                        F.array(*[F.lit(x).cast("long") for x in c]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                )
                # sign(dot) * dot^2 / |c|^2: exact integer numerator (bounded
                # by (dim * QUANT^2)^2 << 2^63), one IEEE divide; negated so
                # the lexicographic struct sort is (best-first, then centroid
                # index)
                neg = -(
                    F.signum(cdot.cast("double"))
                    * (cdot * cdot).cast("double")
                    / F.lit(float(nc))
                )
                ranked.append(F.struct(neg.alias("nis"), F.lit(i).alias("idx")))
            return F.transform(
                F.slice(F.array_sort(F.array(*ranked)), 1, n_take), lambda s: s["idx"]
            )

        cent_vecs = [[int(x) for x in r["nvec"]] for r in cents]
        # Lloyd refinement stays exact-integer reproducible (r4 verdict #6 —
        # the gated path and the recall-bearing path are now the same code):
        # assignment uses the integer quantizer above; the per-(list, dim)
        # SUM/COUNT are exact BIGINTs, and the new centroid coordinate is
        # floor(double(sum)/count + 0.5) — a single correctly-rounded IEEE
        # divide on exact inputs, so DuckDB's twin computes bit-identical
        # trained centroids.  Lists that captured no vectors keep their seed.
        for _ in range(train_iters):
            stats = (
                base.withColumn("lid", _int_probes_expr(cent_vecs, 1)[0])
                .select("lid", F.posexplode("nvec").alias("pos", "val"))
                .groupBy("lid", "pos")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
                .collect()
            )
            new_vecs = [list(c) for c in cent_vecs]
            for r in stats:
                new_vecs[r["lid"]][r["pos"]] = int(
                    math.floor(float(r["s"]) / float(r["c"]) + 0.5)
                )
            cent_vecs = new_vecs
        assigned = base.withColumn("probes", _int_probes_expr(cent_vecs, nprobe))
    else:
        C = np.asarray([r["nvec"] for r in cents], dtype=np.float64)
        def _nearest_list_udf(Cn_cap):
            # factory (not a default arg): pandas_udf infers types from the
            # signature, so the captured centroid matrix must ride a closure
            @F.pandas_udf("int")
            def nearest_list(vecs: pd.Series) -> pd.Series:
                if len(vecs) == 0:
                    return pd.Series([], dtype="int32")
                V = np.stack(vecs.to_numpy()).astype(np.float64)
                Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
                return pd.Series(np.argmax(Vn @ Cn_cap.T, axis=1).astype(np.int32))

            return nearest_list

        for _ in range(train_iters):
            Cn_it = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            nearest_list = _nearest_list_udf(Cn_it)
            # per-(list, dim) means: lists x dim aggregate rows — tiny collect
            sums = (
                base.withColumn("lid", nearest_list("nvec"))
                .select("lid", F.posexplode("nvec").alias("pos", "val"))
                .groupBy("lid", "pos")
                .agg(F.avg("val").alias("mean"))
                .collect()
            )
            newC = C.copy()  # lists that captured no vectors keep their seed
            for r in sums:
                newC[r["lid"], r["pos"]] = r["mean"]
            C = newC
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


# xor-multiply mixing constants for the portable plane family (hash_mode
# 'poly'): sign(p, dim) = bit 8 of (p*73856093 XOR dim*19349663) — exact
# integer arithmetic DuckDB reproduces, so LSH candidate generation can be
# oracle-gated end to end
_PLANE_MIX_P = 73856093
_PLANE_MIX_I = 19349663


def _plane_dot(qcol, p: int, hash_mode: str = "xxhash64"):
    """Dot with pseudo-random +/-1 hyperplane p: component (p, dim) sign
    from xxhash64(p, dim) parity (default, JVM-native) or the portable
    xor-multiply bit (``hash_mode='poly'``); the whole thing is one JVM
    aggregate over the quantized array."""

    idx = F.sequence(F.lit(0), F.size(qcol) - 1)
    if hash_mode == "poly":
        def sign(x, i):
            mixed = F.lit(p * _PLANE_MIX_P).cast("long").bitwiseXOR(
                i.cast("long") * F.lit(_PLANE_MIX_I).cast("long")
            )
            return F.when(
                F.shiftright(mixed, 8).bitwiseAND(F.lit(1).cast("long")) == 0, x
            ).otherwise(-x)
    else:
        def sign(x, i):
            return F.when(
                F.pmod(F.xxhash64(F.lit(p), i), F.lit(2)) == 0, x
            ).otherwise(-x)
    return F.aggregate(
        F.zip_with(qcol, idx, sign),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _band_keys(qcol, bands: int, band_bits: int, hash_mode: str = "xxhash64"):
    """Array of ``bands`` OR-amplified LSH keys over a quantized vector:
    band b packs sign bits of planes [b*band_bits, (b+1)*band_bits) plus the
    band index (so keys never collide across bands)."""

    keys = []
    for b in range(bands):
        sig = F.lit(b).cast("long") * F.lit(1 << band_bits).cast("long")
        for r in range(band_bits):
            p = b * band_bits + r
            sig = sig + F.when(
                _plane_dot(qcol, p, hash_mode) > 0, F.lit(1 << r).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        keys.append(sig)
    return F.array(*keys)


def lsh_buckets(embeddings: DataFrame, planes: int = 16, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH signature: bit p = sign(dot(vec, plane_p)).
    Returns (vec_id, bucket) — the single-band signature (AND-amplification
    only); multi-band blocking composes these via :func:`_band_keys`."""

    q = _quantized(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bucket = bucket + F.when(_plane_dot(q, p) > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return embeddings.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))
