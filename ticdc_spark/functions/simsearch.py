"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; sign-LSH bucketing
as the scale path (prune candidate pairs before the exact re-rank — at
100 TB the bucketed join replaces the O(n²) cross join; the exact pass
only runs within buckets).

Hot-path arithmetic (round 6): the pairwise/encode kernels hand whole
Arrow batches to numpy/BLAS inside mapInPandas/applyInPandas
(optimization guide §4.2 — JVM higher-order-function folds evaluate
lambda closures per array element and were the dominant cost), with the
borderline-rounding guard in :mod:`ticdc_spark.functions.veclib` keeping
every rounded value bit-identical to the declared oracles. The plan
shapes that matter at 100 TB are unchanged: encode/assign are narrow
zero-shuffle maps over the scan, pairing shuffles once on the
bucket/cluster key, and the corpus vectors are never joined or shuffled
for scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ticdc_spark.functions import veclib


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _r4(col):
    """Deterministic 4-digit rounding: floor(x*1e4 + 0.5)/1e4 is a pure
    IEEE arithmetic composition — identical on Spark and the DuckDB oracle
    given bit-identical input, with NO rounding-TIE-rule dependence
    (Spark HALF_UP vs DuckDB tie behavior broke a sibling oracle's hash
    check; see the pack_sequences round-5 fix). The SQL twin is
    floor(x * 10000 + 0.5) / 10000.
    """
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / 1000000


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _np_rows(series: pd.Series) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow list column batch. float32 ->
    float64 widening is exact, so downstream arithmetic matches the JVM
    plans' cast('array<double>')."""
    return np.array(series.tolist(), dtype=np.float64)


def cosine_topk(embs: DataFrame, n_queries: int = 8, k: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force exact top-k neighbors for the first `n_queries` vectors.
    The query side is k-scale (collected like a codebook); scoring is ONE
    narrow numpy pass over the corpus (batch GEMM against the query block,
    guide §4.2) — the corpus is never shuffled; the only exchange is the
    tiny per-query rank window."""
    from pyspark.sql import Window as W

    qrows = (
        embs.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    qids = np.array([int(r["qid"]) for r in qrows], dtype=np.int64)
    Q = np.array([[float(x) for x in r["qv"]] for r in qrows], dtype=np.float64)

    def score(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_rows(b[vec_col])
            ids = b[id_col].to_numpy(dtype=np.int64)
            C = veclib.cos_rounded(X, Q)
            n, nq = C.shape
            out = pd.DataFrame({
                "query_id": np.tile(qids, n),
                "neighbor_id": np.repeat(ids, nq),
                "cos_sim": C.ravel(),
            })
            yield out[out["query_id"] != out["neighbor_id"]]

    scored = embs.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _bucket_col(vec_col: str, n_bits: int):
    bucket = F.lit(0).cast("long")
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), i + 1) >= 0, F.lit(2 ** i)
        ).otherwise(F.lit(0))
    return bucket


RP_SEED = 7


def rp_planes(n_bits: int = 8, dim: int = 64, seed: int = RP_SEED) -> list:
    """Seeded Gaussian random-projection hyperplanes, rounded to 6 decimals
    so the identical literals can be embedded in an external SQL oracle.
    Real random projections (vs axis-aligned sign bits) split normalized
    embeddings into near-uniform buckets — the axis-aligned variant skews
    badly when coordinates are correlated."""
    import random

    rng = random.Random(seed)
    return [[round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n_bits)]


def _rp_dot(vec_col: str, plane: list):
    """Left-associated dot product via zip_with + aggregate: per-element
    (double cast) products folded in array order — the same IEEE operation
    sequence a SQL oracle writes as e[1]*c1 + e[2]*c2 + ..., so the signs
    match bitwise. Built as ONE higher-order expression instead of 64
    chained nodes: a 10x smaller Catalyst tree (analysis + codegen time was
    the dominant cost of the 8-plane variant)."""
    lits = F.array(*[F.lit(float(c)) for c in plane])
    return F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), lits, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _rp_bucket_col(vec_col: str, planes: list):
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        bucket = bucket + F.when(_rp_dot(vec_col, plane) >= 0, F.lit(2 ** j)).otherwise(F.lit(0))
    return bucket


def sign_lsh_bucket(embs: DataFrame, n_bits: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH with deterministic axis-aligned hyperplanes: bucket = sign
    pattern of the first n_bits coordinates (demo variant; the production
    path is :func:`rp_lsh_bucket`)."""
    return embs.select(
        F.col(id_col).alias("vec_id"), _bucket_col(vec_col, n_bits).alias("bucket")
    )


def rp_lsh_bucket(embs: DataFrame, n_bits: int = 8, dim: int = 64,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane sign-LSH: bucket = sign pattern of n_bits seeded
    Gaussian projections (SimHash for embeddings, Charikar 2002). One
    narrow numpy pass (X @ planes.T per Arrow batch, sign-guarded at zero
    — veclib.rp_project_signs), zero shuffle."""
    planes = np.array(rp_planes(n_bits, dim), dtype=np.float64)

    def f(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_rows(b[vec_col])
            yield pd.DataFrame({
                "vec_id": b[id_col].to_numpy(dtype=np.int64),
                "bucket": veclib.rp_bucket(X, planes),
            })

    return embs.select(id_col, vec_col).mapInPandas(f, "vec_id long, bucket long")


def _centroid_df(embs: DataFrame, centroid_ids, centroids, id_col, vec_col) -> DataFrame:
    """Centroid side of the IVF quantizer: either a TRAINED codebook
    (list of vectors — literals, so an external oracle can embed the exact
    same values) or data-derived stand-ins (the vectors with given ids)."""
    if centroids is not None:
        spark = embs.sparkSession
        return spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "centroid_id int, cv array<double>",
        )
    return embs.filter(F.col(id_col).isin(*centroid_ids)).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv")
    )


def train_ivf_kmeans(embs: DataFrame, k: int = 8, iters: int = 3,
                     seed_ids: tuple | None = None,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> list:
    """Lloyd's k-means codebook training as a DataFrame loop (spherical
    variant: cosine assignment, arithmetic-mean update).

    Per iteration: (1) assignment = ONE pass over the table against the
    broadcast k-row centroid literals — vectors are never shuffled for
    assignment; (2) update = posexplode to (centroid, dim, value) and a
    per-(centroid, dim) mean — one hash exchange of k*dim*partitions
    partial aggregates, independent of row count. Driver holds only the
    k x dim codebook. Returns centroids rounded to 6 decimals — stable
    literals for external oracles (the rp_planes pattern).

    The reference has no ANN (it replicates rows); this is the
    training-data-pipeline surface's scale path."""
    from pyspark.sql import Window as W

    spark = embs.sparkSession
    seed_ids = tuple(seed_ids) if seed_ids is not None else tuple(range(100, 100 + k))
    cents = [
        [float(x) for x in r["cv"]]
        for r in embs.filter(F.col(id_col).isin(*seed_ids))
        .select(F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("cv"))
        .orderBy("i").collect()
    ]
    v = embs.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "centroid_id int, cv array<double>"
        )
        scored = v.join(F.broadcast(cdf)).select(
            "vec_id", "v", "centroid_id",
            _r4(cosine(F.col("v"), F.col("cv"))).alias("c"),
        )
        w = W.partitionBy("vec_id").orderBy(F.col("c").desc(), F.col("centroid_id"))
        assign = scored.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        means = (
            assign.select("centroid_id", F.posexplode("v").alias("pos", "val"))
            .groupBy("centroid_id", "pos").agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("centroid_id", F.transform("pm", lambda x: x["m"]).alias("cv"))
            .collect()
        )
        new = {int(r["centroid_id"]): [float(x) for x in r["cv"]] for r in means}
        # an emptied cluster keeps its previous centroid
        cents = [new.get(i, cents[i]) for i in range(k)]
    return [[round(x, 6) for x in c] for c in cents]


def kmeans_distortion(embs: DataFrame, centroids: list,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> float:
    """Mean (1 - best cosine) over the table — the spherical k-means
    objective, for convergence tests."""
    cdf = _centroid_df(embs, None, centroids, id_col, vec_col)
    best = (
        embs.select(F.col(vec_col).cast("array<double>").alias("v"), F.col(id_col).alias("i"))
        .join(F.broadcast(cdf))
        .groupBy("i").agg(F.max(_r6(cosine(F.col("v"), F.col("cv")))).alias("b"))
    )
    return float(best.agg(F.avg(F.lit(1.0) - F.col("b"))).collect()[0][0])


def _ivf_assign_np(embs: DataFrame, centroids: list,
                   id_col: str, vec_col: str) -> DataFrame:
    """Trained-codebook coarse assignment as ONE narrow numpy pass: argmax
    r4-rounded cosine with lowest-centroid-id tie-break (identical ranking
    to the window form — veclib.argmax_cos_rounded). Zero shuffle, no
    join: strictly stronger than the prior broadcast-join + per-vector
    window shape (which shuffled one row per vector for the window)."""
    C = np.array(centroids, dtype=np.float64)

    def f(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_rows(b[vec_col])
            yield pd.DataFrame({
                "vec_id": b[id_col].to_numpy(dtype=np.int64),
                "centroid_id": veclib.argmax_cos_rounded(X, C).astype(np.int32),
            })

    return embs.select(id_col, vec_col).mapInPandas(
        f, "vec_id long, centroid_id int"
    )


def ivf_assign(embs: DataFrame, centroid_ids: tuple = tuple(range(100, 108)),
               id_col: str = "vec_id", vec_col: str = "embedding",
               centroids: list | None = None) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its best centroid.
    ``centroids`` takes a TRAINED codebook (:func:`train_ivf_kmeans`
    literals) and runs as a narrow numpy pass (zero shuffle, no join);
    without it, deterministic data-derived stand-ins (the vectors with
    ``centroid_ids``) via the broadcast-join + window form. Ranking is by
    cosine rounded to 4 decimals with centroid-id tie-break so external
    oracles reproduce it exactly."""
    from pyspark.sql import Window as W

    if centroids is not None:
        return _ivf_assign_np(embs, centroids, id_col, vec_col)
    cents = _centroid_df(embs, centroid_ids, None, id_col, vec_col)
    scored = embs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")).join(
        F.broadcast(cents)
    ).select(
        "vec_id", "v", "centroid_id",
        _r4(cosine(F.col("v").cast("array<double>"), F.col("cv").cast("array<double>"))).alias("c"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("c").desc(), F.col("centroid_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter("rn = 1").select(
        "vec_id", "centroid_id"
    )


def _probe_sets(qrows: list, centroids: list, n_probe: int) -> dict:
    """Per-query probed centroid ids, ranked EXACTLY as the window form:
    r4-rounded cosine desc, centroid id asc. Computed with the sequential
    fold directly (k-scale work on the driver), so no guard is needed —
    the values are the same IEEE composition the JVM plan evaluates."""
    out = {}
    for r in qrows:
        q = [float(x) for x in r["qv"]]
        ranked = sorted(
            (
                (-veclib.r4_floor(veclib.cos_seq(q, [float(x) for x in c])), cid)
                for cid, c in enumerate(centroids)
            ),
        )
        out[int(r["qid"])] = [cid for _, cid in ranked[:n_probe]]
    return out


def ivf_topk(embs: DataFrame, n_queries: int = 8, k: int = 3, n_probe: int = 2,
             centroid_ids: tuple = tuple(range(100, 108)),
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: list | None = None) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` best centroid lists per
    query, exact cosine re-rank only within the probed lists — the inverted-
    file trade (scan O(probed lists), not O(table)). Candidates outside the
    probed lists are missed by design; that is the recall/latency dial.
    ``centroids`` = trained codebook literals (:func:`train_ivf_kmeans`),
    run as ONE narrow numpy pass (assign + probe-mask + rounded cosine per
    batch); the only exchange of corpus-derived rows is the tiny per-query
    rank window."""
    from pyspark.sql import Window as W

    if centroids is None:
        return _ivf_topk_join(embs, n_queries, k, n_probe, centroid_ids,
                              id_col, vec_col)
    C = np.array(centroids, dtype=np.float64)
    qrows = (
        embs.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    probes = _probe_sets(qrows, centroids, n_probe)
    qids = np.array(sorted(probes), dtype=np.int64)
    Q = np.array(
        [[float(x) for x in r["qv"]] for r in sorted(qrows, key=lambda r: int(r["qid"]))],
        dtype=np.float64,
    )
    probe_masks = {int(q): np.array(probes[int(q)], dtype=np.int64) for q in qids}

    def score(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_rows(b[vec_col])
            ids = b[id_col].to_numpy(dtype=np.int64)
            assign = veclib.argmax_cos_rounded(X, C)
            outs = []
            for qi, qid in enumerate(qids):
                mask = np.isin(assign, probe_masks[int(qid)]) & (ids != qid)
                if not mask.any():
                    continue
                cs = veclib.cos_rounded(X[mask], Q[qi:qi + 1])[:, 0]
                outs.append(pd.DataFrame({
                    "query_id": np.full(mask.sum(), qid, dtype=np.int64),
                    "neighbor_id": ids[mask],
                    "cos_sim": cs,
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    cand = embs.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    )
    wr = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(wr).cast("long")).filter(
        F.col("rank") <= k
    ).select("query_id", "neighbor_id", "rank", "cos_sim")


def _ivf_topk_join(embs: DataFrame, n_queries: int, k: int, n_probe: int,
                   centroid_ids: tuple, id_col: str, vec_col: str) -> DataFrame:
    """Data-derived-centroid variant (no trained codebook): the original
    broadcast-join + window composition."""
    from pyspark.sql import Window as W

    assign = ivf_assign(embs, centroid_ids, id_col, vec_col)
    cents = _centroid_df(embs, centroid_ids, None, id_col, vec_col)
    q = embs.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qs = q.join(F.broadcast(cents)).select(
        "query_id", "qv", "centroid_id",
        _r4(cosine(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>"))).alias("c"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("centroid_id"))
    probes = qs.withColumn("rn", F.row_number().over(wq)).filter(
        F.col("rn") <= n_probe
    ).select("query_id", "qv", "centroid_id")
    cand = probes.join(assign, "centroid_id").filter(
        F.col("query_id") != F.col("vec_id")
    ).select("query_id", "qv", F.col("vec_id").alias("neighbor_id"))
    cand = cand.join(
        embs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")),
        "neighbor_id",
    ).select(
        "query_id", "neighbor_id",
        _r4(cosine(F.col("qv").cast("array<double>"), F.col("nv").cast("array<double>"))).alias("cos_sim"),
    )
    wr = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(wr).cast("long")).filter(
        F.col("rank") <= k
    ).select("query_id", "neighbor_id", "rank", "cos_sim")


def _pair_fn(min_sim: float, max_group: int | None, key_col: str):
    """Within-group pairing kernel: sort by vec_id, one symmetric GEMM of
    the group's vectors (veclib.cos_rounded_sym — guarded rounding), emit
    the upper-triangle pairs at/above ``min_sim``. Groups over
    ``max_group`` are dropped before pairing (same cap semantics as the
    window-count form: an over-full bucket carries no dup signal)."""
    empty = pd.DataFrame({
        "vec_id_a": pd.Series([], dtype="int64"),
        "vec_id_b": pd.Series([], dtype="int64"),
        "cos_sim": pd.Series([], dtype="float64"),
    })

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2 or (max_group is not None and n > max_group):
            return empty
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        V = np.array(pdf["v"].tolist(), dtype=np.float64)
        Cm = veclib.cos_rounded_sym(V)
        ia, ib = np.triu_indices(n, k=1)
        sims = Cm[ia, ib]
        keep = sims >= min_sim
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "vec_id_a": ids[ia[keep]],
            "vec_id_b": ids[ib[keep]],
            "cos_sim": sims[keep],
        })

    _ = key_col
    return pairs


def lsh_neardup_pairs(embs: DataFrame, n_bits: int = 8, min_cos: float = 0.1,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      planes: list | None = None,
                      max_bucket: int | None = None) -> DataFrame:
    """Near-dup candidate pairs: same LSH bucket, then exact cosine filter
    (bucket-join candidate generation + exact verify).

    ``planes`` switches to random-projection buckets (pass
    :func:`rp_planes` output) and runs the pairing as ONE exchange on the
    bucket key + a per-bucket numpy GEMM (guide §4.2) — the prior form
    paid a window-count exchange plus a self-join that re-evaluated the
    projection subplan twice. ``max_bucket`` drops buckets larger than
    the cap before the self-pairing — a degenerate bucket (all-zero or
    boilerplate embeddings) otherwise goes O(b²); an over-full bucket
    carries no near-dup signal. Any oracle must apply the same cap."""
    if planes is not None:
        P = np.array(planes, dtype=np.float64)

        def withb(batches):
            for b in batches:
                if not len(b):
                    continue
                X = _np_rows(b[vec_col])
                yield pd.DataFrame({
                    "vec_id": b[id_col].to_numpy(dtype=np.int64),
                    "bucket": veclib.rp_bucket(X, P),
                    "v": b[vec_col],
                })

        bucketed = embs.select(id_col, vec_col).mapInPandas(
            withb, "vec_id long, bucket long, v array<double>"
        )
        return bucketed.groupBy("bucket").applyInPandas(
            _pair_fn(min_cos, max_bucket, "bucket"),
            "vec_id_a long, vec_id_b long, cos_sim double",
        )
    bucket = _bucket_col(vec_col, n_bits)
    withb = embs.select(
        F.col(id_col).alias("vec_id"),
        bucket.alias("bucket"),
        F.col(vec_col).alias("v"),
    )
    if max_bucket is not None:
        # bucket-size cap via a window count: one shuffle on bucket, no
        # extra self-join (and no re-evaluation of the projection expr)
        from pyspark.sql import Window as W

        withb = withb.withColumn(
            "_bsz", F.count(F.lit(1)).over(W.partitionBy("bucket"))
        ).filter(F.col("_bsz") <= max_bucket).drop("_bsz")
    a = withb.alias("a")
    b = withb.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            _r4(cosine(F.col("a.v").cast("array<double>"), F.col("b.v").cast("array<double>"))).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cos)
    )


def semdedup(embs: DataFrame, tau: float = 0.35,
             centroid_ids: tuple = tuple(range(100, 108)),
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: list | None = None,
             max_cluster: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    the k-means coarse quantizer — pairwise cosine is computed only WITHIN
    a cluster, members joined by a pair at or above ``tau`` collapse to a
    canonical representative (the connected component's min vec_id), and
    every vector is labeled keep/drop.

    Scale shape: the cluster assignment is ONE narrow numpy pass (zero
    shuffle, no join — the codebook is a task-local array); the
    within-cluster pairing is ONE exchange on centroid_id feeding a
    per-cluster numpy GEMM (guide §4.2 — the prior per-pair
    higher-order-function fold was >20x slower at O((n/k)^2) pair
    counts), which is the paper's own trade, dialed by training k
    proportional to corpus size (50k clusters for LAION-scale);
    ``max_cluster`` additionally drops over-full clusters from pairing
    (they carry no dup signal, same cap rationale as LSH buckets).
    Components resolve with the same Pregel-lite min-label loop as the
    text near-dup path."""
    from ticdc_spark.functions.textops import neardup_clusters

    if centroids is None:
        return _semdedup_join(embs, tau, centroid_ids, id_col, vec_col,
                              max_cluster)
    C = np.array(centroids, dtype=np.float64)

    def enc_fn(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_rows(b[vec_col])
            yield pd.DataFrame({
                "vec_id": b[id_col].to_numpy(dtype=np.int64),
                "centroid_id": veclib.argmax_cos_rounded(X, C).astype(np.int32),
                "v": b[vec_col],
            })

    # the assignment feeds BOTH the pairing and the final label join;
    # checkpoint it once so neither consumer recomputes the scan (the
    # operator is action-bearing already — the component loop runs jobs)
    enc = embs.select(id_col, vec_col).mapInPandas(
        enc_fn, "vec_id long, centroid_id int, v array<double>"
    ).localCheckpoint(eager=True)
    pairs = enc.groupBy("centroid_id").applyInPandas(
        _pair_fn(tau, max_cluster, "centroid_id"),
        "vec_id_a long, vec_id_b long, cos_sim double",
    )
    comp = neardup_clusters(pairs, a_col="vec_id_a", b_col="vec_id_b")
    assign = enc.select("vec_id", "centroid_id")
    return assign.join(
        comp.select(F.col("doc_id").alias("vec_id"),
                    F.col("cluster").alias("_canon")),
        "vec_id", "left",
    ).select(
        "vec_id",
        "centroid_id",
        F.coalesce(F.col("_canon"), F.col("vec_id"))
        .cast("long").alias("canonical_id"),
        (F.coalesce(F.col("_canon"), F.col("vec_id")) == F.col("vec_id"))
        .alias("is_kept"),
    )


def _semdedup_join(embs: DataFrame, tau: float, centroid_ids: tuple,
                   id_col: str, vec_col: str,
                   max_cluster: int | None) -> DataFrame:
    """Data-derived-centroid variant: the original self-join composition
    with per-vector precomputed norms."""
    from pyspark.sql import Window as W

    from ticdc_spark.functions.textops import neardup_clusters

    assign = ivf_assign(embs, centroid_ids, id_col, vec_col,
                        centroids=None).localCheckpoint(eager=True)
    withc = assign.join(
        embs.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).cast("array<double>").alias("v")),
        "vec_id",
    ).withColumn("_nrm", _norm(F.col("v")))
    paired = withc
    if max_cluster is not None:
        paired = paired.withColumn(
            "_csz", F.count(F.lit(1)).over(W.partitionBy("centroid_id"))
        ).filter(F.col("_csz") <= max_cluster).drop("_csz")
    a = paired.alias("a")
    b = paired.alias("b")
    pairs = (
        a.join(b, (F.col("a.centroid_id") == F.col("b.centroid_id"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            _r4(_dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a._nrm") * F.col("b._nrm"))).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= tau)
    )
    comp = neardup_clusters(pairs, a_col="vec_id_a", b_col="vec_id_b")
    return assign.join(
        comp.select(F.col("doc_id").alias("vec_id"),
                    F.col("cluster").alias("_canon")),
        "vec_id", "left",
    ).select(
        "vec_id",
        "centroid_id",
        F.coalesce(F.col("_canon"), F.col("vec_id"))
        .cast("long").alias("canonical_id"),
        (F.coalesce(F.col("_canon"), F.col("vec_id")) == F.col("vec_id"))
        .alias("is_kept"),
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"): split each D-dim vector into M subspaces,
# k-means each subspace to KSUB centroids, store vectors as M small codes,
# and answer queries with an asymmetric-distance (ADC) table scan. The
# 100-TB ANN shape: the vector table compresses D floats -> M bytes and
# scoring never touches the original vectors.
# ---------------------------------------------------------------------------


def _sub_slice(vec, sub: int, d_sub: int):
    return F.slice(vec, sub * d_sub + 1, d_sub)


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def train_pq_kmeans(embs: DataFrame, m: int = 8, ksub: int = 16, iters: int = 3,
                    dim: int = 64, seed_ids: tuple | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> list:
    """Train the PQ codebook: per-subspace Lloyd's k-means (L2), ALL
    subspaces jointly per iteration — assignment is one pass of the
    (vec, sub) rows against the broadcast m*ksub codebook (vectors never
    shuffle for assignment); the update is one (sub, cid, pos) mean whose
    exchange carries m*ksub*d_sub partial aggregates per partition,
    independent of row count. Returns ``cents[m][ksub]`` rounded to 6
    decimals — stable literals for external oracles (the rp_planes /
    train_ivf_kmeans pattern)."""
    from pyspark.sql import Window as W

    spark = embs.sparkSession
    d_sub = dim // m
    seed_ids = tuple(seed_ids) if seed_ids is not None else tuple(range(100, 100 + ksub))
    seeds = {
        int(r["i"]): [float(x) for x in r["v"]]
        for r in embs.filter(F.col(id_col).isin(*seed_ids))
        .select(F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    }
    cents = [
        [seeds[sid][s * d_sub:(s + 1) * d_sub] for sid in sorted(seeds)]
        for s in range(m)
    ]
    v = embs.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(F.lit(s).alias("sub"), _sub_slice(F.col("v"), s, d_sub).alias("sv"))
            for s in range(m)
        ])).alias("e"),
    ).select("vec_id", "e.sub", "e.sv")
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(s, j, cents[s][j]) for s in range(m) for j in range(ksub)],
            "sub int, cid int, cv array<double>",
        )
        scored = v.join(F.broadcast(cdf), "sub").select(
            "vec_id", "sub", "sv", "cid", _r6(_l2sq(F.col("sv"), F.col("cv"))).alias("d2")
        )
        w = W.partitionBy("vec_id", "sub").orderBy("d2", "cid")
        assign = scored.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        means = (
            assign.select("sub", "cid", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub", "cid", "pos").agg(F.avg("val").alias("mu"))
            .groupBy("sub", "cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mu"))).alias("pm"))
            .select("sub", "cid", F.transform("pm", lambda x: x["mu"]).alias("cv"))
            .collect()
        )
        new = {(int(r["sub"]), int(r["cid"])): [float(x) for x in r["cv"]] for r in means}
        cents = [
            [new.get((s, j), cents[s][j]) for j in range(ksub)] for s in range(m)
        ]
    return [[[round(x, 6) for x in c] for c in row] for row in cents]


def _pq_code_expr(v, codebook: list, dim: int):
    """The M-code of a vector as a narrow Column expression: per subspace,
    one transform (distances to the ksub literal centroids) + one zip_with
    (attach ids) + array_min (argmin with id tie-break). Kept as the JVM
    twin of veclib.pq_codes for tests/oracle documentation; the hot path
    encodes in numpy. ``v`` must already be array<double>."""
    m, ksub = len(codebook), len(codebook[0])
    d_sub = dim // m
    code = []
    for s in range(m):
        sv = _sub_slice(v, s, d_sub)
        cbl = F.array(*[
            F.array(*[F.lit(float(x)) for x in codebook[s][j]]) for j in range(ksub)
        ])
        dists = F.transform(cbl, lambda c: _r6(_l2sq(sv, c)))
        cands = F.zip_with(
            dists,
            F.sequence(F.lit(0), F.lit(ksub - 1)),
            lambda d, i: F.struct(d.alias("d2"), i.alias("cid")),
        )
        code.append(F.array_min(cands)["cid"])
    return F.array(*code)


def pq_encode(embs: DataFrame, codebook: list, dim: int = 64,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """PQ encode: per subspace, the argmin-L2 centroid id — D floats
    become M small ints. ZERO shuffle and no join: one narrow numpy pass
    (veclib.pq_codes — batched subspace distances with the guarded r6
    rounding and the same lowest-cid tie-break), so encoding runs
    entirely inside the scan stage (at 100 TB this is the property that
    matters — re-encoding a corpus is a single pass)."""
    CB = np.array(codebook, dtype=np.float64)

    def f(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_rows(b[vec_col])
            codes = veclib.pq_codes(X, CB)
            yield pd.DataFrame({
                "vec_id": b[id_col].to_numpy(dtype=np.int64),
                "code": list(codes),
            })

    return embs.select(id_col, vec_col).mapInPandas(
        f, "vec_id long, code array<int>"
    )


def pq_topk(embs: DataFrame, n_queries: int = 8, k: int = 3,
            codebook: list | None = None, dim: int = 64,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """PQ approximate top-k by asymmetric distance (ADC): queries keep
    their exact vectors; every corpus vector is represented ONLY by its
    M-code, and the approximate distance is the sum of per-subspace exact
    query->centroid distances. One narrow numpy pass encodes each batch
    and scores it against the per-query ADC tables (exact r6 terms,
    fold-ordered sum — veclib.adc_rounded); the corpus vectors are never
    re-read or shuffled for scoring, and the only exchange is the tiny
    per-query rank window."""
    from pyspark.sql import Window as W

    CB = np.array(codebook, dtype=np.float64)
    qrows = (
        embs.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    qids = sorted(int(r["qid"]) for r in qrows)
    tables = {
        int(r["qid"]): veclib.pq_query_tables(
            np.array([float(x) for x in r["qv"]], dtype=np.float64), CB)
        for r in qrows
    }

    def score(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_rows(b[vec_col])
            ids = b[id_col].to_numpy(dtype=np.int64)
            codes = veclib.pq_codes(X, CB)
            outs = []
            for qid in qids:
                mask = ids != qid
                if not mask.any():
                    continue
                ad = veclib.adc_rounded(codes[mask], tables[qid])
                outs.append(pd.DataFrame({
                    "query_id": np.full(int(mask.sum()), qid, dtype=np.int64),
                    "neighbor_id": ids[mask],
                    "adist": ad,
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = embs.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, adist double"
    )
    w = W.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    ).select("query_id", "neighbor_id", "rank", "adist")


def ivf_assign_inline(vec, centroids: list):
    """Expression-form IVF coarse assignment: argmax rounded-cosine over
    the literal codebook with lowest-centroid-id tie-break — the SAME
    ranking rule as :func:`ivf_assign`, but as a narrow Column (zero
    shuffle, no join): the assignment happens inside the scan stage.
    ``vec`` must already be array<double>."""
    k = len(centroids)
    cbl = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])
    sims = F.transform(cbl, lambda c: -_r4(cosine(vec, c)))
    cands = F.zip_with(
        sims, F.sequence(F.lit(0), F.lit(k - 1)),
        lambda s, i: F.struct(s.alias("negc"), i.alias("cid")),
    )
    return F.array_min(cands)["cid"]


def ivfpq_topk(embs: DataFrame, n_queries: int = 8, k: int = 3, n_probe: int = 2,
               centroids: list | None = None, codebook: list | None = None,
               dim: int = 64, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ: the production composition (the FAISS IVFPQ shape) —
    coarse-quantize AND PQ-encode every vector in ONE narrow numpy pass
    (both codebooks are task-local arrays: zero shuffle, no join on the
    corpus side), mask candidates by the per-query probe sets, score by
    asymmetric distance over the codes alone, and rank per query. The
    ONLY exchange over corpus-derived rows is the final per-query top-k
    window, whose input is already probe-pruned; the corpus vectors are
    read exactly once and never shuffled.

    Codes quantize the RAW vectors (the by_residual=false variant):
    full-probe IVFPQ is then bit-identical to plain PQ/ADC (the tested
    invariant). Residual encoding would need a residual-trained codebook
    and trades that equivalence for recall."""
    from pyspark.sql import Window as W

    C = np.array(centroids, dtype=np.float64)
    CB = np.array(codebook, dtype=np.float64)
    qrows = (
        embs.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    probes = _probe_sets(qrows, centroids, n_probe)
    qids = sorted(probes)
    tables = {
        int(r["qid"]): veclib.pq_query_tables(
            np.array([float(x) for x in r["qv"]], dtype=np.float64), CB)
        for r in qrows
    }
    probe_arr = {q: np.array(probes[q], dtype=np.int64) for q in qids}

    def score(batches):
        for b in batches:
            if not len(b):
                continue
            X = _np_rows(b[vec_col])
            ids = b[id_col].to_numpy(dtype=np.int64)
            assign = veclib.argmax_cos_rounded(X, C)
            codes = veclib.pq_codes(X, CB)
            outs = []
            for qid in qids:
                mask = np.isin(assign, probe_arr[qid]) & (ids != qid)
                if not mask.any():
                    continue
                ad = veclib.adc_rounded(codes[mask], tables[qid])
                outs.append(pd.DataFrame({
                    "query_id": np.full(int(mask.sum()), qid, dtype=np.int64),
                    "neighbor_id": ids[mask],
                    "adist": ad,
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = embs.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, adist double"
    )
    wr = W.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(wr).cast("long")).filter(
        F.col("rank") <= k
    ).select("query_id", "neighbor_id", "rank", "adist")
