"""Similarity search over embedding columns (`array<float>`).

Two tiers:
- brute-force cosine top-k — the exact baseline, a broadcast
  nested-loop over the (small) query set: the corpus is scanned ONCE,
  never shuffled, so it scales linearly with corpus size;
- random-hyperplane LSH bucketing — the approximate scale path: each
  vector maps to a bit-bucket, candidate generation is an equi-join on
  the bucket (one shuffle, no O(n²)).

All vector math is JVM-side (`zip_with` dot product + `aggregate`
sums); no Python in the hot path. The hyperplanes are pseudo-random but
fully deterministic: plane p, dimension d gets weight
(pmod(xxhash64(p*4099+d), 2001) - 1000) / 1000 — reproducible across
runs with zero driver-side state to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine as cosine_expr
from ..functions.vectors import hyperplane_bucket  # noqa: F401 (re-export)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    The query set is broadcast; the corpus never shuffles for the join.
    Ranking shuffles only (corpus × |queries|) rows that carry
    (ids, cosine) — the embedding columns are pruned before the
    exchange. Deterministic tiebreak on neighbor id.
    """
    from pyspark.sql.window import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("qv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr("qv", "v").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Top-k cosine neighbors over int8 scalar-quantized embeddings —
    the storage/shuffle scale path for 100 TB embedding stores: codes
    are 4× smaller than float32 (8× smaller than the double math they
    replace), and the per-vector scale factor cancels out of cosine,
    so scoring is pure integer dot products (exact, bit-reproducible
    on any engine — no float-summation-order concerns at all).

    Same distribution shape as the exact baseline: quantize each side
    once (chained selects — a Catalyst common-subexpr barrier so the
    scale isn't recomputed per code), precompute integer norms BEFORE
    the join so the broadcast join output carries only (ids, dot,
    norms), never the code arrays.
    """
    from pyspark.sql.window import Window

    from ..functions.vectors import int_dot, int_norm, quantize_scale, quantize_vec

    def _codes(df: DataFrame, idc: str, vc: str, out_id: str) -> DataFrame:
        return (
            df.select(F.col(idc).alias(out_id), F.col(vc).alias("_v"))
            .withColumn("_s", quantize_scale("_v"))
            .withColumn("q", quantize_vec("_v", "_s"))
            .withColumn("qn", int_norm("q"))
            .drop("_v", "_s")
        )

    c = _codes(corpus, id_col, vec_col, "neighbor_id")
    q = (
        _codes(queries, query_id_col, query_vec_col, "query_id")
        .withColumnRenamed("q", "qq")
        .withColumnRenamed("qn", "qqn")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("qdot", int_dot("qq", "q"))
        .select(
            "query_id",
            "neighbor_id",
            "qdot",
            (F.col("qdot").cast("double") / (F.col("qqn") * F.col("qn"))).alias("qcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "qdot", "qcos")
    )


#: memoized IVF indexes: cache_key -> (model, assigned-cells DataFrame).
#: An IVF index is built once and queried many times — callers pass a
#: stable cache_key (e.g. the corpus path) to get that semantics.
_IVF_INDEX_CACHE: dict = {}


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    cache_key: str | None = None,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into KMeans cells, then for
    each query scan only the `n_probe` nearest cells (exact cosine +
    top-k inside).

    Scale shape: the corpus is scored once to assign cells (one narrow
    pass + model broadcast); per query only ~n_probe/n_clusters of the
    corpus is scanned, and candidate selection is an equi-join on the
    cell id. Centroids live in the (tiny, broadcast) model — there is
    no driver-side loop over data.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.window import Window

    full_key = cache_key and (cache_key, n_clusters, seed)
    if full_key and full_key in _IVF_INDEX_CACHE:
        model, c_cells = _IVF_INDEX_CACHE[full_key]
    else:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).withColumn("features", array_to_vector("v"))
        # random init + few iterations: cell QUALITY barely matters for
        # IVF recall (probing n_probe cells tolerates imperfect
        # centroids), while k-means|| init + 20 iterations dominated the
        # whole query's runtime. Train on a bounded sample.
        km = KMeans(
            k=n_clusters,
            seed=seed,
            maxIter=8,
            initMode="random",
            featuresCol="features",
            predictionCol="cell",
        )
        model = km.fit(c.select("features").limit(2048))
        c_cells = model.transform(c).select("neighbor_id", "v", "cell").persist()
        if full_key:
            _IVF_INDEX_CACHE[full_key] = (model, c_cells)

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("qv"),
    ).withColumn("features", array_to_vector("qv"))
    # distance of each query to every centroid -> n_probe nearest cells
    cents = [(i, list(map(float, cv))) for i, cv in enumerate(model.clusterCenters())]
    cents_df = q.sparkSession.createDataFrame(
        cents, "cell int, centroid array<double>"
    )
    qd = q.crossJoin(F.broadcast(cents_df)).select(
        "query_id",
        "qv",
        "cell",
        F.expr(
            "aggregate(zip_with(qv, centroid, (x, y) -> (x - y) * (x - y)), "
            "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
        ).alias("dist2"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("cell").asc())
    probes = (
        qd.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    scored = (
        c_cells.join(
            F.broadcast(probes),
            (c_cells["cell"] == probes["cell"])
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", cosine_expr("qv", "v").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_fixed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-style ANN with DETERMINISTIC cells: hyperplane-sign cells
    (2^n_planes of them) instead of KMeans centroids, probed in
    query-directed order — the query's own cell first, then the cells
    reached by flipping the planes the query sits CLOSEST to (smallest
    |v·r_p|: those are the planes most likely to have separated it from
    true neighbors — multi-probe LSH, Lv et al., VLDB'07).

    Same scale shape as `ivf_topk` (cell equi-join, ~n_probe/2^n_planes
    of the corpus scanned per query, exact cosine + top-k inside), but
    with zero training and a closed-form cell function — so the whole
    operator, probe selection included, is SQL-expressible and oracled
    end-to-end (plans/queries.py:ann_ivf_fixed_topk). KMeans `ivf_topk`
    remains the adaptive-cells production path."""
    from pyspark.sql.window import Window

    from ..functions.vectors import infer_dim, plane_dots

    dim = infer_dim(corpus, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("cell", hyperplane_bucket("v", n_planes, n_dims=dim))
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("m", plane_dots("qv", n_planes, n_dims=dim))
        .withColumn(
            "qcell",
            F.expr(
                f"aggregate(sequence(0, {n_planes - 1}), CAST(0 AS BIGINT), "
                f"(acc, p) -> acc + CASE WHEN m[p] > 0 "
                f"THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END)"
            ),
        )
    )
    own = q.select("query_id", "qv", F.col("qcell").alias("probe"))
    wq = Window.partitionBy("query_id").orderBy(
        F.abs(F.col("margin")).asc(), F.col("p").asc()
    )
    flips = (
        q.select("query_id", "qv", "qcell", F.posexplode("m").alias("p", "margin"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe - 1)
        .select(
            "query_id",
            "qv",
            F.expr("qcell ^ shiftleft(CAST(1 AS BIGINT), p)").alias("probe"),
        )
    )
    probes = own.unionByName(flips)
    scored = (
        c.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("probe"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", cosine_expr("qv", "v").alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    probe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's hyperplane
    bucket (or a bucket within `probe_bits` bit flips — multi-probe)
    are scored. Multi-probe is expressed as an EXPLODE of the query's
    probe buckets followed by an equi-join, so candidate generation
    stays a hash join — never a theta/nested-loop scan of the corpus."""
    from pyspark.sql.window import Window

    from ..functions.vectors import infer_dim

    dim = infer_dim(corpus, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", hyperplane_bucket("v", n_planes, n_dims=dim))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qbucket", hyperplane_bucket("qv", n_planes, n_dims=dim))
    if probe_bits >= 1:
        probes = "array(qbucket" + "".join(
            f", CAST(qbucket AS BIGINT) ^ shiftleft(CAST(1 AS BIGINT), {p})"
            for p in range(n_planes)
        ) + ")"
        q = q.withColumn("probe", F.explode(F.expr(probes)))
    else:
        q = q.withColumn("probe", F.col("qbucket"))
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("probe"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", cosine_expr("qv", "v").alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
