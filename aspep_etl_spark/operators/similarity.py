"""[EXT] Similarity search over embedding columns (SURVEY.md §2.11).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against a map-only scan of the corpus; exact, O(corpus × queries).

Scale path: IVF-style partitioned search — KMeans coarse centroids, corpus
bucketed by nearest centroid (shuffle once, reusable), queries probe only
the ``n_probe`` nearest buckets.  At 100 TB the bucketed corpus is the
stored layout and each query touches a few percent of it.

Dot products run as JVM array expressions (`zip_with`+`aggregate`) in
double precision — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" 0D, (acc, v) -> acc + v)"
    )


def with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Project (id, vec, norm) with the L2 norm precomputed once."""
    return df.select(
        F.col(id_col),
        F.col(vec_col).alias("vec"),
        F.sqrt(
            F.expr(
                f"aggregate(transform({vec_col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
                f" 0D, (acc, v) -> acc + v)"
            )
        ).alias("norm"),
    )


def cosine_expr(vec_a: str, vec_b: str, norm_a: str, norm_b: str) -> Column:
    return F.when(
        (F.col(norm_a) > 0) & (F.col(norm_b) > 0),
        _dot(vec_a, vec_b) / (F.col(norm_a) * F.col(norm_b)),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, scan the corpus once,
    rank per query.  Ties break on neighbor id for determinism; self-matches
    are excluded.  Output: (query_id, neighbor_id, cosine, knn_rank)."""
    c = with_norm(corpus, id_col, vec_col).withColumnsRenamed(
        {id_col: "neighbor_id", "vec": "vec_n", "norm": "norm_n"}
    )
    q = with_norm(queries, id_col, vec_col).withColumnsRenamed(
        {id_col: "query_id", "vec": "vec_q", "norm": "norm_q"}
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr("vec_q", "vec_n", "norm_q", "norm_n"), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "knn_rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    1. KMeans (seeded) learns ``n_centroids`` coarse centroids.
    2. Corpus rows are assigned to their nearest centroid (stored layout —
       at scale, write the corpus ``partitionBy("ivf_bucket")``).
    3. Each query probes its ``n_probe`` nearest centroids and ranks only
       those buckets' vectors.

    Approximate: recall < 1 when a true neighbor lives outside the probed
    buckets — the standard IVF trade.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_corpus = corpus.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(ml_corpus)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(centers, ["bucket", "centroid"])

    def nearest_buckets(df: DataFrame, vec: str, id_out: str, n: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cent_df)).withColumn(
            "dist",
            F.expr(
                f"aggregate(zip_with({vec}, centroid, (x, y) -> "
                f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0D, (a, v) -> a + v)"
            ),
        )
        w = Window.partitionBy(id_out).orderBy(F.asc("dist"), F.asc("bucket"))
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n)
            .select(id_out, "bucket")
        )

    corpus_b = corpus.join(
        nearest_buckets(corpus.select(id_col, vec_col), vec_col, id_col, 1), id_col
    )
    q_b = queries.join(
        nearest_buckets(queries.select(id_col, vec_col), vec_col, id_col, n_probe), id_col
    )

    c = (
        with_norm(corpus_b, id_col, vec_col)
        .join(corpus_b.select(id_col, "bucket"), id_col)
        .withColumnsRenamed({id_col: "neighbor_id", "vec": "vec_n", "norm": "norm_n"})
    )
    # Each query row fans out to its n_probe buckets; each corpus row lives
    # in exactly one bucket, so (query, neighbor) pairs stay unique.
    q = (
        with_norm(q_b.dropDuplicates([id_col]), id_col, vec_col)
        .join(q_b.select(id_col, "bucket"), id_col)
        .withColumnsRenamed({id_col: "query_id", "vec": "vec_q", "norm": "norm_q"})
    )

    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr("vec_q", "vec_n", "norm_q", "norm_n"), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "knn_rank")
    )
