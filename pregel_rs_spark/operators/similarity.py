"""Similarity search over an embedding column (``array<float>``).

Two paths per the pipeline requirements:
  * brute-force cosine top-k — the exact baseline; a blocked cross join
    (queries × corpus) with a window top-k.  Fine for ≤10^5 corpus per
    executor-memory unit; at 100 TB this is the re-rank stage only.
  * LSH-bucketed ANN — random-hyperplane signs as the coarse bucket,
    multi-probe within bucket, exact cosine re-rank inside.  The scale path:
    the corpus is bucketed ONCE (write-time), queries only join their probe
    buckets — candidate set shrinks by ~2^n_planes.

The hyperplanes are deterministic pseudo-random values derived from
``sin(dim * p1 + plane * p2)`` — reproducible across runs/engines without a
stored model artifact (good enough as a coarse partitioner; quality-critical
deployments plug in trained centroids via the same bucket-column contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pregel_rs_spark.operators.dedup import cosine_expr


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself).  ``queries`` has (vec_id, embedding).
    Returns ``(query_id, neighbor_id, cosine, rank)``.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qe"), F.col("ce")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane_bucket(vec, n_planes: int, dim: int):
    """Sign-bit bucket id from n_planes deterministic hyperplanes.

    plane p, dim d weight = sin(d * 12.9898 + p * 78.233) — the classic
    deterministic pseudo-random generator; no stored model needed.
    """
    bits = []
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda d: F.sin(d * 12.9898 + F.lit(p * 78.233)),
                ),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: random-hyperplane LSH bucket join + exact re-rank.

    Recall < 1.0 by construction (single-probe); tests check recall vs
    :func:`brute_force_topk` on the fixture corpus.  At scale the corpus
    side is bucketed once and persisted/bucketed-by on write.
    """
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _hyperplane_bucket(F.col("embedding"), n_planes, dim).alias("bucket"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _hyperplane_bucket(F.col("embedding"), n_planes, dim).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qe"), F.col("ce")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
