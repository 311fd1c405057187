"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force cosine top-k — the correctness baseline. The dot
  product is a codegen zip_with/aggregate expression (JVM-side, no Python);
  the scan is embarrassingly parallel and the only shuffle is the final
  top-k (TakeOrderedAndProject).
- lsh_buckets / ann_topk_lsh: the scale path — random-hyperplane LSH. Plane
  vectors are deterministic (Philox seed, rounded literals) so the bucketing
  is reproducible across engines and runs; the query only scans its own
  bucket, turning top-k from O(N) into O(N / 2^planes) per probe.
- embedding_neardup_pairs: near-duplicate detection by cosine >= threshold,
  LSH-bucket-blocked so the self-join never goes all-pairs.

Scores are rounded to 6 dp so results are stable across engines' float
summation orders.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

N_PLANES = 8
PLANE_SEED = 1234
DIM = 64


def lsh_planes(dim: int = DIM, n_planes: int = N_PLANES, seed: int = PLANE_SEED) -> list[list[float]]:
    """Deterministic hyperplanes, rounded to 3 dp so they can be embedded as
    SQL literals identically in any engine."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return [
        [round(float(x), 3) for x in rng.standard_normal(dim)]
        for _ in range(n_planes)
    ]


def _dot_expr(vec_col: str, lit_vec: list[float]) -> str:
    arr = "array(" + ",".join(f"cast({v} as double)" for v in lit_vec) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {arr}, (a, b) -> cast(a as double) * b), "
        f"0D, (acc, x) -> acc + x)"
    )


def _norm_expr(vec_col: str) -> str:
    return (
        f"sqrt(aggregate({vec_col}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    )


def _cosine_expr(a: str, b: str) -> str:
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"
    return f"{dot} / ({_norm_expr(a)} * {_norm_expr(b)})"


def bucket_expr(vec_col: str, planes: list[list[float]]) -> str:
    """LSH bucket id: bit i = 1 iff dot(plane_i, vec) > 0."""
    bits = " + ".join(
        f"(CASE WHEN {_dot_expr(vec_col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"({bits})"


def bucket_of(vec: list[float], planes: list[list[float]]) -> int:
    b = 0
    for i, p in enumerate(planes):
        if float(np.dot(np.asarray(vec, dtype=np.float64), np.asarray(p))) > 0:
            b |= 1 << i
    return b


def cosine_topk(
    emb: DataFrame, query_vecs: DataFrame, k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k per query vector.

    query_vecs: (query_id, embedding) — broadcast (queries are few); result:
    (query_id, vec_id, score, rank), rank 1..k by (score desc, vec_id asc),
    self-match excluded when ids collide.
    """
    q = query_vecs.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(F.expr(_cosine_expr("embedding", "q_emb")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def with_buckets(emb: DataFrame, planes: list[list[float]] | None = None) -> DataFrame:
    planes = planes or lsh_planes()
    return emb.withColumn("bucket", F.expr(bucket_expr("embedding", planes)))


def ann_topk_lsh(
    emb: DataFrame, query_vecs: DataFrame, k: int = 10,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """LSH-bucketed ANN: each query scans only its own hyperplane bucket.

    Approximate by construction (recall < 1 vs cosine_topk); at 10^12 vectors
    the bucketed scan is what makes per-query latency independent of corpus
    size. Same output shape as cosine_topk.
    """
    planes = planes or lsh_planes()
    b_emb = with_buckets(emb, planes)
    q = with_buckets(
        query_vecs.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        ).withColumnRenamed("q_emb", "embedding"),
        planes,
    ).withColumnRenamed("embedding", "q_emb")
    joined = b_emb.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(F.expr(_cosine_expr("embedding", "q_emb")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.95,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """(vec_a, vec_b, score): pairs with cosine >= threshold, blocked by LSH
    bucket (near-identical vectors land in the same bucket with high prob)."""
    planes = planes or lsh_planes()
    b = with_buckets(emb, planes)
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, "bucket")
        .filter(F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(
                F.expr(_cosine_expr("l.embedding", "r.embedding")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
