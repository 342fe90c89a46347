"""Similarity search over the ``embeddings`` table (array<float>).

Two paths, per the standard ANN playbook:

* **Brute-force cosine top-k** — the exact baseline.  Dot products are
  computed JVM-side with ``zip_with``/``aggregate`` (no Python UDFs);
  the query set is broadcast, so the cost is |queries| x |corpus| with
  the corpus fully partition-parallel.  Right answer for small query
  sets or as the verify stage.
* **LSH-bucketed top-k** — the scale path: sign-random-projection
  buckets (hyperplanes derived deterministically from md5 so the
  oracle reproduces them) shrink the candidate set to same-bucket
  docs before exact scoring.  At 100 TB the bucket join replaces the
  full cross product; recall is traded via the number of planes.

Determinism: dot products accumulate in index order on both engines
(``aggregate`` lambda here, ``list_sum(list_transform(...))`` in
DuckDB), so cosines match bit-for-bit before the final ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: number of sign-projection hyperplanes (bucket bits) for the LSH path.
N_PLANES = 8


def _dot(a: str, b: str) -> F.Column:
    """Index-ordered double-precision dot product of two float arrays."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def cosine_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the query set ``vec_id < n_queries``.

    Ranking uses the ROUNDed cosine plus a vec_id tie-break so the
    selected set is deterministic and engine-independent.
    """
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    cos = F.round(
        _dot("q_emb", "embedding")
        / (F.sqrt(_dot("q_emb", "q_emb")) * F.sqrt(_dot("embedding", "embedding"))),
        6,
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def _bucket_expr(emb_col: str) -> F.Column:
    """Sign-random-projection bucket id (N_PLANES bits).

    Plane p's component for dimension i is +/-1 decided by one md5
    nibble of 'p|i' — deterministic, identical on both engines, and
    cheap to fold constant.  The projection accumulates in index order.
    """
    proj = (
        f"aggregate(zip_with({emb_col}, sequence(0, size({emb_col}) - 1),"
        f" (x, i) -> CAST(x AS DOUBLE) * CASE WHEN"
        f" (instr('0123456789abcdef', substring(md5(concat('{{p}}', '|', i)), 1, 1)) - 1) % 2 = 0"
        f" THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    bits = [
        f"(CASE WHEN {proj.replace('{p}', str(p))} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    ]
    return F.expr(" + ".join(bits)).cast("int")


def lsh_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Approximate top-k: exact cosine restricted to same-LSH-bucket
    candidates.  Returns <= k neighbors per query (fewer when the
    bucket is small — that's the ANN recall trade)."""
    with_bucket = emb.withColumn("bucket", _bucket_expr("embedding"))
    q = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = with_bucket.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = F.round(
        _dot("q_emb", "embedding")
        / (F.sqrt(_dot("q_emb", "q_emb")) * F.sqrt(_dot("embedding", "embedding"))),
        6,
    )
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
