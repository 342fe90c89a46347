"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in sources.session); these operators are the explicit
formulations for when the skew is known ahead of time or AQE can't see
it (e.g. a skewed aggregation key, or a broadcast-ineligible join
against a dimension with one hot key).

Correctness notes: the salt only controls physical distribution —
results are identical for any salt assignment.  Exactness under
re-aggregation holds for decomposable aggregates; money stays DECIMAL
through both phases so the two-phase sum is bit-identical to the
one-phase sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def _row_salt(n_salts: int) -> Column:
    """Deterministic-enough per-row salt in [0, n_salts).

    monotonically_increasing_id varies within every partition, which is
    exactly what's needed: rows of the same hot key spread across
    salts.  (Any assignment is correct; this one avoids a rand() seed.)
    """
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase aggregation through a salted key.

    Phase 1 aggregates on (keys + salt) — a hot key's rows land in
    n_salts different reducers; phase 2 re-aggregates the per-salt
    partials on the true keys (n_salts rows per key, trivially cheap).

    ``aggs`` maps output column name -> phase-1 aggregate expression;
    phase 2 re-combines with SUM, so pass decomposable aggregates
    (sum/count as sums).
    """
    if "__salt" in df.columns:  # internal name must not clobber caller data
        raise ValueError("salted_agg: df already has a __salt column")
    salted = df.withColumn("__salt", _row_salt(n_salts))
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return p1.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side per row, replicate the
    small side across all salts, join on (key, salt).

    The hot key's rows split across n_salts tasks at the cost of
    n_salts x |small| replication — the standard trade when the small
    side is modest but above the broadcast threshold.

    Only inner/left/semi/anti are supported: the small side is
    replicated across all salts, so right/full outer would emit
    n_salts rows for every unmatched small-side key.
    """
    safe = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
            "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — small-side replication "
            "duplicates unmatched small-side rows under right/full outer joins"
        )
    if "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError("salted_join: inputs already have a __salt column")
    big_s = big.withColumn("__salt", _row_salt(n_salts))
    small_r = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    out = big_s.join(small_r, on=[key, "__salt"], how=how)
    return out.drop("__salt")
