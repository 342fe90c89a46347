"""Frequency-sketch operators: Misra-Gries heavy-key detection.

The driver question at 100 TB is "which join/agg keys are hot enough
to need the salted path (operators/skew.py)?" — answering it with a
full ``groupBy(key).count()`` costs a corpus-wide shuffle keyed by the
very column that is skewed.  The classic streaming answer is the
Misra-Gries summary (Misra & Gries 1982; merge rule from Agarwal et
al., "Mergeable Summaries", PODS 2012): each partition keeps at most
``capacity`` counters over its local stream, merged summaries keep the
deterministic guarantee

    every key with true global count > N / (capacity + 1)
    survives in the union of the per-partition summaries.

So the sketch pass emits a BOUNDED candidate set (<= capacity rows per
partition, no shuffle at all — the one mapInPandas stage in this repo
that is genuinely stateful-per-partition), and a second pass counts
ONLY the candidates exactly: the corpus-side shuffle carries at most
``(capacity x partitions) + 1`` distinct keys after map-side combine,
however skewed the stream.  Because every key reported must clear a
support threshold no finer than the sketch guarantee
(``support_k <= capacity + 1``), the final output is EXACT — identical
to the full groupBy — which is what lets the registered query pair
with a plain SQL oracle despite the approximate intermediate.

This is the candidate/verify split the dedup family uses (LSH bands →
exact Jaccard), applied to frequency estimation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Per-partition Misra-Gries counter budget.  63 counters guarantee
#: recall of every key above N/64 of the stream.
MG_CAPACITY = 63

#: Reported heavy keys must hold > 1/support_k of the stream
#: (support_k=32 -> keys above ~3.1%).  Must stay <= capacity + 1 or
#: the sketch could miss a qualifying key and the result would no
#: longer be exact.
HH_SUPPORT_K = 32


def misra_gries_candidates(
    keys: DataFrame, key: str, capacity: int = MG_CAPACITY
) -> DataFrame:
    """Per-partition Misra-Gries summaries over ``keys[key]``; returns
    the union of surviving candidate keys (at most ``capacity`` rows
    per input partition), superset of every key with global count
    > N/(capacity+1).

    Each Arrow batch is folded in vectorized (``value_counts``), then
    the summary is re-compressed with the mergeable-summaries rule:
    subtract the (capacity+1)-th largest weight from every counter and
    drop the non-positive ones — at most ``capacity`` survive with the
    summed error bound intact.  Zero shuffle: the sketch is the rare
    case where per-partition imperative state is the POINT, so
    ``mapInPandas`` (Arrow-batched, not row-at-a-time) is the right
    boundary.
    """
    out_schema = StructType([keys.schema[key]])

    def _mg(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for t, c in pdf[key].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > capacity:
                kth = sorted(counters.values(), reverse=True)[capacity]
                counters = {t: c - kth for t, c in counters.items() if c > kth}
        yield pd.DataFrame({key: list(counters)})

    return keys.mapInPandas(_mg, schema=out_schema)


def heavy_keys(
    df: DataFrame,
    key: str,
    support_k: int = HH_SUPPORT_K,
    capacity: int = MG_CAPACITY,
) -> DataFrame:
    """EXACT heavy-key detection via sketch-pruned counting: every key
    holding strictly more than ``1/support_k`` of the rows, with its
    exact count and 1e4 fixed-point share.  Output
    ``(key, cnt, share_q)`` — identical to the full
    ``groupBy(key).count()`` filtered the same way, but the corpus is
    never shuffled by the skewed key.

    Two passes: (1) the Misra-Gries candidate sketch (no shuffle);
    (2) one scan that maps every non-candidate row to a single NULL
    bucket before the count — the shuffle therefore carries at most
    ``capacity x partitions + 1`` groups after partial combine, so the
    hot key costs the same as any other.  The stream total is the SUM
    over that tiny counted relation (single-partition window over
    <= a few thousand rows), not a third corpus scan.
    """
    if support_k > capacity + 1:
        raise ValueError(
            f"support_k={support_k} finer than the sketch guarantee "
            f"1/(capacity+1)=1/{capacity + 1}; result would not be exact"
        )
    keys = df.select(key)
    cands = misra_gries_candidates(keys, key, capacity).distinct()
    flagged = keys.join(
        F.broadcast(cands.withColumn("_cand", F.lit(True))), key, "left"
    )
    g = flagged.groupBy(
        F.when(F.col("_cand"), F.col(key)).alias(key)
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(F.lit(1))
    return (
        g.withColumn("total", F.sum("cnt").over(w))
        .filter(F.col(key).isNotNull() & (F.col("cnt") * support_k > F.col("total")))
        .select(key, "cnt", F.expr("(cnt * 10000) div total").alias("share_q"))
    )
