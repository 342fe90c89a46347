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


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (md5-derived, cross-engine exact).
# ---------------------------------------------------------------------------

#: register-index bits / register count for the HLL sketch.  m=256
#: gives the standard ~1.04/sqrt(m) = 6.5% relative error at a fixed
#: 256-row-per-group sketch state.
HLL_P = 8
HLL_M = 1 << HLL_P

#: usable hash bits after the register index: the 60-bit md5 prefix
#: minus HLL_P index bits.
HLL_W_BITS = 60 - HLL_P

#: alpha_m * m^2 * 2^53 for m=256 (Flajolet et al. 2007's bias
#: constant, pre-multiplied so the final estimate is one double
#: division by the EXACT bigint register sum).  Inlined as the same
#: literal in the Spark plan and the DuckDB oracle, so both engines
#: parse the identical double.
HLL_ALPHA_NUM = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * float(1 << 53)

#: small-range correction threshold: below 2.5*m the raw estimator is
#: dominated by its ~alpha*m floor and LinearCounting is used instead.
HLL_LC_THRESHOLD = 2.5 * HLL_M


def _hll_lc_table() -> list[int]:
    """LinearCounting estimates round(m * ln(m / V)) for every possible
    empty-register count V in 1..m, PRECOMPUTED in Python and inlined
    as the same integer literal list in the Spark plan and the DuckDB
    oracle.  ln() is the one transcendental in HLL; libm results are
    not guaranteed bit-equal across engines, so neither engine ever
    evaluates it — V (an exact integer) just indexes this shared
    256-entry table, keeping the whole estimator under the exact hash
    gate."""
    import math

    return [round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)]


def hll_distinct(df: DataFrame, key: str, group: str) -> DataFrame:
    """Per-``group`` HyperLogLog distinct-count estimate of ``key`` —
    the mergeable-sketch answer to COUNT(DISTINCT) when the distinct
    set itself is too large to shuffle: sketch state is a FIXED 256
    registers per group however many distinct keys stream by, so the
    shuffle carries <= groups x 256 rows after map-side partial
    ``max`` combine (vs. COUNT(DISTINCT)'s one row PER DISTINCT KEY —
    the difference between megabytes and the corpus's whole key
    column at 100 TB).

    Construction (deterministic, engine-portable — no float until the
    final division): h = first 15 md5 hex chars of ``'hll|' || key``
    as a 60-bit integer; register j = h mod 256; rho = trailing-zero
    rank of the remaining 52 bits (``length(bin(w & -w))``, 53 when
    they are all zero); register value M[j] = max rho.  The harmonic
    sum uses the 2^53 rescale sum(2^(53 - M)) so every term and the
    per-group sum stay EXACT int64 (a double->decimal cast of 2^64
    rounds in Spark), empty registers contributing 2^53 each.  The
    one float step is the final alpha*m^2*2^53 / S division — single
    IEEE op on identical inputs, bit-equal on both engines.

    Returns ``(group, hll_est)``.  Small-range correction per the
    original algorithm: when the raw estimate is under 2.5*m and some
    registers are empty, LinearCounting m*ln(m/V) is used — served
    from the precomputed integer table (:func:`_hll_lc_table`) so no
    engine evaluates ln() and the corrected estimate stays under the
    exact hash gate.  The registered queries report the measured
    error against the exact count as the audit.

    Reference sketch semantics: Flajolet, Fusy, Gandouet, Meunier,
    "HyperLogLog: the analysis of a near-optimal cardinality
    estimation algorithm" (AofA 2007); mergeability per Agarwal et
    al., PODS 2012 (max is the register merge).
    """
    return hll_estimate(hll_registers(df, key, group), group)


def _hll_rho_rows(df: DataFrame, key: str, group: str) -> DataFrame:
    """Pre-aggregation HLL rows ``(group, j, rho)`` — the shared hash /
    register-index / rank derivation of :func:`hll_registers` and the
    single-pass pivot in :func:`hll_overlap`."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), F.col(key).cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    # COUNT(DISTINCT) semantics: NULL keys are not counted.  Unfiltered,
    # md5(concat(.., NULL)) is NULL, yielding a (group, NULL, NULL)
    # register row that hll_estimate's F.count counts but whose m_j the
    # F.sum skips — biasing both the harmonic sum and the empty-register
    # count (r10 review).
    df = df.filter(F.col(key).isNotNull())
    rows = df.select(
        F.col(group),
        F.pmod(h, F.lit(HLL_M)).alias("j"),
        h.alias("_h"),
    ).select(group, "j", F.expr(f"_h DIV {HLL_M}").alias("w"))
    return rows.select(
        group,
        "j",
        F.when(F.col("w") == 0, F.lit(HLL_W_BITS + 1))
        .otherwise(F.length(F.expr("bin(w & -w)")))
        .alias("rho"),
    )


def hll_registers(df: DataFrame, key: str, group: str) -> DataFrame:
    """The (group, j, m_j) register relation of :func:`hll_distinct` —
    exposed separately because registers are the MERGEABLE sketch
    state: element-wise ``max`` of two register sets is the sketch of
    the union of their streams, which is what lets pre-aggregated
    per-partition/per-day sketches roll up without raw data."""
    return (
        _hll_rho_rows(df, key, group)
        .groupBy(group, "j")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(regs: DataFrame, group: str) -> DataFrame:
    """Finish a (group, j, m_j) register relation into (group,
    hll_est) — exact int64 harmonic sum, one double division,
    table-served LinearCounting (see :func:`hll_distinct`)."""
    lc = ",".join(str(v) for v in _hll_lc_table())
    return (
        regs.groupBy(group)
        .agg(
            (
                F.sum(F.expr("shiftleft(1L, 53 - m_j)"))
                + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1 << 53)
            ).alias("s"),
            (F.lit(HLL_M) - F.count(F.lit(1))).alias("v"),
        )
        .select(
            group,
            (F.lit(HLL_ALPHA_NUM) / F.col("s").cast("double")).alias("raw"),
            "v",
        )
        .select(
            group,
            F.when(
                (F.col("raw") <= F.lit(HLL_LC_THRESHOLD)) & (F.col("v") > 0),
                F.expr(f"element_at(array({lc}), CAST(v AS INT))").cast("bigint"),
            )
            .otherwise(F.round(F.col("raw")).cast("bigint"))
            .alias("hll_est"),
        )
    )


def hll_overlap(
    df: DataFrame, key: str, group: str, a: str, b: str
) -> DataFrame:
    """Distinct-key overlap between two groups via HLL REGISTER
    ALGEBRA: |A ∩ B| estimated as est(A) + est(B) - est(A ∪ B), where
    the union sketch is the element-wise ``max`` merge of A's and B's
    register sets — ONE pass over the data builds both sketches, the
    defining mergeable-summary move (a COUNT(DISTINCT) intersection
    would re-shuffle both groups' raw keys; the merge touches 2 x 256
    register rows).  Returns one row
    (est_a, est_b, est_union, est_inter) with est_inter floored at 0
    (inclusion-exclusion over estimates can go negative on tiny
    overlaps)."""
    # Single-pass pivot (r12 optimization): the previous composition
    # filtered the register relation per group and full-outer-joined it
    # with itself, so ONE logical stream was scanned and aggregated 4x
    # (est_a, est_b, and both union sides) and three 1-row relations
    # were re-attached by scalar-anchor crossJoins.  Pivoting the
    # register max per group into one (j, m_a, m_b) row and finishing
    # all three estimates inside ONE global aggregate computes the
    # identical register sets and identical estimate arithmetic — same
    # max per (group, j), same exact-int64 harmonic sums, same
    # table-served LinearCounting — from a single scan, one register
    # exchange and one 1-row exchange, no joins at all.  An empty group
    # falls out naturally: zero pivot rows give v = m and the LC table
    # serves round(m*ln(m/m)) = 0, exactly the zero row the old
    # union-a-literal guard produced.
    rows = _hll_rho_rows(
        df.filter(F.col(group).isin(a, b)).select(group, key), key, group
    )
    piv = (
        rows.groupBy("j")
        .agg(
            F.max(F.when(F.col(group) == a, F.col("rho"))).alias("m_a"),
            F.max(F.when(F.col(group) == b, F.col("rho"))).alias("m_b"),
        )
        .withColumn(
            "m_u",
            F.greatest(F.coalesce("m_a", F.lit(0)), F.coalesce("m_b", F.lit(0))),
        )
    )

    def _sp(col: str) -> F.Column:
        # partial harmonic sum over the registers the side actually hit
        return F.coalesce(
            F.sum(F.expr(f"shiftleft(1L, 53 - {col})")), F.lit(0).cast("bigint")
        ).alias(f"sp_{col[2:]}")

    one = piv.agg(
        _sp("m_a"),
        F.count("m_a").alias("n_a"),
        _sp("m_b"),
        F.count("m_b").alias("n_b"),
        _sp("m_u"),
        F.count("m_u").alias("n_u"),
    )
    lc = F.array(*[F.lit(v) for v in _hll_lc_table()])

    def _est(side: str) -> F.Column:
        # s = present-register sum + 2^53 per empty register; v = empties
        v = F.lit(HLL_M) - F.col(f"n_{side}")
        s = F.col(f"sp_{side}") + v.cast("bigint") * F.lit(1 << 53)
        raw = F.lit(HLL_ALPHA_NUM) / s.cast("double")
        return (
            F.when(
                (raw <= F.lit(HLL_LC_THRESHOLD)) & (v > 0),
                F.element_at(lc, v.cast("int")).cast("bigint"),
            )
            .otherwise(F.round(raw).cast("bigint"))
            .alias(f"est_{side}" if side != "u" else "est_union")
        )

    return one.select(_est("a"), _est("b"), _est("u")).select(
        "est_a",
        "est_b",
        "est_union",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        ).alias("est_inter"),
    )


# ---------------------------------------------------------------------------
# Exact quantiles from a value histogram (bounded-domain percentiles)
# ---------------------------------------------------------------------------

def histogram_quantiles(
    df: DataFrame,
    col: str,
    group: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT per-``group`` interpolated quantiles of integer column
    ``col`` computed from its VALUE HISTOGRAM — the scalable shape for
    bounded-domain measures (token counts, chunk sizes, byte lengths):
    Spark's ``percentile`` buffers every group value in executor
    memory, which at 100 TB is the corpus re-materialized; here the
    first aggregation collapses the corpus to <= groups x |domain|
    histogram rows (map-side combined), the cumulative window runs
    over that bounded relation, and one conditional aggregate reads
    off each quantile's bracketing ranks.  Nothing downstream of the
    first hash-agg scales with row count.

    Semantics are SQL-standard continuous quantiles (DuckDB
    ``quantile_cont`` / Spark ``percentile``): rank h = (n-1)*p, value
    = v_lo + (v_hi - v_lo) * frac — reproduced explicitly from the
    histogram so the plan never needs the per-group sorted buffer.
    Results ROUND to 4 dp (the lerp is two IEEE ops; engines may
    differ in op order at the last ulp).

    Returns (group, n_rows, min_<col>, max_<col>, p<..> per requested
    quantile).
    """
    # percentile/quantile_cont ignore NULLs; unfiltered they would be
    # counted in `total` AND sort first in the cumulative window
    # (NULLS FIRST), shifting every target rank while the bracket
    # lookups skip them — a group with enough NULLs reported its
    # minimum as the median (r10 review).
    df = df.filter(F.col(col).isNotNull())
    hist = df.groupBy(group, col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(group).orderBy(col)
    wall = Window.partitionBy(group)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("total", F.sum("cnt").over(wall))
    )
    aggs = [
        F.sum("cnt").alias("n_rows"),
        F.min(col).alias(f"min_{col}"),
        F.max(col).alias(f"max_{col}"),
    ]
    outs = [group, "n_rows", f"min_{col}", f"max_{col}"]
    for p in ps:
        tag = f"p{int(round(p * 100))}"
        # 0-based target rank h and its bracketing integer ranks.  A
        # histogram row covers ranks [cum-cnt, cum-1]; the value at
        # rank r is therefore MIN(col) over rows with cum >= r+1.
        h = (F.col("total") - 1) * F.lit(p)
        lo, hi = F.floor(h), F.least(F.floor(h) + 1, F.col("total") - 1)
        aggs.append(
            F.min(F.when(F.col("cum") >= lo + 1, F.col(col))).alias(f"_lo_{tag}")
        )
        aggs.append(
            F.min(F.when(F.col("cum") >= hi + 1, F.col(col))).alias(f"_hi_{tag}")
        )
        aggs.append(F.max(h - F.floor(h)).alias(f"_fr_{tag}"))
        outs.append(
            F.round(
                F.col(f"_lo_{tag}")
                + (F.col(f"_hi_{tag}") - F.col(f"_lo_{tag}")) * F.col(f"_fr_{tag}"),
                4,
            ).alias(tag)
        )
    return cum.groupBy(group).agg(*aggs).select(*outs)


# ---------------------------------------------------------------------------
# Count-min sketch (md5-derived, cross-engine exact, integer-only)
# ---------------------------------------------------------------------------

#: depth (independent hash rows) of the count-min sketch.  Error
#: probability of exceeding the width bound decays as 2^-depth
#: (Cormode & Muthukrishnan 2005, eps = e/width at confidence
#: 1 - e^-depth).
CMS_D = 4

#: width (counters per hash row).  Fixed sketch state is depth x width
#: = 4096 int64 counters however many keys stream by; expected
#: overestimate on a probe is ~N/width per colliding row, and the min
#: over depth rows takes the least-collided one.
CMS_W = 1024


def _cms_bucket(key_col, d: int):
    """Hash row ``d``'s bucket for ``key_col``: first 15 md5 hex chars
    of ``'cms<d>|' || key`` as a 60-bit integer, mod CMS_W.  The
    per-row salt prefix makes the depth rows independent hash
    functions; everything is exact integer arithmetic so the DuckDB
    oracle replicates each counter bit-for-bit (the md5/conv idiom of
    :func:`hll_registers`)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"cms{d}|"), key_col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(CMS_W))


def cms_registers(df: DataFrame, key: str) -> DataFrame:
    """The ``(d, bucket, cnt)`` counter relation of a count-min sketch
    over ``df[key]`` — the mergeable frequency-sketch state
    (element-wise ``sum`` of two register sets is the sketch of the
    concatenated streams, per Agarwal et al., PODS 2012).

    Plan: each input row expands to ``CMS_D`` (d, bucket) pairs via a
    single generator, and the hash aggregate that follows map-side
    combines each task down to <= depth x width = 4096 rows before the
    exchange — the shuffle carries a FIXED number of distinct keys
    however skewed or large the stream (contrast a groupBy(key).count()
    whose shuffle is keyed by the very column being measured).  This is
    the frequency-estimation sibling of :func:`hll_registers`: HLL
    answers "how many distinct", the CMS answers "how often is this
    one", both from bounded mergeable state.
    """
    # NULL keys hash to NULL buckets — unreachable by any probe's
    # equi-join, so their counts would silently vanish from lookups
    # while inflating the register relation (r10 review).  The sketch
    # counts NON-NULL keys, like COUNT/GROUP BY; cms_lookup documents
    # that a NULL probe reads 0 accordingly.
    pairs = df.filter(F.col(key).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(F.col(key), d).alias("bucket"),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("p")
    ).select("p.d", "p.bucket")
    return pairs.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_lookup(regs: DataFrame, probes: DataFrame, key: str) -> DataFrame:
    """Point-estimate each ``probes[key]`` against a
    :func:`cms_registers` relation: recompute the probe's depth
    buckets, join the (bounded, broadcast) register relation, and take
    the MIN counter over the depth rows — the count-min estimate,
    which can only OVERestimate (every counter the key touches holds
    its true count plus nonnegative collision mass).  Probe keys the
    stream never saw read whatever collision mass sits in their
    buckets (coalesced to 0 only when a bucket row is absent
    entirely).

    The register side is broadcast — it is <= 4096 rows by
    construction, so the probe lookup is shuffle-free regardless of
    corpus size.  Extra probe columns ride through unchanged.  A NULL
    probe key reads 0: the sketch counts non-NULL keys only
    (cms_registers filters them), so 0 IS that key's true count in the
    sketched population — the never-underestimate guarantee is stated
    relative to the counted stream.
    """
    pb = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(F.col(key), d).alias("bucket"),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("*", "p.d", "p.bucket").drop("p")
    other = [c for c in probes.columns if c != key]
    return (
        pb.join(F.broadcast(regs), ["d", "bucket"], "left")
        .groupBy(key, *other)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (md5-derived, cross-engine exact) — shuffle-avoiding
# semi-join pruning
# ---------------------------------------------------------------------------

#: independent hash functions per key.  False-positive rate at load
#: factor f (fraction of bits set) is ~f^BLOOM_K.
BLOOM_K = 3

#: filter width in bits = 256 words of 32 used bits each (bit 31 max,
#: so the int64 masks never touch the sign bit — DuckDB's signed <<
#: refuses 1 << 63, and portability is the whole point).  Size
#: proportionally to the
#: build-side key count in production (~10 bits/key for ~1% FP at
#: k=3); the registered query keeps a fixed width and AUDITS the
#: resulting FP count instead.
BLOOM_BITS = 8192


def _bloom_pos_sql(col: str, i: int) -> str:
    """Hash ``i``'s bit position for column ``col`` as a SQL fragment
    — the md5/conv idiom of :func:`_cms_bucket` with a per-hash salt.
    A string (not a Column) so the probe can embed it inside a single
    filter expression."""
    return (
        f"pmod(CAST(conv(substring(md5(concat('bloom{i}|',"
        f" CAST({col} AS STRING))), 1, 15), 16, 10) AS BIGINT),"
        f" {BLOOM_BITS})"
    )


def _bloom_pos(key_col_name: str, i: int):
    return F.expr(_bloom_pos_sql(key_col_name, i))


def bloom_build(keys: DataFrame, key: str) -> DataFrame:
    """Build the (word, bits) relation of a Bloom filter over
    ``keys[key]``: each key sets BLOOM_K bits; bit p lives in word
    ``p DIV 32`` at offset ``p % 32``.  The aggregate map-side
    OR-combines each task to <= 256 rows, so the filter relation is
    FIXED-SIZE and broadcastable whatever the build-side cardinality
    (the classic runtime-filter build Spark's own AQE bloom pushdown
    performs JVM-internally — reproduced here portably so the DuckDB
    oracle can verify membership bit-for-bit)."""
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_pos(key, i) for i in range(BLOOM_K)])
        ).alias("p")
    )
    return (
        pos.select(
            F.expr("p DIV 32").alias("word"),
            F.expr("shiftleft(1L, CAST(p % 32 AS INT))").alias("m"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )


def bloom_prune(fact: DataFrame, key: str, words: DataFrame) -> DataFrame:
    """Rows of ``fact`` whose ``key`` PASSES the Bloom filter — a
    superset of the true semi-join result (no false negatives; false
    positives at the filter's load-factor rate; NULL keys never pass,
    matching semi-join semantics).

    The word relation (<= 256 rows BY CONSTRUCTION — the same
    O(1)-relation class as the ANALYZE scalar memos, never data-sized)
    folds into ONE map row that broadcasts to the tasks: the probe is
    then a codegen'd Filter over the fact scan with no shuffles, and
    the whole plan stays LAZY — the r10 review caught the previous
    literal-inlining shape running ``words.collect()`` at DataFrame
    CONSTRUCTION time, which made Engine.query/explain (documented
    plan-only) silently execute the build job.  Each of the BLOOM_K
    hash positions is projected ONCE and reused for its word index and
    bit offset (the inlined SQL evaluated every md5 twice).  The fact
    table is pruned BEFORE any exchange, so the exact semi-join that
    follows shuffles only the surviving fraction."""
    wmap = words.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word"), F.col("bits")))
        ).alias("_bloom_map")
    )
    pos_cols = [
        F.expr(_bloom_pos_sql(key, i)).alias(f"_bp{i}") for i in range(BLOOM_K)
    ]
    probe = fact.crossJoin(F.broadcast(wmap)).select("*", *pos_cols)
    test = None
    for i in range(BLOOM_K):
        # empty build side => empty map => element_at NULL => coalesce 0
        # => every row rejected (a bloom over nothing rejects all);
        # NULL key => NULL position => same rejection path.
        t = (
            F.coalesce(
                F.element_at(
                    F.col("_bloom_map"),
                    F.expr(f"CAST(_bp{i} DIV 32 AS BIGINT)"),
                ),
                F.lit(0).cast("bigint"),
            ).bitwiseAND(F.expr(f"shiftleft(1L, CAST(_bp{i} % 32 AS INT))"))
            != 0
        )
        test = t if test is None else (test & t)
    drop_cols = ["_bloom_map"] + [f"_bp{i}" for i in range(BLOOM_K)]
    return probe.filter(test).drop(*drop_cols)
