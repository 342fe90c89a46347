"""Reference-parity queries (SURVEY.md §2.12), remapped per FIXTURES.md §2.

Every query here mirrors one statement of
/root/reference/SQL_file.sql (cited as ref:LINE) with the Chinook
tables role-mapped onto the driver's TPC-H-ish tables:

  customer->customer, invoice->orders, invoice_line->lineitem,
  track->part, genre->part.p_type, album/artist->part.p_brand,
  country->nation.n_name (USA -> 'NATION_0').

Conventions (see functions.compat): money aggregates flow through exact
DECIMAL and are rounded before the final double cast; ranks are INT on
both engines; date math uses explicit calendar arithmetic so Spark and
the DuckDB oracle agree bit-for-bit.

Scale notes appear per query: each plan is written so the same logical
shape survives 100 TB (filters pushed below joins, bounded broadcasts,
aggregation before windows, no driver-side collects).
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import (
    SQL_REVENUE,
    day_diff,
    money,
    money_sum,
    month_diff,
    ratio2,
    revenue_expr,
    round2,
    sql_day_diff,
    sql_month_diff,
)
from ..sources import load_tables
from .registry import register
from .views import (  # noqa: F401  (SQL_STAR_N0/_star_n0 re-exported for oracles)
    NATION0,
    SQL_NATION0_TYPE_SALES,
    SQL_STAR_N0,
    _star_n0,
    nation0_type_sales,
)

#: First-purchase-year threshold splitting "old" vs "new" customers
#: (ref:320 uses <=2017 on Chinook; the driver data spans 1995-2001).
OLD_YEAR = 1997


# ---------------------------------------------------------------------------
# q01 — data quality (ref:4-22)
# ---------------------------------------------------------------------------


@register(
    "q01_dupes",
    oracle="""
    SELECT c_custkey, COUNT(*) AS n_rows
    FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1
    """,
)
def q01_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-PK probe (ref:4-9): GROUP BY pk HAVING count>1.

    Scale: partial-agg (map-side combine) makes this a near-free scan;
    the shuffled key space is the PK domain but the HAVING filter keeps
    output tiny.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


_ORDER_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "q01_nulls",
    oracle="SELECT * FROM orders WHERE "
    + " OR ".join(f"{c} IS NULL" for c in _ORDER_COLS),
)
def q01_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value scan (ref:12-22): N-way IS NULL disjunction.

    Scale: pure scan+filter, no shuffle; Parquet null-count statistics
    let row groups with zero nulls be skipped entirely.
    """
    t = load_tables(spark, sf_dir)
    cond = reduce(or_, [F.col(c).isNull() for c in _ORDER_COLS])
    return t["orders"].filter(cond)


# ---------------------------------------------------------------------------
# q02 — flagship: top parts in NATION_0 (ref:25-46)
# ---------------------------------------------------------------------------


@register(
    "q02_top_parts_nation0",
    oracle=f"""
    WITH s AS (
      SELECT p.p_partkey, p.p_name,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_d,
             SUM({SQL_REVENUE}) AS rev_d
      {SQL_STAR_N0}
      GROUP BY p.p_partkey, p.p_name
    ), r AS (
      SELECT p_name,
             CAST(ROUND(qty_d, 2) AS DOUBLE) AS total_qty,
             CAST(ROUND(rev_d, 2) AS DOUBLE) AS revenue,
             CAST(RANK() OVER (ORDER BY rev_d DESC, qty_d DESC) AS INTEGER) AS rnk
      FROM s
    )
    SELECT * FROM r WHERE rnk <= 5
    """,
)
def q02_top_parts_nation0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 parts by revenue in NATION_0 (ref:25-46, the flagship).

    Shape: 5-way star join -> hash agg -> global RANK (multi-key ties,
    ref:31) -> rank filter.  The rank-filter (not LIMIT) keeps the
    result deterministic under ties.

    Scale: aggregation reduces to |part| rows before the windowing, and
    the global rank is TWO-STAGE: Spark's rank-limit pushdown plans a
    Partial WindowGroupLimit that prunes every partition to its local
    top-5 (rank semantics — boundary ties survive) before the
    SinglePartition exchange, so the lone single-task stage receives
    <=5 rows per upstream partition regardless of part cardinality
    (asserted in tests/test_plans.py::test_q02_global_topk_is_two_stage).
    """
    t = load_tables(spark, sf_dir)
    s = (
        _star_n0(t)
        .groupBy("p_partkey", "p_name")
        .agg(
            F.sum(money("l_quantity")).alias("qty_d"),
            F.sum(revenue_expr()).alias("rev_d"),
        )
    )
    w = Window.orderBy(F.col("rev_d").desc(), F.col("qty_d").desc())
    return (
        s.select(
            "p_name",
            round2(F.col("qty_d")).alias("total_qty"),
            round2(F.col("rev_d")).alias("revenue"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


# ---------------------------------------------------------------------------
# q03 / q04 — geo demographics and revenue (ref:50-68)
# ---------------------------------------------------------------------------


@register(
    "q03_demographics",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q03_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers per region/nation (ref:50-57; geo hierarchy remap).

    Scale: two broadcast joins (nation 25 rows, region 5 rows — bounded
    dims at any SF) then a low-cardinality hash agg.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q03b_segment_geo",
    oracle="""
    SELECT n.n_name,
           COALESCE(c.c_mktsegment, 'N/A') AS segment,
           CONCAT(n.n_name, ' / ', COALESCE(c.c_mktsegment, 'N/A')) AS geo_label,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def q03b_segment_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers per nation x market segment with a CONCAT label —
    the reference's CONCAT/COALESCE projection shapes (F1 ref:74,
    F2 ref:52) which the name remap otherwise drops.  The expression
    is defined once and reused for grouping + projection (SURVEY
    §7.4.5: no alias-in-GROUP-BY looseness)."""
    t = load_tables(spark, sf_dir)
    seg = F.coalesce(F.col("c_mktsegment"), F.lit("N/A"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            seg.alias("segment"),
            F.concat(F.col("n_name"), F.lit(" / "), seg).alias("geo_label"),
        )
        .groupBy("n_name", "segment", "geo_label")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q04_rev_by_geo",
    oracle="""
    SELECT n.n_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q04_rev_by_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and order count per nation (ref:60-68).

    Scale: orders⋈customer shuffles on o_custkey (or broadcasts customer
    when small); the nation dim is broadcast; partial aggregation
    collapses to 25 groups before the final exchange.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            round2(money_sum("o_totalprice")).alias("revenue"),
        )
    )


@register(
    "q04b_topk_nations",
    oracle="""
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    LIMIT 5
    """,
)
def q04b_topk_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT top-k (ref:45-46, O2): Spark plans
    TakeOrderedAndProject — no full sort, each partition keeps a
    k-heap.  Deterministic under ties via the n_name tie-break key.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(round2(money_sum("o_totalprice")).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
        .limit(5)
    )


@register(
    "q04c_rollup_geo",
    oracle="""
    SELECT r.r_name, n.n_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def q04c_rollup_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (region -> nation -> grand
    total).  Not in the reference (SURVEY §2.4 notes grouping sets are
    absent) but part of the engine's aggregation surface; Spark plans
    one Expand + hash aggregate, no extra scans per grouping level.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            round2(money_sum("o_totalprice")).alias("revenue"),
        )
    )


@register(
    "q10b_approx_distinct",
    oracle="""
    SELECT o.o_custkey,
           COUNT(DISTINCT l.l_partkey) AS exact_parts,
           TRUE AS approx_within_tol
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey
    """,
)
def q10b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT(DISTINCT) via HyperLogLog++ — the opt-in scale
    path when exact distinct shuffles are too expensive (PERF.md).

    Sketch values are engine-specific, so the estimate itself can't be
    hash-compared; instead the tolerance check is folded INTO the
    result as a boolean (|approx - exact| <= max(8% of exact, 4) — a
    ~4-sigma bound at rsd 0.02; measured max deviation on the driver
    corpus is ~5.8%) and
    the oracle asserts TRUE per group — turning the former rows-only
    row into a real driver-enforced gate.  The exact count here is the
    verification harness, not the scale path: a production user reads
    the approx column alone.
    """
    t = load_tables(spark, sf_dir)
    agg = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )
    tol = F.greatest(F.col("exact_parts") * 0.08, F.lit(4.0))
    return agg.select(
        "o_custkey",
        "exact_parts",
        (F.abs(F.col("approx_parts") - F.col("exact_parts")) <= tol).alias(
            "approx_within_tol"
        ),
    )


# ---------------------------------------------------------------------------
# q05 / q06 — top-k per group (ref:71-114)
# ---------------------------------------------------------------------------


@register(
    "q05_top5_cust_per_nation",
    oracle="""
    WITH s AS (
      SELECT n.n_name, c.c_custkey, c.c_name,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS spend_d
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, c.c_custkey, c.c_name
    )
    SELECT n_name, c_name,
           CAST(ROUND(spend_d, 2) AS DOUBLE) AS spend,
           CAST(DENSE_RANK() OVER (PARTITION BY n_name ORDER BY spend_d DESC) AS INTEGER) AS rnk
    FROM s QUALIFY rnk <= 5
    """,
)
def q05_top5_cust_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by spend per nation (ref:71-89, DENSE_RANK W2).

    Scale: per-(nation, customer) hash agg first, then the window
    partitions by nation — the window input is one row per customer,
    already heavily reduced.  Skew note: a hot nation means a hot window
    partition; at 100 TB pre-aggregate is what bounds it (rows, not raw
    lineitems, flow into the sort).
    """
    t = load_tables(spark, sf_dir)
    s = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(money_sum("o_totalprice").alias("spend_d"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("spend_d").desc())
    return (
        s.select(
            "n_name",
            "c_name",
            round2(F.col("spend_d")).alias("spend"),
            F.dense_rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@register(
    "q06_top_part_per_cust",
    oracle="""
    WITH s AS (
      SELECT c.c_custkey, c.c_name, p.p_partkey, p.p_name,
             SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS qty_d
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY c.c_custkey, c.c_name, p.p_partkey, p.p_name
    )
    SELECT c_custkey, c_name, p_name,
           CAST(ROUND(qty_d, 2) AS DOUBLE) AS total_qty
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY c_custkey ORDER BY qty_d DESC, p_partkey) AS rn
      FROM s
    ) WHERE rn = 1
    """,
)
def q06_top_part_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's most-bought part (ref:92-114, ROW_NUMBER W3).

    The reference's ROW_NUMBER is tie-nondeterministic (SURVEY §7.4.1);
    the engine adds ``p_partkey`` as a deterministic tie-break.

    Scale: aggregate to (custkey, partkey) grain FIRST on keys alone,
    window down to one row per customer, and only then join the name
    dimensions — the joins run on |customers| rows instead of
    |lineitem| rows, and the window state per customer partition is
    tiny.

    Single-shuffle plan: the explicit repartition by ``o_custkey``
    satisfies BOTH the (custkey, partkey) aggregation's clustered
    distribution and the window's partitioning, so the whole
    agg->window pipeline runs on one Exchange instead of two.  The
    map-side partial aggregation this forgoes is worthless here —
    (custkey, partkey) is near-unique per input partition, so partials
    shrink nothing (measured 1.6x faster at sf0.1; the imbalance only
    grows at 100 TB where the second full-width shuffle dominates).
    """
    t = load_tables(spark, sf_dir)
    s = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .repartition("o_custkey")
        .groupBy("o_custkey", "l_partkey")
        .agg(F.sum(money("l_quantity")).alias("qty_d"))
    )
    w = Window.partitionBy("o_custkey").orderBy(F.col("qty_d").desc(), F.col("l_partkey"))
    top = s.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        top.join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .select("c_custkey", "c_name", "p_name", round2(F.col("qty_d")).alias("total_qty"))
    )


# ---------------------------------------------------------------------------
# q07 / q08 — purchase trends and churn (ref:117-144)
# ---------------------------------------------------------------------------


@register(
    "q07_purchase_trends",
    oracle="""
    WITH g AS (
      SELECT o_totalprice,
             {dd} AS gap_days
      FROM (
        SELECT o_custkey, o_orderdate, o_totalprice,
               LAG(o_orderdate) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date
        FROM orders
      )
    )
    SELECT ROUND(CAST(SUM(gap_days) AS DOUBLE) / CAST(COUNT(gap_days) AS DOUBLE), 2)
             AS avg_days_between_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 2) AS avg_order_value
    FROM g
    """.format(dd=sql_day_diff("prev_date", "o_orderdate")),
)
def q07_purchase_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avg days between orders + avg order value (ref:117-133, LAG W4).

    LAG runs over raw orders partitioned by customer with a
    deterministic (date, orderkey) sort.  NULL first-gaps are skipped by
    COUNT(col) on both engines.

    Scale: the only shuffle is the window exchange on o_custkey; the
    final global aggregate is a partial-agg reduction to one row.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = t["orders"].select(
        "o_totalprice",
        day_diff(F.lag("o_orderdate").over(w), F.col("o_orderdate")).alias("gap_days"),
    )
    return g.agg(
        F.round(F.sum("gap_days").cast("double") / F.count("gap_days").cast("double"), 2).alias(
            "avg_days_between_orders"
        ),
        ratio2(money_sum("o_totalprice"), F.count(F.lit(1))).alias("avg_order_value"),
    )


@register(
    "q08_churn_rate",
    oracle="""
    WITH last AS (
      SELECT o_custkey, MAX(o_orderdate) AS last_order FROM orders GROUP BY o_custkey
    ), anchor AS (
      SELECT MAX(o_orderdate) AS anchor_ts FROM orders
    )
    SELECT COUNT(*) AS total_customers,
           CAST(SUM(CASE WHEN CAST(last_order AS DATE)
                              < CAST(CAST(anchor_ts AS DATE) - INTERVAL 6 MONTH AS DATE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS churned_customers,
           ROUND(100.0 * CAST(SUM(CASE WHEN CAST(last_order AS DATE)
                              < CAST(CAST(anchor_ts AS DATE) - INTERVAL 6 MONTH AS DATE)
                         THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2)
             AS churn_rate_pct
    FROM last, anchor
    """,
)
def q08_churn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """% of customers inactive >= 6 months vs dataset MAX date (ref:136-144).

    The anchor is MAX(o_orderdate) — never wall clock (SURVEY §7.4.4) —
    computed as a 1-row aggregate and cross-joined (the DataFrame-API
    equivalent of the reference's uncorrelated scalar subquery C4).

    Scale: the 1-row anchor broadcast is free; per-customer MAX is a
    partial-aggregated shuffle on the customer key.
    """
    t = load_tables(spark, sf_dir)
    last = t["orders"].groupBy("o_custkey").agg(F.max("o_orderdate").alias("last_order"))
    anchor = t["orders"].agg(F.max("o_orderdate").alias("anchor_ts"))
    cutoff = F.add_months(F.to_date("anchor_ts"), -6)
    churned = F.sum(F.when(F.to_date("last_order") < cutoff, 1).otherwise(0))
    return (
        last.crossJoin(F.broadcast(anchor))
        .agg(
            F.count(F.lit(1)).alias("total_customers"),
            churned.alias("churned_customers"),
            F.round(
                F.lit(100.0) * churned.cast("double") / F.count(F.lit(1)).cast("double"), 2
            ).alias("churn_rate_pct"),
        )
    )


# ---------------------------------------------------------------------------
# q09 / q09b / q11 — the view and its consumers (ref:148-222)
# ---------------------------------------------------------------------------


@register(
    "q09_type_pct_nation0",
    oracle=f"WITH {SQL_NATION0_TYPE_SALES} SELECT * FROM nation0_type_sales",
)
def q09_type_pct_nation0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nation0_type_sales view itself (ref:148-168): revenue share +
    rank per part type inside NATION_0."""
    return nation0_type_sales(spark, sf_dir)


@register(
    "q11_type_rank_nation0",
    oracle=f"WITH {SQL_NATION0_TYPE_SALES} SELECT p_type, rnk FROM nation0_type_sales",
)
def q11_type_rank_nation0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View consumer projecting the rank only (ref:217-222, view scan S4)."""
    return nation0_type_sales(spark, sf_dir).select("p_type", "rnk")


def _top_type_brand_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_type, p_brand, rev_d) restricted to the view's top-3 types —
    the star/semi-join/agg core q09b and s01 share (r11 review: the
    two bodies carried verbatim copies); they differ only in the
    window function ranking the brands afterward.  The semi-join side
    is <= 3 rows — broadcast; everything else is the standard
    star-join-then-agg pipeline."""
    t = load_tables(spark, sf_dir)
    top_types = (
        nation0_type_sales(spark, sf_dir).filter(F.col("rnk") <= 3).select("p_type")
    )
    return (
        _star_n0(t)
        .join(F.broadcast(top_types), "p_type", "left_semi")
        .groupBy("p_type", "p_brand")
        .agg(F.sum(revenue_expr()).alias("rev_d"))
    )


@register(
    "q09b_top_brands_top_types",
    oracle=f"""
    WITH {SQL_NATION0_TYPE_SALES},
    top_types AS (
      SELECT p_type FROM nation0_type_sales WHERE rnk <= 3
    ), s AS (
      SELECT p.p_type, p.p_brand, SUM({SQL_REVENUE}) AS rev_d
      {SQL_STAR_N0}
        AND p.p_type IN (SELECT p_type FROM top_types)
      GROUP BY p.p_type, p.p_brand
    )
    SELECT p_type, p_brand,
           CAST(ROUND(rev_d, 2) AS DOUBLE) AS revenue,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY p_type ORDER BY rev_d DESC, p_brand) AS INTEGER) AS brand_rank
    FROM s QUALIFY brand_rank <= 3
    """,
)
def q09b_top_brands_top_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 brands within the top-3 part types of NATION_0 (ref:171-197).

    The type restriction is the reference's IN-subquery (P7/C6),
    expressed as a left-semi join against the view's rnk<=3 rows.

    Scale: the semi-join side is <= 3 rows — broadcast; everything else
    is the standard star-join-then-agg pipeline.
    """
    s = _top_type_brand_rev(spark, sf_dir)
    w = Window.partitionBy("p_type").orderBy(F.col("rev_d").desc(), F.col("p_brand"))
    return (
        s.select(
            "p_type",
            "p_brand",
            round2(F.col("rev_d")).alias("revenue"),
            F.row_number().over(w).alias("brand_rank"),
        )
        .filter(F.col("brand_rank") <= 3)
    )


# ---------------------------------------------------------------------------
# q10 / q12 — multi-genre customers, inactive customers (ref:202-239)
# ---------------------------------------------------------------------------


@register(
    "q10_multi_type_cust",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(DISTINCT p.p_type) AS n_types
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY c.c_custkey, c.c_name
    HAVING COUNT(DISTINCT p.p_type) > 2
    """,
)
def q10_multi_type_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers buying more than 2 distinct part types (ref:202-214).

    Exact COUNT(DISTINCT) — Spark plans the expand + two-phase
    aggregate; at 100 TB this stays shuffle-bound on (custkey, type)
    pairs, which is the exact-semantics floor.  The customer name
    dimension joins after the HAVING filter, on the reduced relation.
    """
    t = load_tables(spark, sf_dir)
    part_types = t["part"].select("p_partkey", "p_type")
    counts = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part_types, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("o_custkey")
        .agg(F.countDistinct("p_type").alias("n_types"))
        .filter(F.col("n_types") > 2)
    )
    return counts.join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    ).select("c_custkey", "c_name", "n_types")


@register(
    "q12_inactive_3mo",
    oracle="""
    WITH last AS (
      SELECT o.o_custkey, c.c_name, MAX(o.o_orderdate) AS last_order
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY o.o_custkey, c.c_name
    ), anchor AS (SELECT MAX(o_orderdate) AS anchor_ts FROM orders)
    SELECT o_custkey AS c_custkey, c_name, last_order,
           {md} AS months_inactive
    FROM last, anchor
    WHERE {md} >= 3
    """.format(md=sql_month_diff("last_order", "anchor_ts")),
)
def q12_inactive_3mo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers inactive >= 3 months (ref:226-239, TIMESTAMPDIFF-MONTH F8).

    Month arithmetic uses the explicit day-anchored formula shared with
    the oracle (functions.compat.month_diff).
    """
    t = load_tables(spark, sf_dir)
    last = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_custkey", "c_name")
        .agg(F.max("o_orderdate").alias("last_order"))
    )
    anchor = t["orders"].agg(F.max("o_orderdate").alias("anchor_ts"))
    mi = month_diff(F.col("last_order"), F.col("anchor_ts"))
    return (
        last.crossJoin(F.broadcast(anchor))
        .withColumn("months_inactive", mi)
        .filter(F.col("months_inactive") >= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "c_name", "last_order", "months_inactive")
    )


# ---------------------------------------------------------------------------
# s01 / s02 — promo and international top-k (ref:248-300)
# ---------------------------------------------------------------------------


@register(
    "s01_brand_promo",
    oracle=f"""
    WITH {SQL_NATION0_TYPE_SALES},
    s AS (
      SELECT p.p_type, p.p_brand, SUM({SQL_REVENUE}) AS rev_d
      {SQL_STAR_N0}
        AND p.p_type IN (SELECT p_type FROM nation0_type_sales WHERE rnk <= 3)
      GROUP BY p.p_type, p.p_brand
    )
    SELECT p_type, p_brand,
           CAST(ROUND(rev_d, 2) AS DOUBLE) AS revenue,
           CAST(DENSE_RANK() OVER (PARTITION BY p_type ORDER BY rev_d DESC) AS INTEGER) AS rnk
    FROM s QUALIFY rnk IN (1, 2)
    """,
)
def s01_brand_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 brands (DENSE_RANK, IN-list P6) within top-3 NATION_0 types
    (ref:248-273)."""
    s = _top_type_brand_rev(spark, sf_dir)
    w = Window.partitionBy("p_type").orderBy(F.col("rev_d").desc())
    return (
        s.select(
            "p_type",
            "p_brand",
            round2(F.col("rev_d")).alias("revenue"),
            F.dense_rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk").isin(1, 2))
    )


@register(
    "s02_intl_types",
    oracle=f"""
    WITH s AS (
      SELECT n.n_name, p.p_type, SUM({SQL_REVENUE}) AS rev_d
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE n.n_name <> '{NATION0}'
      GROUP BY n.n_name, p.p_type
    )
    SELECT n_name, p_type,
           CAST(ROUND(rev_d, 2) AS DOUBLE) AS revenue,
           CAST(DENSE_RANK() OVER (PARTITION BY n_name ORDER BY rev_d DESC) AS INTEGER) AS rnk
    FROM s QUALIFY rnk <= 2
    """,
)
def s02_intl_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 part types per non-NATION_0 nation (ref:276-300, P3 + W2)."""
    t = load_tables(spark, sf_dir)
    s = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") != NATION0)
        .groupBy("n_name", "p_type")
        .agg(F.sum(revenue_expr()).alias("rev_d"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("rev_d").desc())
    return (
        s.select(
            "n_name",
            "p_type",
            round2(F.col("rev_d")).alias("revenue"),
            F.dense_rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 2)
    )


# ---------------------------------------------------------------------------
# s03 — old vs new customer behavior (ref:304-387, 5-CTE pipeline)
# ---------------------------------------------------------------------------


@register(
    "s03_old_vs_new",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey
    ), o AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             MIN(o_orderdate) OVER (PARTITION BY o_custkey) AS first_order
      FROM orders
    ), labeled AS (
      SELECT o.*, li.n_items,
             CASE WHEN EXTRACT(YEAR FROM o.first_order) <= {OLD_YEAR}
                  THEN 'old' ELSE 'new' END AS status
      FROM o JOIN li ON o.o_orderkey = li.l_orderkey
    )
    SELECT status,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_spend,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(COUNT(DISTINCT o_custkey) AS DOUBLE), 2) AS avg_spend_per_cust,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / CAST(COUNT(DISTINCT o_custkey) AS DOUBLE), 2) AS avg_orders_per_cust,
           ROUND(CAST(SUM(n_items) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_basket_size
    FROM labeled
    GROUP BY status
    """,
)
def s03_old_vs_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Old vs new customer behavior (ref:304-387).

    The reference's correlated scalar subquery (first purchase date per
    customer, ref:308) decorrelates into a window MIN over the customer
    partition — exactly Catalyst's RewriteCorrelatedScalarSubquery
    outcome, written directly (SURVEY §2.9 C5).

    Scale: one window exchange on o_custkey, one join to per-order item
    counts (pre-aggregated, so the join is order-grain), then a 2-group
    aggregate.  No per-row subquery execution anywhere.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    w = Window.partitionBy("o_custkey")
    o = t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.min("o_orderdate").over(w).alias("first_order"),
    )
    labeled = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).withColumn(
        "status",
        F.when(F.year("first_order") <= OLD_YEAR, "old").otherwise("new"),
    )
    n_cust = F.countDistinct("o_custkey")
    n_orders = F.count(F.lit(1))
    spend = money_sum("o_totalprice")
    return labeled.groupBy("status").agg(
        n_cust.alias("n_customers"),
        n_orders.alias("n_orders"),
        round2(spend).alias("total_spend"),
        ratio2(spend, n_cust).alias("avg_spend_per_cust"),
        ratio2(n_orders, n_cust).alias("avg_orders_per_cust"),
        ratio2(F.sum("n_items"), n_orders).alias("avg_basket_size"),
    )


# ---------------------------------------------------------------------------
# s04 — market-basket pair affinity (ref:392-454)
# ---------------------------------------------------------------------------

_SQL_PAIRS = """
    WITH li AS (
      SELECT l.l_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY l.l_orderkey ORDER BY l.l_linenumber, l.l_partkey) AS rid,
             p.{col} AS v
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), pairs AS (
      SELECT LEAST(a.v, b.v) AS v1, GREATEST(a.v, b.v) AS v2
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey AND a.rid < b.rid
      WHERE a.v <> b.v
    )
    SELECT v1 AS {col}_1, v2 AS {col}_2, COUNT(*) AS n_pairs
    FROM pairs GROUP BY v1, v2
"""


def _pairs_selfjoin(t: dict[str, DataFrame], col: str) -> DataFrame:
    """Literal self-join pair formulation (ref:396-410, J3).

    Equi-key on the order, non-equi ``<`` residual on a per-order row id
    to canonicalize unordered line pairs, then LEAST/GREATEST to
    canonicalize the attribute pair.  The reference's ``<`` runs on the
    globally-unique invoice_line_id (ref:399); the driver data's
    ``l_linenumber`` repeats within an order, so a ROW_NUMBER id stands
    in — pair counts are invariant to the tie order because every
    unordered row pair is enumerated exactly once either way.

    The rid sort includes ``l_partkey`` (which determines ``v``): a
    self-join evaluates its two subtrees independently, and parallel
    scans can present ties in different orders per evaluation.  Ordering
    by a v-determining key makes any residual tie scramble harmless —
    on Spark AND on the DuckDB oracle, whose inlined CTE has the same
    double-evaluation hazard.

    Skew note (measured, r10): AQE's skew-join split is STRUCTURALLY
    unavailable on this plan — the rid window sits between the shuffle
    and the SMJ (children are Window(Sort(ShuffleRead)), not the
    Sort(ShuffleQueryStage) pattern OptimizeSkewedJoin matches), and
    splitting a partition under row_number would break rank semantics
    anyway.  A hot-order basket therefore serializes on one task here;
    the registered scale path is the _scaled multiplicity-compressed
    rewrite, and when the literal pair shape itself must run at scale,
    materialize the rid relation first so the self-join owns its
    shuffles — tests/test_skew_and_compat.py
    test_s04_literal_skew_mitigation_story pins both behaviors.
    """
    rid = F.row_number().over(
        Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    )
    li = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", rid.alias("rid"), F.col(col).alias("v"))
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .filter(F.col("a.v") != F.col("b.v"))
        .select(
            F.least("a.v", "b.v").alias(f"{col}_1"),
            F.greatest("a.v", "b.v").alias(f"{col}_2"),
        )
        .groupBy(f"{col}_1", f"{col}_2")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register("s04_affinity_types", oracle=_SQL_PAIRS.format(col="p_type"))
def s04_affinity_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-type pair purchase counts (genre affinity, ref:392-410)."""
    return _pairs_selfjoin(load_tables(spark, sf_dir), "p_type")


@register("s04_affinity_brands", oracle=_SQL_PAIRS.format(col="p_brand"))
def s04_affinity_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand pair purchase counts (artist/album affinity, ref:412-454)."""
    return _pairs_selfjoin(load_tables(spark, sf_dir), "p_brand")


@register("s04_affinity_types_scaled", oracle=_SQL_PAIRS.format(col="p_type"))
def s04_affinity_types_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale rewrite of s04_affinity_types — identical output, no
    fact×fact shuffle join (SURVEY §4 "custom physical approach").

    **Multiplicity compression** (the per-basket cap): lines first
    reduce to per-(order, type) COUNTS, so a basket's state is bounded
    by the TYPE VOCABULARY — never its line count — and the pair count
    for (t1, t2) is the product of multiplicities.  A pathological
    million-line basket that would expand to ~10^12 rows under the
    literal self-join (and to ~10^12 struct pairs under a naive
    collect_list-of-lines rewrite) carries at most |types| array
    entries and |types|^2 products here; with the driver's ~150-type
    vocabulary that is a constant.  Shuffles: one line-grain count agg
    and one order-grain agg of the compressed relation, then the pair
    enumeration runs inside the row on the sorted distinct-type array
    (x < y positionally ⇒ canonical v1 < v2, no same-type pairs to
    filter).  Hash-checked against the literal self-join's oracle;
    tests/test_skew_and_compat.py proves the pathological-basket bound.
    """
    t = load_tables(spark, sf_dir)
    items = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        # NULL types never pair in the literal form (a.v <> b.v is
        # NULL-rejecting join logic); the in-row enumeration has no
        # such join, so the filter must be explicit or sort_array
        # happily pairs the NULL group (fuzz gate, r12)
        .filter(F.col("p_type").isNotNull())
        .select("l_orderkey", F.col("p_type").alias("v"))
    )
    # ONE exchange for both grouping levels (r12, guide §2.4): an
    # explicit hash repartition on l_orderkey satisfies the clustering
    # requirement of BOTH the (order, type) count and the order-grain
    # collect, so neither aggregate plans its own shuffle — the plan
    # drops from 3 exchanges to 2 and the line-grain rows cross the
    # network once (measured 2.22 -> 1.38 s at sf0.1; bytes are a wash
    # since type multiplicities hover near 1, and the basket-state
    # bound is untouched).  Skew shape is unchanged — the old plan's
    # second exchange was keyed l_orderkey too (fuzz skew variant
    # gates it).
    counts = (
        items.repartition("l_orderkey")
        .groupBy("l_orderkey", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grouped = counts.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct("v", "c"))).alias("xs")
    )
    pair_expr = F.expr(
        """
        flatten(transform(xs, (x, i) ->
          transform(slice(xs, i + 2, size(xs)), y ->
            struct(x.v AS v1, y.v AS v2, x.c * y.c AS np))))
        """
    )
    return (
        grouped.select(F.explode(pair_expr).alias("pr"))
        .groupBy(
            F.col("pr.v1").alias("p_type_1"),
            F.col("pr.v2").alias("p_type_2"),
        )
        .agg(F.sum("pr.np").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# s05 — regional churn (ref:458-497)
# ---------------------------------------------------------------------------


@register(
    "s05_regional_churn",
    oracle="""
    WITH last AS (
      SELECT o.o_custkey, n.n_name, MAX(o.o_orderdate) AS last_order
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY o.o_custkey, n.n_name
    ), anchor AS (SELECT MAX(o_orderdate) AS anchor_ts FROM orders)
    SELECT n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN {md} >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS churned_customers,
           ROUND(100.0 * CAST(SUM(CASE WHEN {md} >= 6 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 2) AS churn_rate_pct
    FROM last, anchor
    GROUP BY n_name
    """.format(md=sql_month_diff("last_order", "anchor_ts")),
)
def s05_regional_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn rate per nation (ref:458-483, conditional aggregation A7)."""
    t = load_tables(spark, sf_dir)
    last = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("o_custkey", "n_name")
        .agg(F.max("o_orderdate").alias("last_order"))
    )
    anchor = t["orders"].agg(F.max("o_orderdate").alias("anchor_ts"))
    churned = F.sum(
        F.when(month_diff(F.col("last_order"), F.col("anchor_ts")) >= 6, 1).otherwise(0)
    )
    return (
        last.crossJoin(F.broadcast(anchor))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            churned.alias("churned_customers"),
            F.round(
                F.lit(100.0) * churned.cast("double") / F.count(F.lit(1)).cast("double"), 2
            ).alias("churn_rate_pct"),
        )
    )


# ---------------------------------------------------------------------------
# s06 / s07 — RFM risk and CLV segmentation (ref:501-645)
# ---------------------------------------------------------------------------

_SQL_RFM_BASE = """
    WITH li AS (
      SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey
    ), per_cust AS (
      SELECT o.o_custkey,
             MAX(o.o_orderdate) AS last_order,
             COUNT(DISTINCT o.o_orderkey) AS n_orders,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS spend_d,
             SUM(li.n_items) AS n_items
      FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
      GROUP BY o.o_custkey
    ), anchor AS (SELECT MAX(o_orderdate) AS anchor_ts FROM orders),
    rfm AS (
      SELECT p.*, {dd} AS recency_days
      FROM per_cust p, anchor
    )
"""


def _rfm_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-customer RFM relation (ref:501-534 CTEs; reused by s06/s07).

    recency = days since last order vs the dataset-max anchor;
    frequency = distinct orders; monetary = exact decimal spend;
    n_items for basket-size metrics.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    per_cust = (
        t["orders"]
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            money_sum("o_totalprice").alias("spend_d"),
            F.sum("n_items").alias("n_items"),
        )
    )
    anchor = t["orders"].agg(F.max("o_orderdate").alias("anchor_ts"))
    return per_cust.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days", day_diff(F.col("last_order"), F.col("anchor_ts"))
    )


#: Risk ladder (ref:544-552, 4-level hierarchical CASE).
_RISK_CASE_SQL = """
    CASE WHEN recency_days >= 540 THEN 'high_risk'
         WHEN recency_days >= 360 THEN 'medium_risk'
         WHEN recency_days >= 180 THEN 'low_risk'
         ELSE 'active' END
"""


@register(
    "s06_risk_profile",
    oracle=_SQL_RFM_BASE.format(dd=sql_day_diff("last_order", "anchor_ts"))
    + f"""
    SELECT {_RISK_CASE_SQL} AS risk_segment,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(recency_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2)
             AS avg_inactive_days,
           ROUND(CAST(SUM(spend_d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_spend,
           ROUND(CAST(SUM(n_orders) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_orders
    FROM rfm
    GROUP BY 1
    """,
)
def s06_risk_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM risk segmentation (ref:501-558): per-segment customer counts
    and average recency/spend/orders."""
    rfm = _rfm_base(spark, sf_dir)
    seg = (
        F.when(F.col("recency_days") >= 540, "high_risk")
        .when(F.col("recency_days") >= 360, "medium_risk")
        .when(F.col("recency_days") >= 180, "low_risk")
        .otherwise("active")
    )
    n = F.count(F.lit(1))
    return rfm.groupBy(seg.alias("risk_segment")).agg(
        n.alias("n_customers"),
        ratio2(F.sum("recency_days"), n).alias("avg_inactive_days"),
        ratio2(F.sum("spend_d"), n).alias("avg_spend"),
        ratio2(F.sum("n_orders"), n).alias("avg_orders"),
    )


@register(
    "s07_clv_segments",
    oracle=_SQL_RFM_BASE.format(dd=sql_day_diff("last_order", "anchor_ts"))
    + """
    SELECT o_custkey AS c_custkey,
           CAST(ROUND(spend_d, 2) AS DOUBLE) AS total_spend,
           n_orders,
           recency_days,
           ROUND(CAST(n_items AS DOUBLE) / CAST(n_orders AS DOUBLE), 2) AS avg_basket_size,
           CASE WHEN spend_d >= 500000 THEN 'platinum'
                WHEN spend_d >= 250000 THEN 'gold'
                WHEN spend_d >= 100000 THEN 'silver'
                ELSE 'bronze' END AS value_segment,
           CASE WHEN n_orders >= 15 THEN 'frequent'
                WHEN n_orders >= 8 THEN 'regular'
                ELSE 'occasional' END AS freq_segment,
           CASE WHEN recency_days <= 180 THEN 'recent'
                WHEN recency_days <= 365 THEN 'lapsing'
                ELSE 'dormant' END AS recency_segment,
           CASE WHEN ROUND(CAST(n_items AS DOUBLE) / CAST(n_orders AS DOUBLE), 2)
                     BETWEEN 2 AND 5 THEN 'typical'
                WHEN ROUND(CAST(n_items AS DOUBLE) / CAST(n_orders AS DOUBLE), 2) < 2
                     THEN 'small'
                ELSE 'large' END AS basket_segment
    FROM rfm
    """,
)
def s07_clv_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLV segmentation (ref:562-645): four independent CASE dimensions
    (value / frequency / recency / basket, incl. the BETWEEN predicate
    P10 at ref:629) over the shared RFM base."""
    rfm = _rfm_base(spark, sf_dir)
    basket = F.round(F.col("n_items").cast("double") / F.col("n_orders").cast("double"), 2)
    return rfm.select(
        F.col("o_custkey").alias("c_custkey"),
        round2(F.col("spend_d")).alias("total_spend"),
        "n_orders",
        "recency_days",
        basket.alias("avg_basket_size"),
        F.when(F.col("spend_d") >= 500000, "platinum")
        .when(F.col("spend_d") >= 250000, "gold")
        .when(F.col("spend_d") >= 100000, "silver")
        .otherwise("bronze")
        .alias("value_segment"),
        F.when(F.col("n_orders") >= 15, "frequent")
        .when(F.col("n_orders") >= 8, "regular")
        .otherwise("occasional")
        .alias("freq_segment"),
        F.when(F.col("recency_days") <= 180, "recent")
        .when(F.col("recency_days") <= 365, "lapsing")
        .otherwise("dormant")
        .alias("recency_segment"),
        F.when(basket.between(2, 5), "typical")
        .when(basket < 2, "small")
        .otherwise("large")
        .alias("basket_segment"),
    )


# ---------------------------------------------------------------------------
# s10 / s11 — schema evolution and geo behavior (ref:649-679)
# ---------------------------------------------------------------------------


@register(
    "s10_add_column",
    oracle="SELECT *, CAST(NULL AS INTEGER) AS release_year FROM part",
)
def s10_add_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution: ALTER TABLE ADD COLUMN analog (ref:649-650).

    Spark-native equivalent is a projection extension re-registered as a
    view (Delta's ALTER TABLE would do this on a real table format)."""
    t = load_tables(spark, sf_dir)
    return t["part"].withColumn("release_year", F.lit(None).cast("int"))


@register(
    "s11_geo_behavior",
    oracle="""
    WITH items AS (
      SELECT o.o_custkey, COUNT(*) AS n_items
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey
    ), spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS spend_d
      FROM orders GROUP BY o_custkey
    )
    SELECT n.n_name,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(s.spend_d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_spend,
           ROUND(CAST(SUM(i.n_items) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_items
    FROM spend s
    JOIN items i ON s.o_custkey = i.o_custkey
    JOIN customer c ON s.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def s11_geo_behavior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation avg spend / items per customer (ref:654-679, two-level
    aggregation A9: per-customer sums, then per-nation averages)."""
    t = load_tables(spark, sf_dir)
    items = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    spend = t["orders"].groupBy("o_custkey").agg(money_sum("o_totalprice").alias("spend_d"))
    n = F.count(F.lit(1))
    return (
        spend.join(items, "o_custkey")
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            n.alias("n_customers"),
            ratio2(F.sum("spend_d"), n).alias("avg_spend"),
            ratio2(F.sum("n_items"), n).alias("avg_items"),
        )
    )


# ---------------------------------------------------------------------------
# r2 aggregation-surface additions: CUBE, PIVOT, set operations.  None
# exist in the reference (SURVEY §2.4/§2.7 note their absence) but all
# belong to the engine's beyond-reference analytics surface alongside
# q04c's ROLLUP and q10b's HLL.
# ---------------------------------------------------------------------------


@register(
    "q04d_cube_geo",
    oracle="""
    SELECT r.r_name, c.c_mktsegment,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE(r.r_name, c.c_mktsegment)
    """,
)
def q04d_cube_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All cross-dimension subtotals via CUBE (region x segment + both
    marginals + grand total).  Like ROLLUP, Spark plans one Expand (4
    grouping sets) over a single scan — the pre-aggregation pipeline is
    shared, not re-scanned per grouping level."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .cube("r_name", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            round2(money_sum("o_totalprice")).alias("revenue"),
        )
    )


#: Explicit pivot values: passing them (vs letting Spark run a distinct
#: job to discover them) keeps PIVOT a single-pass plan — at 100 TB the
#: discovery job is a full extra scan.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "ev_pivot_user_types",
    oracle="""
    SELECT user_id,
           {cols}
    FROM events GROUP BY user_id
    """.format(
        cols=",\n           ".join(
            f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}"
            for t in EVENT_TYPES
        )
    ),
)
def ev_pivot_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts per user pivoted to one column per type.  Explicit
    value list => single Expand+agg pass (no distinct-discovery job);
    the oracle states the same relation as conditional aggregates."""
    t = load_tables(spark, sf_dir)
    out = (
        t["events"]
        .groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}") for c in EVENT_TYPES],
    )


@register(
    "s12_retention_setops",
    oracle="""
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995),
         y00 AS (SELECT DISTINCT o_custkey FROM orders WHERE YEAR(o_orderdate) = 2000)
    SELECT 'retained' AS cohort, COUNT(*) AS n_customers
    FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y00)
    UNION ALL
    SELECT 'lost' AS cohort, COUNT(*) AS n_customers
    FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y00)
    """,
)
def s12_retention_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one cohort query: customers
    ordering in both 1995 and 2000 vs only 1995.  Spark plans
    intersect/subtract as hash semi/anti aggregates over the deduped
    key sets — same shuffle count as the equivalent semi/anti joins."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"]
    y95 = (
        orders.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    )
    y00 = (
        orders.filter(F.year("o_orderdate") == 2000).select("o_custkey").distinct()
    )
    retained = y95.intersect(y00).agg(F.count(F.lit(1)).alias("n_customers")).select(
        F.lit("retained").alias("cohort"), "n_customers"
    )
    # subtract (EXCEPT DISTINCT) mirrors the oracle operator exactly;
    # exceptAll only coincided because both inputs are pre-deduped
    # (r11 review — dropping that .distinct() as "redundant" would
    # have silently diverged the multiset form from the oracle)
    lost = y95.subtract(y00).agg(F.count(F.lit(1)).alias("n_customers")).select(
        F.lit("lost").alias("cohort"), "n_customers"
    )
    return retained.unionAll(lost)


@register(
    "dq_order_expectations",
    oracle="""
    WITH a AS (
      SELECT COUNT(*) AS n,
             COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS v0,
             COUNT(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 END) AS v1,
             COUNT(CASE WHEN NOT COALESCE(o_totalprice < 20000, FALSE) THEN 1 END) AS v2,
             COUNT(CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F'), FALSE) THEN 1 END) AS v3
      FROM orders
    ), fk AS (
      SELECT (SELECT COUNT(*) FROM orders) AS n,
             COUNT(*) AS v
      FROM orders o
      WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)
    )
    SELECT 'custkey_not_null' AS rule, n AS n_rows, v0 AS n_violations,
           ROUND(CAST(v0 AS DOUBLE)/n, 6) AS violation_rate FROM a
    UNION ALL SELECT 'price_positive', n, v1, ROUND(CAST(v1 AS DOUBLE)/n, 6) FROM a
    UNION ALL SELECT 'price_under_20k', n, v2, ROUND(CAST(v2 AS DOUBLE)/n, 6) FROM a
    UNION ALL SELECT 'status_closed', n, v3, ROUND(CAST(v3 AS DOUBLE)/n, 6) FROM a
    UNION ALL SELECT 'fk_customer', n, v, ROUND(CAST(v AS DOUBLE)/n, 6) FROM fk
    """,
)
def dq_order_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations report over orders: not-null, range, bound,
    set-membership (all in ONE scan via operators.quality.
    expectation_report) plus a referential-integrity anti-join check,
    unioned into a single (rule, n_rows, n_violations, rate) relation.
    Rules are engine-demo policy: price_under_20k and status_closed
    violate on real rows; the rest measure zero."""
    from ..operators.quality import expectation_report, fk_violation_report

    t = load_tables(spark, sf_dir)
    orders = t["orders"]
    report = expectation_report(
        orders,
        {
            "custkey_not_null": F.col("o_custkey").isNotNull(),
            "price_positive": F.col("o_totalprice") > 0,
            "price_under_20k": F.col("o_totalprice") < 20000,
            "status_closed": F.col("o_orderstatus").isin("O", "F"),
        },
    )
    fk = fk_violation_report(orders, t["customer"], "o_custkey", "c_custkey", "fk_customer")
    return report.unionAll(fk)


@register(
    "q13_no_big_order",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
    )
    """,
)
def q13_no_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO order above 450k — the NOT EXISTS / anti-join
    shape (complement of the J4 semi-join family).  Plan: the orders
    side filters BEFORE the anti-join, so the join probe holds only
    big-ticket orders; Spark runs a shuffled hash anti-join keyed by
    custkey (nullable-key NOT IN would need a null-aware variant —
    NOT EXISTS avoids that trap by construction)."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 450000).select("o_custkey")
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def not_in_anti(
    left: DataFrame, left_key: str, sub: DataFrame, sub_key: str
) -> DataFrame:
    """Null-aware NOT IN, decorrelated for scale.

    SQL's ``k NOT IN (SELECT x FROM s)`` is three-valued: if ``s``
    contains ANY NULL the predicate is never true (every comparison is
    UNKNOWN), and a NULL ``k`` never qualifies either.  A plain
    left-anti join implements neither rule — it would silently keep
    rows SQL drops.  This expansion restores both:

    * anti-join on the NON-NULL subquery values (the ∉ part; a NULL
      probe key never matches, so the anti-join passes it through to
      the guard below);
    * a broadcast 1-row guard carrying the subquery's null and total
      counts — any NULL in the subquery empties the result (SQL's
      trap), and a NULL probe key survives ONLY when the subquery is
      empty (the empty conjunction is TRUE, so even NULL qualifies).

    Plan: shuffled hash anti-join keyed by the probe column + one
    broadcast scalar — no nested loop at any cardinality (the
    null-aware anti-join Catalyst plans for literal ``NOT IN`` SQL is
    a BroadcastHashJoin variant limited to broadcastable subqueries;
    this form scales to non-broadcastable lists too).
    tests/test_skew_and_compat.py pins the NULL semantics against
    DuckDB on the null-free, has-null, and empty-list cases.

    Helper columns are collision-guarded (r11 review: a left relation
    carrying its own ``_niv``/``_n_nulls``/``_n_vals`` column used to
    make the join or guard filter ambiguous), the same contract as
    operators.skew's ``__salt``.
    """
    for col in ("__niv", "__niv_nulls", "__niv_vals"):
        if col in left.columns:
            raise ValueError(f"not_in_anti: left already has a {col} column")
    vals = sub.select(F.col(sub_key).alias("__niv"))
    guard = vals.agg(
        F.coalesce(
            F.sum(F.when(F.col("__niv").isNull(), 1).otherwise(0)), F.lit(0)
        ).alias("__niv_nulls"),
        F.count(F.lit(1)).alias("__niv_vals"),
    )
    return (
        left.join(
            vals.filter(F.col("__niv").isNotNull()),
            F.col(left_key) == F.col("__niv"),
            "left_anti",
        )
        .crossJoin(F.broadcast(guard))
        .filter(
            (F.col("__niv_nulls") == 0)
            & (F.col(left_key).isNotNull() | (F.col("__niv_vals") == 0))
        )
        .drop("__niv_nulls", "__niv_vals")
    )


@register(
    "q13b_not_in_null_aware",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE c.c_custkey NOT IN (
      SELECT CASE WHEN o.o_orderpriority IS NOT NULL THEN o.o_custkey END
      FROM orders o WHERE o.o_totalprice > 500000
    )
    """,
)
def q13b_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers outside the 500k+ big-spender set via NOT IN over a
    NULLABLE subquery expression — the null-aware anti-join complement
    of q13's NOT EXISTS (which sidesteps the NULL trap by
    construction).  The oracle runs literal SQL NOT IN; the Spark side
    is the :func:`not_in_anti` decorrelation, so the driver compare
    pins the three-valued semantics end-to-end."""
    t = load_tables(spark, sf_dir)
    sub = (
        t["orders"]
        .filter(F.col("o_totalprice") > 500000)
        .select(
            F.when(F.col("o_orderpriority").isNotNull(), F.col("o_custkey")).alias("k")
        )
    )
    return not_in_anti(t["customer"], "c_custkey", sub, "k").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q04e_grouping_sets",
    oracle="""
    SELECT r.r_name, c.c_mktsegment,
           CAST(GROUPING(r.r_name) * 2 + GROUPING(c.c_mktsegment) AS BIGINT) AS gid,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name, c.c_mktsegment), (r.r_name), ())
    """,
)
def q04e_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the arbitrary-subtotal generalization
    of q04c's ROLLUP / q04d's CUBE, with grouping_id disambiguating a
    real NULL group value from a subtotal row.  One Expand (3 sets)
    over one scan; the gid bitmask (left col = MSB) matches the
    oracle's GROUPING() composition exactly."""
    t = load_tables(spark, sf_dir)
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupingSets(
            [[F.col("r_name"), F.col("c_mktsegment")], [F.col("r_name")], []],
            "r_name",
            "c_mktsegment",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("o_orderkey").alias("n_orders"),
            round2(money_sum("o_totalprice")).alias("revenue"),
        )
        .select("r_name", "c_mktsegment", "gid", "n_orders", "revenue")
    )


@register(
    "q14_rolling_90d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate)
             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS spend_90d
    FROM orders
    """,
)
def q14_rolling_90d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-90-day spend per customer at every order — the RANGE
    window frame (value-based, not row-based: same-day orders all see
    the same trailing sum regardless of intra-day order).  The frame
    orders by an integer day ordinal, giving identical boundary
    semantics on both engines.  Scale: partitioned by custkey — frame
    state is per-customer and the window input is the raw orders
    relation, one shuffle."""
    t = load_tables(spark, sf_dir)
    day_ord = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_ord)
        .rangeBetween(-90, 0)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        round2(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w)).alias(
            "spend_90d"
        ),
    )


@register(
    "q15_spend_distribution",
    oracle="""
    WITH s AS (
      SELECT c.c_nationkey, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS spend_d
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    )
    SELECT c_nationkey, o_custkey,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM s
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY spend_d DESC, o_custkey)
    """,
)
def q15_spend_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend distribution per nation via the analytic trio
    NTILE / PERCENT_RANK / CUME_DIST (rank-family completion beyond
    RANK/DENSE_RANK/ROW_NUMBER).  The (spend, custkey) ordering is a
    unique key, so all three are deterministic; percent_rank and
    cume_dist are exact rationals computed identically by both
    engines.  Window input is the per-customer aggregate — already
    reduced before the sort."""
    t = load_tables(spark, sf_dir)
    s = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey", "o_custkey")
        .agg(money_sum("o_totalprice").alias("spend_d"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("spend_d").desc(), F.col("o_custkey")
    )
    return s.select(
        "c_nationkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q16_order_value_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS price,
           CAST(ROUND(CAST(LEAD(o_totalprice) OVER w AS DECIMAL(18,4)), 2) AS DOUBLE)
             AS next_price,
           CAST(ROUND(CAST(FIRST_VALUE(o_totalprice) OVER w AS DECIMAL(18,4)), 2)
             AS DOUBLE) AS first_price,
           CAST(ROUND(CAST(NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS DECIMAL(18,4)), 2) AS DOUBLE) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    """,
    # NULLS FIRST is explicit: Spark defaults ascending sorts to
    # NULLS FIRST, DuckDB to NULLS LAST — on a NULL-date corpus every
    # navigation function shifted (fuzz gate, r12).
)
def q16_order_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation-function completion (LEAD / FIRST_VALUE / NTH_VALUE
    — LAG's q07 counterparts) over each customer's order history.
    NTH_VALUE needs the full-partition frame (default frames stop at
    CURRENT ROW and would NULL rows before the 2nd); the (date,
    orderkey) ordering is a unique key so every value is
    deterministic.  One custkey Exchange; both window specs share the
    same sort order, so Spark plans a single Sort feeding both."""
    t = load_tables(spark, sf_dir)
    # asc_nulls_first matches Spark's default; spelled out because the
    # oracle must pin the same (DuckDB defaults to NULLS LAST)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_first(), "o_orderkey"
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # NOT named `money`: that would shadow functions.compat.money
    # (imported at module top) with different semantics (r11 review)
    rounded = lambda c: round2(c.cast("decimal(18,4)"))  # noqa: E731
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        rounded(F.col("o_totalprice")).alias("price"),
        rounded(F.lead("o_totalprice").over(w)).alias("next_price"),
        rounded(F.first("o_totalprice").over(w)).alias("first_price"),
        rounded(F.nth_value("o_totalprice", 2).over(w_full)).alias("second_price"),
    )


@register(
    "q17_top_spender_maxby",
    oracle="""
    WITH s AS (
      SELECT c.c_nationkey, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS spend_d
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    )
    SELECT c_nationkey,
           (ARRAY_AGG(o_custkey ORDER BY spend_d DESC, o_custkey ASC))[1] AS top_custkey,
           CAST(ROUND(MAX(spend_d), 2) AS DOUBLE) AS top_spend,
           (ARRAY_AGG(o_custkey ORDER BY spend_d ASC, o_custkey DESC))[1] AS bottom_custkey
    FROM s GROUP BY c_nationkey
    """,
)
def q17_top_spender_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top/bottom spender per nation via MAX_BY / MIN_BY — the
    hash-aggregate argmax that replaces a window top-1 (q06's shape)
    when only the extreme row is needed: map-side partial combine, no
    sort, no window state.  The (spend, -custkey) struct makes the
    argmax key unique, so results are deterministic on both engines."""
    t = load_tables(spark, sf_dir)
    s = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey", "o_custkey")
        .agg(money_sum("o_totalprice").alias("spend_d"))
    )
    return s.groupBy("c_nationkey").agg(
        F.expr("max_by(o_custkey, struct(spend_d, -o_custkey))").alias("top_custkey"),
        round2(F.max("spend_d")).alias("top_spend"),
        F.expr("min_by(o_custkey, struct(spend_d, -o_custkey))").alias("bottom_custkey"),
    )


@register(
    "q18_price_profile_arrays",
    oracle="""
    SELECT o_custkey,
           CAST(len(prices) AS INT) AS n_orders,
           CAST(ROUND(prices[1], 2) AS DOUBLE) AS cheapest,
           CAST(ROUND(prices[(len(prices) + 1) // 2], 2) AS DOUBLE) AS middle,
           CAST(ROUND(prices[-1], 2) AS DOUBLE) AS priciest
    FROM (
      SELECT o_custkey,
             list(CAST(o_totalprice AS DECIMAL(18,4)) ORDER BY o_totalprice, o_orderkey)
               AS prices
      FROM orders GROUP BY o_custkey
    )
    """,
)
def q18_price_profile_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-price profile via the array surface:
    collect_list → sort_array → element_at (first / lower-median /
    last).  collect_list is UNORDERED by contract — sort_array with an
    orderkey tie-break restores determinism (same trap s04's basket
    rewrite handles).  Lower-median indexing ``(n+1)/2`` is integer
    math, identical both engines.  One customer-keyed agg; array size
    = that customer's order count, bounded per group."""
    t = load_tables(spark, sf_dir)
    g = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("o_totalprice").cast("decimal(18,4)").alias("p"),
                        F.col("o_orderkey").alias("k"),
                    )
                )
            ).alias("pk")
        )
        .select("o_custkey", F.expr("transform(pk, x -> x.p)").alias("prices"))
    )
    n = F.size("prices")
    return g.select(
        "o_custkey",
        n.alias("n_orders"),
        round2(F.element_at("prices", 1)).alias("cheapest"),
        round2(
            F.expr("element_at(prices, CAST((size(prices) + 1) div 2 AS INT))")
        ).alias("middle"),
        round2(F.element_at("prices", -1)).alias("priciest"),
    )


# ---------------------------------------------------------------------------
# q20 — statistical profile via exact decimal moments (r3)
# ---------------------------------------------------------------------------


@register(
    "q20_stats_profile",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey
    ), m AS (
      -- DECIMAL(19,2) operands: money is 2dp, so every product has
      -- <= 4 fractional digits and both engines' multiply results
      -- (Spark (38,4), DuckDB (38,4)) hold it EXACTLY; width 19 also
      -- pushes DuckDB off int64 storage, whose 18-digit multiply
      -- overflows.
      SELECT c.c_mktsegment,
             COUNT(*) AS n,
             SUM(CAST(o.o_totalprice AS DECIMAL(19,2))) AS sx,
             SUM(CAST(o.o_totalprice AS DECIMAL(19,2))
                 * CAST(o.o_totalprice AS DECIMAL(19,2))) AS sx2,
             SUM(li.n_items) AS sy,
             SUM(li.n_items * li.n_items) AS sy2,
             SUM(CAST(o.o_totalprice AS DECIMAL(19,2))
                 * CAST(li.n_items AS DECIMAL(10,0))) AS sxy
      FROM orders o
      JOIN li ON o.o_orderkey = li.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    )
    SELECT c_mktsegment, n,
           ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 2) AS avg_value,
           ROUND(sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 4)
             AS std_value,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS corr_value_items
    FROM m
    """,
)
def q20_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment mean / sample-stddev of order value and its
    correlation with basket size — computed from EXACT DECIMAL moments
    (sum, sum of squares, cross sum), with the double arithmetic
    applied only to the final closed-form expressions.

    Spark's built-in ``stddev_samp``/``corr`` accumulate in floating
    point, so their low digits depend on partition order and differ
    run-to-run and engine-to-engine; the moments are exact integers/
    decimals under any partitioning, the derived doubles are
    bit-identical to the oracle's, and at scale this is also the
    cheaper plan: one pass, three extra SUM columns, no second
    aggregation.  (Same discipline as the money pipeline: exact until
    the last projection.)
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    x = F.col("o_totalprice").cast("decimal(19,2)")
    yd = F.col("n_items").cast("decimal(10,0)")
    m = (
        t["orders"]
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(x * x).alias("sx2"),
            F.sum("n_items").alias("sy"),
            F.sum(F.col("n_items") * F.col("n_items")).alias("sy2"),
            F.sum(x * yd).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx, sx2 = F.col("sx").cast("double"), F.col("sx2").cast("double")
    sy, sy2 = F.col("sy").cast("double"), F.col("sy2").cast("double")
    sxy = F.col("sxy").cast("double")
    var_num = nd * sx2 - sx * sx
    return m.select(
        "c_mktsegment",
        "n",
        F.round(sx / nd, 2).alias("avg_value"),
        F.round(F.sqrt(var_num / (nd * (nd - F.lit(1.0)))), 4).alias("std_value"),
        F.round(
            (nd * sxy - sx * sy)
            / (F.sqrt(var_num) * F.sqrt(nd * sy2 - sy * sy)),
            6,
        ).alias("corr_value_items"),
    )


@register(
    "ev_unpivot_user_types",
    oracle="""
    SELECT u.user_id, t.event_type, COALESCE(c.n, 0) AS n_events
    FROM (SELECT DISTINCT user_id FROM events) u
    CROSS JOIN (SELECT unnest(['{types}']) AS event_type) t
    LEFT JOIN (
      SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
    ) c ON c.user_id IS NOT DISTINCT FROM u.user_id
       AND c.event_type = t.event_type
    """.replace("{types}", "', '".join(EVENT_TYPES)),
    # join is null-safe on user_id: a NULL user is a real pivot group
    # (Spark's groupBy keeps it), and the plain equi-join zeroed its
    # counts on NULL-bearing corpora (fuzz gate, r12).
)
def ev_unpivot_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide per-user event-count matrix
    (ev_pivot_user_types) folded back to long form via DataFrame
    ``unpivot`` — one row per (user, type) including zero cells, so
    pivot→unpivot is a lossless round trip.  Plan: unpivot is an
    Expand (5 projections, one per value column) over the pivoted
    aggregate — a narrow map, no extra shuffle beyond the pivot's
    own aggregation."""
    wide = ev_pivot_user_types(spark, sf_dir)
    return (
        wide.unpivot(
            ["user_id"],
            [f"n_{t}" for t in EVENT_TYPES],
            "event_type",
            "n_events",
        )
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
        .select("user_id", "event_type", F.col("n_events").cast("long"))
    )
