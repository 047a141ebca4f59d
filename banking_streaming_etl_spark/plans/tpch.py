"""Headline relational queries over the driver's TPC-H-ish tables.

These exercise the heavy relational operator families at scale: multi-agg
hash aggregation (SURVEY.md A1), multi-way dimension joins (J1-J6), and a
wide fact scan with predicate pushdown (P1-P7). Aggregates accumulate in
DECIMAL (functions/exact.py) so results are order-independent and
bit-identical with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banking_streaming_etl_spark import datamodel
from banking_streaming_etl_spark.functions import exact

Q1_CUTOFF = "1998-09-02"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate over the biggest table.

    Plan: parquet scan with the shipdate predicate pushed down, partial
    hash aggregate map-side, single shuffle on (returnflag, linestatus)
    — 6 groups, so the final agg is trivially small at any scale.
    """
    li = datamodel.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    tax = F.col("l_tax").cast("decimal(8,2)")
    one = F.lit(1).cast("decimal(8,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
        exact.exact_avg("l_quantity", "avg_qty"),
        exact.exact_avg("l_extendedprice", "avg_price"),
        exact.exact_avg("l_discount", "avg_disc"),
        F.count("*").alias("count_order"),
    )


Q1_SQL = f"""
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE)
        AS sum_disc_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))
        * (CAST(1 AS DECIMAL(8,2)) + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE)
        AS sum_charge,
    {exact.sql_avg('l_quantity', 'avg_qty')},
    {exact.sql_avg('l_extendedprice', 'avg_price')},
    {exact.sql_avg('l_discount', 'avg_disc')},
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact-fact join -> agg ->
    top-K by revenue. The mktsegment filter prunes customers before the
    join (predicate pushdown), revenue accumulates in DECIMAL, and the
    top-10 is a TakeOrderedAndProject with a total order."""
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    o = datamodel.load_table(spark, sf_dir, "orders")
    c = datamodel.load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-01-01").cast("timestamp")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    one = F.lit(1).cast("decimal(8,2)")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(o.filter(F.col("o_orderdate") < cutoff), li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2))))
           AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND l_shipdate > TIMESTAMP '1998-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, every predicate pushed
    to the parquet scan — the pushdown litmus test."""
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price * disc).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def order_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join enrichment (J1-J3 shape on the batch fact): orders ⋈
    customer ⋈ nation ⋈ region. nation/region broadcast at any scale;
    customer broadcasts while it fits, else AQE shuffles on the key."""
    o = datamodel.load_table(spark, sf_dir, "orders")
    c = datamodel.load_table(spark, sf_dir, "customer")
    n = datamodel.load_table(spark, sf_dir, "nation")
    r = datamodel.load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "c_name",
            "c_mktsegment",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


ORDER_ENRICHMENT_SQL = """
SELECT
    o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    c_name, c_mktsegment,
    n_name AS nation_name,
    r_name AS region_name
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation   ON c_nationkey = n_nationkey
LEFT JOIN region   ON n_regionkey = r_regionkey
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact-fact join (lineitem ⋈ orders) + dims + agg.
    The one genuinely big shuffle in the suite — lineitem ⋈ orders on
    o_orderkey (sort-merge at scale; AQE may pick shuffled-hash); dims
    broadcast. Revenue accumulates in DECIMAL for oracle parity."""
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    o = datamodel.load_table(spark, sf_dir, "orders")
    c = datamodel.load_table(spark, sf_dir, "customer")
    n = datamodel.load_table(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    one = F.lit(1).cast("decimal(8,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(price * (one - disc)).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


REVENUE_BY_NATION_SQL = """
SELECT
    n_name AS nation_name,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE)
        AS revenue,
    COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


LATE_SHIP_DAYS = 60


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — count orders per priority that
    have at least one late-shipped line (shipdate > orderdate + 60 days;
    adapted to this dataset's slimmed lineitem, which carries no
    commit/receipt dates). Catalyst plans the EXISTS as a LEFT SEMI join
    on l_orderkey with the inequality as a join residual: one shuffle on
    the order key, no de-dup pass needed, 5 output groups."""
    o = datamodel.load_table(spark, sf_dir, "orders")
    li = datamodel.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


Q4_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
)
GROUP BY o_orderpriority
"""


Q14_MONTH = ("1995-09-01", "1995-10-01")


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact ⋈ dimension with a global conditional-ratio
    aggregate — promo revenue share for one shipping month. The month
    predicate pushes to the lineitem scan; the part join shuffles on
    partkey at scale (AQE may broadcast at small sf); both CASE branches
    accumulate in the same DECIMAL so the final double division is
    bit-identical cross-engine."""
    li = datamodel.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_MONTH[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_MONTH[1]).cast("timestamp"))
    )
    p = datamodel.load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type"
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    one = F.lit(1).cast("decimal(8,2)")
    rev = price * (one - disc)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(21,4)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            (
                F.lit(100.0)
                * F.col("promo_revenue")
                / F.col("total_revenue")
            ).alias("promo_pct"),
        )
    )


Q14_SQL = f"""
WITH agg AS (
    SELECT
        CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))
                 ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE) AS promo_revenue,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2))))
             AS DOUBLE) AS total_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{Q14_MONTH[0]} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{Q14_MONTH[1]} 00:00:00'
)
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_pct
FROM agg
"""
