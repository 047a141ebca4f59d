"""Extended TPC-H query shapes over the driver's slimmed tables.

Round-1 tpch.py covers Q1/Q3/Q4/Q6/Q14; this module widens the relational
plan-shape surface with the remaining classic patterns expressible on the
slimmed schema (no partsupp / comment / shipmode columns — filters are
adapted, shapes preserved):

- Q5  : multi-way join with a two-dim equality constraint (local supplier)
- Q7  : fact joined to the same dim twice (supplier nation x customer nation)
- Q10 : returned-item top-20 customer report (join + agg + total-order topK)
- Q13 : LEFT OUTER join with a join-residual filter + double aggregation
- Q15 : aggregate-equals-MAX-of-aggregate (top supplier view)
- Q17 : correlated per-key average threshold (join against per-part agg)
- Q18 : IN (GROUP BY ... HAVING) large-volume orders
- Q19 : OR-of-ANDs disjunctive join predicate (pushdown stress)
- Q22 : scalar-subquery threshold + NOT EXISTS anti join (idle customers)

All money aggregates accumulate in DECIMAL (functions/exact.py) and the
scalar float math is term-for-term identical with the DuckDB twin, so
every query here is bit-identical cross-engine and oracle-checkable.

Reference parity: the reference's relational surface is the SQL its
dashboard/pipeline issue (see SURVEY.md §2 J/A families; e.g.
containers/spark-etl/streaming_etl.py:90-175 for its join+agg patterns);
these queries prove the same operator families compose at TPC-H shape
complexity on an idiomatic Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banking_streaming_etl_spark import datamodel
from banking_streaming_etl_spark.functions import exact
from banking_streaming_etl_spark.plans.tpch import LATE_SHIP_DAYS

_DEC_PRICE = "decimal(12,2)"
_DEC_RATE = "decimal(8,2)"


def _rev() -> F.Column:
    """extendedprice * (1 - discount), accumulated exactly in DECIMAL."""
    price = F.col("l_extendedprice").cast(_DEC_PRICE)
    disc = F.col("l_discount").cast(_DEC_RATE)
    one = F.lit(1).cast(_DEC_RATE)
    return price * (one - disc)


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))"
)


# --- Q5: local-supplier revenue ---------------------------------------------

Q5_RANGE = ("1996-01-01", "1997-01-01")


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 proper: lineitem ⋈ orders ⋈ customer ⋈ supplier with the
    customer-and-supplier-share-a-nation equality, dims broadcast, region
    filter pruning nations before the fact join. The two-key constraint
    (l_suppkey = s_suppkey AND c_nationkey = s_nationkey) rides the same
    shuffle as the supplier join — no extra exchange."""
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    o = datamodel.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_RANGE[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_RANGE[1]).cast("timestamp"))
    )
    c = datamodel.load_table(spark, sf_dir, "customer")
    s = datamodel.load_table(spark, sf_dir, "supplier")
    n = datamodel.load_table(spark, sf_dir, "nation")
    r = datamodel.load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q5_SQL = f"""
SELECT n_name AS nation_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '{Q5_RANGE[0]} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q5_RANGE[1]} 00:00:00'
GROUP BY n_name
"""


# --- Q7: volume shipping between nation pairs --------------------------------

Q7_YEARS = ("1996-01-01", "1998-01-01")


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the nation dim joined TWICE under different roles
    (supplier nation vs customer nation) — Catalyst must alias the
    relation, both sides broadcast. Grouped by the (supp, cust, year)
    triple; unlike stock Q7 no nation-pair filter (the slimmed supplier
    table is tiny, a pair filter would zero out small sf)."""
    li = datamodel.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q7_YEARS[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_YEARS[1]).cast("timestamp"))
    )
    o = datamodel.load_table(spark, sf_dir, "orders")
    c = datamodel.load_table(spark, sf_dir, "customer")
    s = datamodel.load_table(spark, sf_dir, "supplier")
    n1 = (
        datamodel.load_table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        datamodel.load_table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_YEARS[0]} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q7_YEARS[1]} 00:00:00'
GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
"""


# --- Q10: returned-item report ------------------------------------------------

Q10_QUARTER = ("1996-01-01", "1996-07-01")
Q10_K = 20


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned merchandise in a half-year — fact-fact
    join + customer/nation dims, revenue per customer, top-20 by lost
    revenue. The limit compiles to TakeOrderedAndProject with the custkey
    tiebreak making the cut deterministic."""
    li = datamodel.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = datamodel.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_QUARTER[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_QUARTER[1]).cast("timestamp"))
    )
    c = datamodel.load_table(spark, sf_dir, "customer")
    n = datamodel.load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(Q10_K)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name AS nation_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_QUARTER[0]} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q10_QUARTER[1]} 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT {Q10_K}
"""


# --- Q13: customer order-count distribution ----------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with a residual predicate ON the
    join (priority filter must NOT drop order-less customers, so it cannot
    be a WHERE), then a double aggregation — count orders per customer,
    then count customers per order-count. Zero-order customers land in the
    c_count=0 bucket, which a plain inner join would silently lose."""
    c = datamodel.load_table(spark, sf_dir, "customer").select("c_custkey")
    o = datamodel.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) per_cust
GROUP BY c_count
"""


# --- Q15: top supplier ---------------------------------------------------------

Q15_QUARTER = ("1996-01-01", "1996-04-01")


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view per supplier, then keep the rows whose
    aggregate EQUALS the max of that same aggregate. The max is a SCALAR
    aggregate of the per-supplier frame broadcast back over it (round-5
    fix: the previous unpartitioned window dragged the supplier-sized
    frame onto one task; the broadcast scalar costs one extra exchange of
    ONE row and keeps every stage parallel). Spark dedups the shared
    per-supplier aggregate subtree via ReusedExchange, so the fact table
    is still scanned exactly once — pinned by test_q15_scans_lineitem_once.
    Equality on a double is safe here because both sides come from the
    identical DECIMAL-accumulated value."""
    # the explicit isnotnull mirrors the null-filter the supplier join
    # infers on the OTHER branch — without it the two per-supplier
    # aggregate subtrees canonicalize differently and the shuffle is not
    # reused (= a second fact scan)
    li = datamodel.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_QUARTER[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_QUARTER[1]).cast("timestamp"))
        & F.col("l_suppkey").isNotNull()
    )
    s = datamodel.load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_rev()).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH rev AS (
    SELECT l_suppkey, CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q15_QUARTER[0]} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{Q15_QUARTER[1]} 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


# --- Q17: small-quantity-order revenue ----------------------------------------

Q17_BRAND = "Brand#13"


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average — lines whose quantity
    is under 20% of their part's average quantity. The correlated scalar
    subquery becomes a join against a per-partkey aggregate (computed over
    the FULL lineitem, as in stock Q17); the brand filter prunes the part
    side before the join. Threshold math (0.2 * sum/count) is term-for-term
    identical with the oracle so the float comparison is bit-exact."""
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    p = datamodel.load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == Q17_BRAND
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.sum(F.round(F.col("l_quantity"), 6).cast(exact.DEC))
        .cast("double")
        .alias("sq"),
        F.count("l_quantity").cast("double").alias("cnt"),
    )
    avg_qty = F.lit(0.2) * (F.col("sq") / F.col("cnt"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < avg_qty)
        .agg(
            (
                F.sum(
                    F.col("l_extendedprice").cast(_DEC_PRICE)
                ).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


Q17_SQL = f"""
WITH per_part AS (
    SELECT l_partkey AS pa_partkey,
           CAST(SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sq,
           CAST(COUNT(l_quantity) AS DOUBLE) AS cnt
    FROM lineitem
    GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pa_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < 0.2 * (sq / cnt)
"""


# --- Q18: large-volume customers ----------------------------------------------

Q18_MIN_QTY = 250
Q18_K = 100


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a HAVING
    threshold, joined back to orders+customer. The quantity sum is compared
    in DECIMAL (exact), so the qualifying set is engine-independent; the
    top-100 is ordered by (o_totalprice DESC, o_orderkey) — a total order."""
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    o = datamodel.load_table(spark, sf_dir, "orders")
    c = datamodel.load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_orderkey"))
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC_PRICE)).alias("qty_dec")
        )
        .filter(F.col("qty_dec") > F.lit(Q18_MIN_QTY).cast(_DEC_PRICE))
    )
    return (
        big.join(o, F.col("big_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(Q18_K)
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(qty_dec AS DOUBLE) AS total_qty
FROM (
    SELECT l_orderkey AS big_orderkey,
           SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2)))
             > CAST({Q18_MIN_QTY} AS DECIMAL(12,2))
) big
JOIN orders   ON big_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT {Q18_K}
"""


# --- Q19: disjunctive predicate revenue ---------------------------------------


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate mixing part attributes and
    lineitem attributes — the optimizer's predicate-pushdown stress test
    (the common `l_partkey = p_partkey` stays the equi-join key; the
    disjunction is a join residual, never a cartesian)."""
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    p = datamodel.load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    cond = (
        ((brand == "Brand#13") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#2") & size.between(1, 25) & qty.between(10, 20))
        | ((brand == "Brand#23") & size.between(1, 35) & qty.between(20, 30))
    )
    return j.filter(cond).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


Q19_SQL = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 25
         AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
         AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q22: idle high-balance customers -----------------------------------------

Q22_RECENT = "1999-01-01"


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers whose balance beats the positive-balance
    average (scalar subquery → 1-row broadcast) and who placed no order
    since {Q22_RECENT} (NOT EXISTS → left-anti join), rolled up per nation.
    The average is DECIMAL-accumulated so the threshold comparison is
    bit-exact cross-engine."""
    c = datamodel.load_table(spark, sf_dir, "customer")
    n = datamodel.load_table(spark, sf_dir, "nation")
    o_recent = datamodel.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_RECENT).cast("timestamp")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(exact.exact_avg("c_acctbal", "avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_recent, c.c_custkey == o_recent.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_custs"),
            exact.exact_sum("c_acctbal", "total_acctbal"),
        )
    )


Q22_SQL = f"""
SELECT n_name AS nation_name,
       COUNT(*) AS n_custs,
       {exact.sql_sum('c_acctbal', 'total_acctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
        SELECT {exact.sql_avg('c_acctbal', 'avg_bal').replace(' AS avg_bal', '')}
        FROM customer WHERE c_acctbal > 0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '{Q22_RECENT} 00:00:00'
      )
GROUP BY n_name
"""


# --- Q8: market share ----------------------------------------------------------

Q8_NATION = "NATION_13"
Q8_RANGE = ("1996-01-01", "1998-01-01")


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue per year —
    a 6-way join (fact + orders + customer + part + supplier + nation x2
    roles + region) feeding a conditional-ratio aggregate. Both CASE
    branches accumulate in the same DECIMAL so the final double division
    is bit-identical cross-engine."""
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    o = datamodel.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q8_RANGE[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_RANGE[1]).cast("timestamp"))
    )
    c = datamodel.load_table(spark, sf_dir, "customer")
    s = datamodel.load_table(spark, sf_dir, "supplier")
    p = datamodel.load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    n_cust = datamodel.load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    n_supp = datamodel.load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = datamodel.load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    rev = _rev()
    national = F.when(
        F.col("supp_nation") == Q8_NATION, rev
    ).otherwise(F.lit(0).cast("decimal(21,4)"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(national).cast("double").alias("national_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .select(
            "o_year",
            "national_revenue",
            "total_revenue",
            (F.col("national_revenue") / F.col("total_revenue")).alias(
                "mkt_share"
            ),
        )
    )


Q8_SQL = f"""
WITH agg AS (
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = '{Q8_NATION}' THEN {_REV_SQL}
                    ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE)
               AS national_revenue,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN part      ON l_partkey = p_partkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '{Q8_RANGE[0]} 00:00:00'
      AND o_orderdate <  TIMESTAMP '{Q8_RANGE[1]} 00:00:00'
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
)
SELECT o_year, national_revenue, total_revenue,
       national_revenue / total_revenue AS mkt_share
FROM agg
"""


# --- Q9: product-type profit ---------------------------------------------------

Q9_NAME_PAT = "%widget%"


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year with a LIKE
    filter on part name. The slimmed schema has no partsupp, so profit is
    revenue minus retail cost (p_retailprice * quantity) — same join
    graph and agg shape, all terms DECIMAL-exact."""
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    o = datamodel.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    s = datamodel.load_table(spark, sf_dir, "supplier")
    p = datamodel.load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(Q9_NAME_PAT)
    )
    n = datamodel.load_table(spark, sf_dir, "nation")
    cost = F.col("p_retailprice").cast(_DEC_PRICE) * F.col(
        "l_quantity"
    ).cast(_DEC_PRICE)
    amount = _rev() - cost
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation_name,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_REV_SQL}
                - CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '{Q9_NAME_PAT}'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
"""


# --- Q11: concentrated supplier balances --------------------------------------

Q11_FRACTION = 0.05


def q11_concentrated_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: GROUP BY ... HAVING sum > fraction * (scalar
    subquery over the same table). The global total is a 1-row broadcast
    joined back; both sums accumulate in DECIMAL so the HAVING threshold
    compares identical doubles. (partsupp-free adaptation: supplier
    account balances per nation.)"""
    s = datamodel.load_table(spark, sf_dir, "supplier")
    n = datamodel.load_table(spark, sf_dir, "nation")
    total = s.agg(exact.exact_sum("s_acctbal", "grand_total"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            exact.exact_sum("s_acctbal", "value"),
            F.count("*").alias("n_suppliers"),
        )
        .crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.lit(Q11_FRACTION) * F.col("grand_total"))
        .select("nation_name", "value", "n_suppliers")
    )


Q11_SQL = f"""
SELECT n_name AS nation_name,
       {exact.sql_sum('s_acctbal', 'value')},
       COUNT(*) AS n_suppliers
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING CAST(SUM(CAST(ROUND(s_acctbal, 6) AS DECIMAL(28,6))) AS DOUBLE)
         > {Q11_FRACTION} * (
             SELECT CAST(SUM(CAST(ROUND(s_acctbal, 6) AS DECIMAL(28,6)))
                         AS DOUBLE)
             FROM supplier
           )
"""


# --- Q12: late-line priority counts -------------------------------------------

Q12_LATE_DAYS = 60


def q12_late_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join with an inequality residual
    (shipped > orderdate + 60 days stands in for the missing
    receipt/commit dates) feeding per-group conditional counts of urgent
    vs non-urgent order priorities."""
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    o = datamodel.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY l_returnflag
"""


# --- Q16: supplier-count by part attribute ------------------------------------

Q16_EXCL_BRAND = "Brand#13"
Q16_SIZES = (1, 5, 10, 15, 20, 25)
Q16_MIN_ACCTBAL = 2000.0


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute with a
    NOT IN exclusion subquery (low-balance suppliers stand in for the
    missing complaint-comment filter). The NOT IN becomes a left-anti
    join against a broadcast-sized exclusion set; supplier-part pairs
    come from lineitem (no partsupp in the slimmed schema)."""
    li = datamodel.load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    p = datamodel.load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    excluded = (
        datamodel.load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < Q16_MIN_ACCTBAL)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_MIN_ACCTBAL}
      )
GROUP BY p_brand, p_type, p_size
"""


# --- Q21: suppliers who kept orders waiting -----------------------------------

Q21_K = 100


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS + NOT-EXISTS double correlation — count,
    per supplier, finalized multi-supplier orders where ONLY that
    supplier's line shipped late. EXISTS(another supplier's line on the
    order) compiles to a left-semi join, NOT EXISTS(another supplier's
    LATE line) to a left-anti join, both on the order key with the
    supplier-inequality residual."""
    o = datamodel.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = datamodel.load_table(spark, sf_dir, "lineitem")
    s = datamodel.load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {LATE_SHIP_DAYS} DAYS"
    )
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey"))
            & (
                F.col("l3_shipdate")
                > F.col("o_orderdate")
                + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAYS")
            ),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_K)
    )


Q21_SQL = f"""
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
      )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT {Q21_K}
"""


# --- Q2: minimum-cost supplier ------------------------------------------------

Q2_REGION = "EUROPE"
Q2_MAX_SIZE = 15
Q2_TYPE = "PROMO"
Q2_K = 100


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery (supply cost equals the
    regional MIN for that part) over a 4-way dim join, top-100 by a total
    order.  The slimmed schema has no partsupp, so the supply relation is
    derived: per (part, supplier) the minimum observed unit price in
    lineitem (MIN of an IEEE division — order-independent, so it is
    bit-identical cross-engine).  The supply aggregate is explicitly
    repartitioned on l_partkey alone — that partitioning satisfies the
    (partkey, suppkey) grouping AND the correlated-MIN window's
    partitionBy(partkey), so the whole query runs on ONE hash exchange
    (plan-pinned) with no self-join re-scan of the supply relation.

    Reference parity: joins-against-aggregate is the reference dashboard's
    J7/J8 family (SURVEY.md §2.4); this is the same shape at TPC-H
    complexity with the correlated-equality wrinkle.
    """
    from pyspark.sql.window import Window

    li = datamodel.load_table(spark, sf_dir, "lineitem")
    supply = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supply_cost"
            )
        )
    )
    s = datamodel.load_table(spark, sf_dir, "supplier")
    n = datamodel.load_table(spark, sf_dir, "nation")
    r = datamodel.load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q2_REGION
    )
    p = datamodel.load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= Q2_MAX_SIZE) & (F.col("p_type") == Q2_TYPE)
    )
    eu = (
        supply.join(F.broadcast(s), supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("l_partkey")
    return (
        eu.join(F.broadcast(p), eu.l_partkey == p.p_partkey)
        .withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation_name"),
            "p_partkey",
            "p_name",
            "supply_cost",
            "s_suppkey",
        )
        .orderBy(
            F.desc("s_acctbal"),
            F.asc("nation_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
            F.asc("s_suppkey"),
        )
        .limit(Q2_K)
    )


Q2_SQL = f"""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT supply.*, s_name, s_acctbal, s_suppkey, n_name
  FROM supply
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
)
SELECT s_acctbal, s_name, n_name AS nation_name, p_partkey, p_name,
       supply_cost, s_suppkey
FROM eu
JOIN part ON l_partkey = p_partkey
WHERE p_size <= {Q2_MAX_SIZE}
  AND p_type = '{Q2_TYPE}'
  AND supply_cost = (
        SELECT MIN(e2.supply_cost) FROM eu e2
        WHERE e2.l_partkey = eu.l_partkey
      )
ORDER BY s_acctbal DESC, nation_name ASC, s_name ASC, p_partkey ASC,
         s_suppkey ASC
LIMIT {Q2_K}
"""


# --- Q20: potential part promotion --------------------------------------------

Q20_NAME_LIKE = "%bolt"
Q20_YEAR = ("1997-01-01", "1998-01-01")


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subquery chain — suppliers (in a region)
    who, for some promo-named part, shipped more of it inside the promo
    year than half their all-time volume of that part.  partsupp's
    availqty threshold is re-derived from lineitem: the correlated
    `> 0.5 * SUM(l_quantity)` becomes a join of two per-(part,supplier)
    aggregates.  Quantities accumulate in DECIMAL and the half-threshold
    is the integer-doubling form (2*q_year > q_all) so the comparison is
    exact — no float 0.5 multiply to drift cross-engine.

    The part-name filter is pushed below both aggregates (semi join on the
    broadcast promo-part set before any shuffle), so the heavy groupBy
    only sees promo-part lines.
    """
    qty = F.col("l_quantity").cast(_DEC_PRICE)
    p = (
        datamodel.load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(Q20_NAME_LIKE))
        .select("p_partkey")
    )
    li = datamodel.load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    q_all = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).alias("qty_all")
    )
    q_year = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q20_YEAR[0]).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_YEAR[1]).cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("y_partkey"),
            F.col("l_suppkey").alias("y_suppkey"),
        )
        .agg(F.sum(qty).alias("qty_year"))
    )
    hot = (
        q_all.join(
            q_year,
            (F.col("l_partkey") == F.col("y_partkey"))
            & (F.col("l_suppkey") == F.col("y_suppkey")),
        )
        .filter(F.lit(2).cast(_DEC_PRICE) * F.col("qty_year") > F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    s = datamodel.load_table(spark, sf_dir, "supplier")
    n = datamodel.load_table(spark, sf_dir, "nation")
    r = datamodel.load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q2_REGION
    )
    return (
        s.join(hot, s.s_suppkey == hot.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_name", F.col("n_name").alias("nation_name"), "s_acctbal")
        .orderBy(F.asc("s_name"))
    )


Q20_SQL = f"""
WITH promo_lines AS (
  SELECT l_partkey, l_suppkey, l_quantity, l_shipdate
  FROM lineitem
  WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_LIKE}'
        )
), q_all AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_all
  FROM promo_lines GROUP BY l_partkey, l_suppkey
), q_year AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_year
  FROM promo_lines
  WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR[0]} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q20_YEAR[1]} 00:00:00'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, n_name AS nation_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q2_REGION}'
  AND s_suppkey IN (
        SELECT q_all.l_suppkey
        FROM q_all JOIN q_year
          ON q_all.l_partkey = q_year.l_partkey
         AND q_all.l_suppkey = q_year.l_suppkey
        WHERE CAST(2 AS DECIMAL(12,2)) * qty_year > qty_all
      )
ORDER BY s_name ASC
"""
