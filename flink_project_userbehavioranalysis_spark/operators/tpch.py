"""TPC-H breadth, wave 2: the join/subquery physical shapes the wave-1
set (q1/q3/q5/q6/q13/q18 in ``relational.py``) does not exercise —
semi-join EXISTS (Q4), top-k over a 3-way fact join (Q10), conditional
aggregation (Q12), single-row percentage aggregate (Q14), scalar
per-group subquery re-join (Q17), disjunctive OR-of-ANDs predicates
(Q19), and anti-join + global scalar filter (Q22).

Reference mapping (SURVEY.md §2, all [U] — checkout empty): the
reference project has no TPC-H suite; these are engine-sanity shapes
in the spirit of BASELINE.md's ``tpch_q1ish``, adapted to the driver
testdata's reduced columns (no l_commitdate/l_receiptdate/l_shipmode,
no partsupp table, no c_phone):

- Q4's "commit < receipt" late test  → ``l_shipdate > o_orderdate +
  60 days`` (same EXISTS-per-order shape, different predicate);
- Q12's shipmode grouping            → ``l_linestatus``;
- Q14's ``p_type LIKE 'PROMO%'``     → ``p_type = 'PROMO'`` (the
  testdata generator emits bare categories);
- Q17's Brand#23 + MED BOX filter    → brand filter only;
- Q22's phone-prefix country grouping → ``c_mktsegment``.

Scale posture (the per-query docstrings carry the details): every
query is equi-join + partial-aggregated shuffle; the only forced
broadcasts are provably SF-invariant sides (a single scalar row);
top-k is always TakeOrderedAndProject, never a global sort; money
math is exact DECIMAL so partial-agg order cannot wobble a cent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_project_userbehavioranalysis_spark.functions import money
from flink_project_userbehavioranalysis_spark.io import load_table

# ------------------------------------------------------------------ Q4


def tpch_q4ish(spark: SparkSession, sf_dir: str, late_days: int = 60) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): count orders per
    priority that have AT LEAST ONE late line — the canonical
    EXISTS-subquery → LEFT SEMI join pattern.

    The reduced schema has no commit/receipt dates, so "late" is a
    line shipped more than ``late_days`` days after the order date —
    a predicate that, like the original, references BOTH sides and so
    rides the semi-join as a residual condition on top of the
    ``l_orderkey = o_orderkey`` equi-key.

    Scale shape: semi-join on the order key — one shuffle of each
    fact, no duplication of orders no matter how many late lines an
    order has (the semi short-circuits on first match; a plain
    join+distinct would multiply then dedup). The quarter filter is
    pushed to the orders scan; the final priority rollup is a
    partial-aggregated shuffle over ≤5 groups.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAY")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def tpch_q4ish_oracle_sql(late_days: int = 60) -> str:
    return f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL {int(late_days)} DAY)
GROUP BY 1
"""


# ------------------------------------------------------------------ Q10


def tpch_q10ish(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top-``k`` customers
    by revenue lost to returns in one quarter — a customer ⋈ orders ⋈
    lineitem three-way join, revenue rollup per customer, then top-k.

    Scale shape: the returnflag filter prunes lineitem AT THE SCAN
    (PushedFilters) to ~1/3, the quarter filter prunes orders; the two
    facts meet in one order-key shuffle, customers join size-based on
    the customer key (SF-proportional — no broadcast hint, AQE
    decides). Revenue is a partial-aggregated shuffle per customer;
    top-k is TakeOrderedAndProject (per-partition heaps + driver merge
    of k rows), never a global sort. ``c_custkey`` tie-break makes the
    cut deterministic for the oracle hash.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    revenue = F.sum(
        money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - money("l_discount"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def tpch_q10ish_oracle_sql(k: int = 20) -> str:
    return f"""
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT {int(k)}
"""


# ------------------------------------------------------------------ Q12


def tpch_q12ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority audit (TPC-H Q12 shape): per line-status (the
    reduced schema's stand-in for shipmode), how many shipped lines in
    1997 belong to high-priority vs low-priority orders — the
    join-then-CASE-conditional-aggregation pattern.

    Scale shape: the year filter prunes lineitem at the scan and the
    projection carries exactly three columns into the join; the two
    facts meet in one order-key shuffle; the CASE sums are map-side
    partial aggregates over ≤3 groups, so the final exchange moves a
    handful of rows. Counting in ``sum(CASE…1…0)`` (not two filtered
    joins) reads each fact ONCE.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(F.lit(1) - high).alias("low_line_count"),
        )
    )


TPCH_Q12ISH_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# ------------------------------------------------------------------ Q14


def tpch_q14ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): promo revenue as a
    percentage of all revenue for one month — the single-row
    conditional-percentage aggregate over a fact ⋈ dimension join.

    Scale shape: the month filter prunes lineitem at the scan; part
    is an SF-proportional dimension joined size-based on the part key
    (AQE broadcasts the slice when it measures small). Both sums are
    exact DECIMAL partial aggregates riding ONE pass over the joined
    rows; the single global row means the final exchange carries one
    partial per task. The division happens once, on exact inputs cast
    to DOUBLE — deterministic, oracle-identical.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = money("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - money("l_discount")
    )
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("decimal(22,4)"))).alias("promo"),
        F.sum(disc).alias("total"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo").cast("double") / F.col("total").cast("double")).alias("promo_revenue_pct")
    )


TPCH_Q14ISH_SQL = """
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
     / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# ------------------------------------------------------------------ Q17


def tpch_q17ish(spark: SparkSession, sf_dir: str, brand: str = "Brand#4") -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): average yearly
    revenue lost if small orders (below 20% of a part's mean order
    quantity) were not filled — the correlated per-group scalar
    subquery, decorrelated into an aggregate-then-rejoin.

    Scale shape: the brand filter prunes part to ~1/25 and the
    per-part quantity mean aggregates ONLY lineitems of those parts
    (semi via the inner join) — one partial-aggregated shuffle on the
    part key; the threshold re-join lands on the SAME part-key
    clustering, so AQE reuses the exchange or broadcasts the tiny
    aggregate side. The mean is exact-DECIMAL-sum ÷ exact count (one
    deterministic IEEE division per part), matching the oracle's
    ``avg`` exactly on integral quantities.
    """
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == brand)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(part, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = branded.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(money("l_quantity")).cast("double")
                / F.count("*")
            )
        ).alias("qty_cap")
    )
    return (
        branded.join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


def tpch_q17ish_oracle_sql(brand: str = "Brand#4") -> str:
    return f"""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = '{brand}'
  AND l_quantity < (
        SELECT 0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / count(*))
        FROM lineitem WHERE l_partkey = p_partkey)
"""


# ------------------------------------------------------------------ Q19


def tpch_q19ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): revenue from three
    disjunctive brand/size/quantity bands — the OR-of-ANDs predicate
    join the optimizer must split into pushable per-side conjuncts
    (size ≥ 1 and the quantity hull push to the scans) plus a
    cross-side residual.

    Scale shape: one part-key equi-join (size-based strategy; the
    dimension is SF-proportional) with the disjunction evaluated as a
    codegen residual — NOT three separate join passes unioned, which
    would read the fact three times. The quantity hull [1, 30] is
    derivable from the disjunction and prunes lineitem at the scan.
    Single global row: partial aggregates all the way down.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#16")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.sum(
        money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - money("l_discount"))
    )
    return (
        li.join(part, (F.col("l_partkey") == F.col("p_partkey")) & band)
        .agg(revenue.cast("double").alias("revenue"))
    )


TPCH_Q19ISH_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
       * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
       AS DOUBLE) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5
        AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#16' AND p_size BETWEEN 1 AND 10
        AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 20 AND 30))
"""


# ------------------------------------------------------------------ Q22


def tpch_q22ish(
    spark: SparkSession, sf_dir: str, since: str = "2000-01-01"
) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape): well-funded
    customers gone DORMANT (no order since ``since``; the testdata
    generator gives every customer at least one lifetime order, so the
    original's "never ordered" form is vacuously empty — the dormancy
    window keeps the identical NOT EXISTS → LEFT ANTI physical shape
    with a non-degenerate answer), by market segment, composed with
    the scalar-subquery filter (balance above the mean POSITIVE
    balance).

    Scale shape: the mean-positive-balance scalar is ONE partial
    aggregate collapsed to a single row and broadcast (a crossJoin
    with a 1-row side is a BroadcastNestedLoopJoin carrying one row —
    SF-invariant by construction, the only legal forced broadcast
    here). The date filter prunes the anti-join's build side at the
    scan; the anti-join shuffles on the customer key and
    short-circuits per customer; the segment rollup is ≤5 groups.
    Balance sums run in exact DECIMAL.
    """
    cust = load_table(spark, sf_dir, "customer")
    avg_pos = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(money("c_acctbal")).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


def tpch_q22ish_oracle_sql(since: str = "2000-01-01") -> str:
    return f"""
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*)
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{since}')
GROUP BY 1
"""
