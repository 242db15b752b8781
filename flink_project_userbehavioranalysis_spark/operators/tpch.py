"""TPC-H breadth, waves 2 and 3: the join/subquery physical shapes the
wave-1 set (q1/q3/q5/q6/q13/q18 in ``relational.py``) does not
exercise — semi-join EXISTS (Q4), top-k over a 3-way fact join (Q10),
conditional aggregation (Q12), single-row percentage aggregate (Q14),
scalar per-group subquery re-join (Q17), disjunctive OR-of-ANDs
predicates (Q19), anti-join + global scalar filter (Q22) — plus the
five previously partsupp-blocked shapes (Q2/Q9/Q11/Q16/Q20, see the
"partsupp wave" section), completing the expressible suite at 22/22.

Reference mapping (SURVEY.md §2, all [U] — checkout empty): the
reference project has no TPC-H suite; these are engine-sanity shapes
in the spirit of BASELINE.md's ``tpch_q1ish``, adapted to the driver
testdata's reduced columns (no l_commitdate/l_receiptdate/l_shipmode,
no partsupp table — derived deterministically instead, see below —
no c_phone):

- Q4's "commit < receipt" late test  → ``l_shipdate > o_orderdate +
  60 days`` (same EXISTS-per-order shape, different predicate);
- Q12's shipmode grouping            → ``l_linestatus``;
- Q14's ``p_type LIKE 'PROMO%'``     → ``p_type = 'PROMO'`` (the
  testdata generator emits bare categories);
- Q17's Brand#23 + MED BOX filter    → brand filter only;
- Q22's phone-prefix country grouping → ``c_mktsegment``;
- Q2's ``%BRASS`` + p_mfgr/s_address  → p_type/p_size filter, p_brand
  output, address columns omitted;
- Q9's ``%green%`` name filter        → ``p_name LIKE 'red%'``;
- Q11/Q20's single nation             → a region (testdata density:
  25 nations over 100 suppliers);
- Q16's Customer-Complaints comment blocklist → negative-acctbal
  suppliers (no s_comment column).

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
    # coalesce keeps the two CASE sums a partition of the joined rows:
    # a NULL priority yields NULL from isin(), which would drop the row
    # from BOTH counts while the oracle's CASE…ELSE counts it as low
    high = F.coalesce(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(False)
    ).cast("long")
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


# ------------------------------------------------------------------ Q7


def tpch_q7ish(
    spark: SparkSession,
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): bilateral trade revenue
    between two nations by ship year — the TWO-ROLE dimension join
    (nation joins the fact tree twice: once through the supplier, once
    through the customer) with a cross-pair disjunction.

    Scale shape: each nation role is pre-filtered to the two named
    nations and hint-broadcast (≤ |nations| rows by construction, the
    SF-invariant table) — so the supplier and customer joins each
    prune their side to ~2/25 BEFORE the facts meet in the one
    order-key shuffle. The (A→B or B→A) disjunction is a codegen
    residual over the two attached names. Rollup bounded at
    2 pairs × years.
    """
    pair = [nation_a, nation_b]
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    n1 = F.broadcast(
        nat.select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nat.select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        n1, F.col("s_nationkey") == F.col("n1_key")
    ).select("s_suppkey", "supp_nation")
    cust = load_table(spark, sf_dir, "customer").join(
        n2, F.col("c_nationkey") == F.col("n2_key")
    ).select("c_custkey", "cust_nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    revenue = F.sum(
        money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - money("l_discount"))
    )
    return (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == nation_a)
                & (F.col("cust_nation") == nation_b)
            )
            | (
                (F.col("supp_nation") == nation_b)
                & (F.col("cust_nation") == nation_a)
            )
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(revenue.cast("double").alias("revenue"))
    )


def tpch_q7ish_oracle_sql(
    nation_a: str = "NATION_1", nation_b: str = "NATION_2"
) -> str:
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = '{nation_a}' AND n2.n_name = '{nation_b}')
    OR (n1.n_name = '{nation_b}' AND n2.n_name = '{nation_a}'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


# ------------------------------------------------------------------ Q8


def tpch_q8ish(
    spark: SparkSession,
    sf_dir: str,
    region: str = "ASIA",
    nation: str = "NATION_2",
    ptype: str = "PROMO",
) -> DataFrame:
    """National market share (TPC-H Q8 shape): one nation's share of a
    region's revenue for one part type, by order year — the widest
    join tree in the suite (6 relations + nation in two roles) feeding
    a conditional-percentage aggregate.

    Scale shape: geography (region, nations) is hint-broadcast
    (SF-invariant); part is filtered to one type and joins size-based;
    the customer-side nation→region chain prunes customers to one
    region BEFORE the fact join; supplier nation attaches only the
    NAME used by the CASE. Facts meet in one order-key shuffle; both
    CASE sums ride one pass in exact DECIMAL; share divides exact
    doubles once per year group.
    """
    reg = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    )
    nat = load_table(spark, sf_dir, "nation")
    cust_nat = F.broadcast(
        nat.join(reg, F.col("n_regionkey") == F.col("r_regionkey")).select(
            F.col("n_nationkey").alias("cn_key")
        )
    )
    supp_nat = F.broadcast(
        nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    cust = load_table(spark, sf_dir, "customer").join(
        cust_nat, F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    sup = load_table(spark, sf_dir, "supplier").join(
        supp_nat, F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == ptype)
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    disc = money("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - money("l_discount")
    )
    zero = F.lit(0).cast("decimal(22,4)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == nation, disc).otherwise(zero)).alias("nrev"),
            F.sum(disc).alias("trev"),
        )
        .select(
            "o_year",
            (F.col("nrev").cast("double") / F.col("trev").cast("double")).alias(
                "mkt_share"
            ),
        )
    )


def tpch_q8ish_oracle_sql(
    region: str = "ASIA", nation: str = "NATION_2", ptype: str = "PROMO"
) -> str:
    return f"""
SELECT year(o_orderdate) AS o_year,
       CAST(sum(CASE WHEN n1.n_name = '{nation}'
                THEN CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
                ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
     / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
WHERE r_name = '{region}' AND p_type = '{ptype}'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# ------------------------------------------------------------------ Q15


def tpch_q15ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): the supplier(s) whose quarterly
    revenue equals the global maximum — the view + scalar-max
    subquery pattern (an argmax that must keep ALL ties, which a
    LIMIT 1 would not).

    Scale shape: per-supplier revenue is ONE partial-aggregated
    shuffle over the quarter-pruned fact; the global max collapses
    that aggregate to a single row and broadcasts back (one-row
    BroadcastNestedLoopJoin — SF-invariant); the supplier name join is
    size-based. The equality filter compares doubles both derived
    from exact DECIMAL sums, so Spark and the oracle agree bit-exactly.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            money("l_extendedprice")
            * (F.lit(1).cast("decimal(3,2)") - money("l_discount"))
        )
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


TPCH_Q15ISH_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# ------------------------------------------------------------------ Q21


def tpch_q21ish(
    spark: SparkSession, sf_dir: str, late_days: int = 90, k: int = 10
) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): for
    finished orders, count per supplier the multi-supplier orders
    where ONLY that supplier shipped late — the hardest join shape in
    the suite: one fact line correlated with an EXISTS (some other
    supplier participated) AND a NOT EXISTS (no other supplier was
    also late), i.e. a LeftSemi and a LeftAnti stacked on the same
    order-key clustering.

    "Late" is shipped more than ``late_days`` days after the order
    date (the reduced schema's receipt/commit proxy, as in q4ish).

    Scale shape: the base (late line ⋈ finished order) shuffles once
    on the order key; BOTH the semi and the anti probe reuse that same
    clustering against projected 2-3 column lineitem slices, with the
    different-supplier (and lateness) comparisons as residuals — no
    row duplication at any step, no second aggregation. The top-k is
    TakeOrderedAndProject with the unique supplier name as tie-break.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late_cut = F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAY")
    l1 = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > late_cut
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3"))
            & (F.col("d3") > late_cut),
            "left_anti",
        )
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


def tpch_q21ish_oracle_sql(late_days: int = 90, k: int = 10) -> str:
    return f"""
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL {int(late_days)} DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL {int(late_days)} DAY)
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT {int(k)}
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


# ======================================================= partsupp wave
# The driver testdata ships no partsupp table, which blocked the last
# five TPC-H shapes (Q2/Q9/Q11/Q16/Q20). They are unlocked here by a
# DERIVED partsupp: the distinct (l_partkey, l_suppkey) pairs actually
# observed in lineitem (so the Q9 cost-lookup join is total, as in the
# spec, where lineitem draws its pairs from partsupp), with availqty /
# supplycost as closed-form integer functions of the key pair — pure
# BIGINT arithmetic, so Spark and the DuckDB oracle derive
# bit-identical tables with no hash/float boundary anywhere. Supply
# cost is carried in CENTS (BIGINT) end-to-end; dollar conversion
# happens only in final DOUBLE casts of exact operands.
#
# In production partsupp is of course a real table; the derivation
# stands in for the missing testdata only (one partial-aggregated
# distinct on the pair — the same shuffle the real table's scan+join
# would need — so every plan shape below is the one the real schema
# would produce).


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp relation: (ps_partkey, ps_suppkey,
    ps_availqty, ps_supplycost_cents)."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (
            (F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 7919) % 9999 + 1
        ).alias("ps_availqty"),
        (
            (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 997) % 90000 + 10000
        ).alias("ps_supplycost_cents"),
    )


# Shared oracle CTE — textually identical derivation for DuckDB.
PARTSUPP_CTE = """ps AS (
    SELECT ps_partkey, ps_suppkey,
           (ps_partkey * 13 + ps_suppkey * 7919) % 9999 + 1 AS ps_availqty,
           (ps_partkey * 31 + ps_suppkey * 997) % 90000 + 10000 AS ps_supplycost_cents
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem)
)"""


def _regional_suppliers(
    spark: SparkSession, sf_dir: str, region: str, cols: tuple[str, ...]
) -> DataFrame:
    """Suppliers restricted to one region via the broadcast
    region→nation dim chain — the shared build side of the three
    regional partsupp queries (Q2/Q11/Q20). ``cols`` picks the
    projection each query carries (always includes s_suppkey)."""
    nation = load_table(spark, sf_dir, "nation")
    region_df = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    dims = nation.join(
        F.broadcast(region_df), nation.n_regionkey == region_df.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(*cols)
    )



# ------------------------------------------------------------------ Q9


def tpch_q9ish(spark: SparkSession, sf_dir: str, name_prefix: str = "red") -> DataFrame:
    """Product-type profit measure (TPC-H Q9 shape): profit per
    (supplier nation, order year) over parts matching a name pattern —
    the biggest missing shape: a THREE-fact join (lineitem ⋈ partsupp
    ⋈ orders) plus three dimensions, feeding a two-key rollup.

    Q9's ``p_name like '%green%'`` becomes ``p_name LIKE 'red%'`` (the
    testdata's names are '<adj> <noun>'); profit = Σ extprice·(1−disc)
    − Σ supplycost·qty with revenue in exact DECIMAL(22,4) and cost in
    exact BIGINT cents (qty is integer-valued), converted to dollars
    only in the final DOUBLE cast of the two exact sums — two IEEE ops
    in a fixed order, identical on both engines.

    Scale shape: the part filter prunes ~1/8 of parts and broadcasts;
    supplier/nation broadcast; lineitem and the derived ps meet in ONE
    (partkey, suppkey) shuffle (ps is already clustered on that key by
    its distinct); orders joins on the order key — the second and last
    fact shuffle; the (nation, year) rollup is partial-aggregated over
    a ≤ nations×years domain.
    """
    ps = _partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(name_prefix))
        .select("p_partkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    rev = money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - money("l_discount"))
    # round() BEFORE the long cast on BOTH engines: a bare Spark
    # cast('long') truncates toward zero while DuckDB's CAST(AS BIGINT)
    # rounds — a latent parity break if quantity ever turns fractional
    # (integer-valued 1..50 today, so round() is the identity)
    cost_cents = F.col("ps_supplycost_cents") * F.round("l_quantity").cast("long")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(ps, (F.col("l_partkey") == F.col("ps_partkey"))
                  & (F.col("l_suppkey") == F.col("ps_suppkey")))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(rev).alias("r"), F.sum(cost_cents).alias("c"))
        .select(
            "nation",
            "o_year",
            (F.col("r").cast("double") - F.col("c").cast("double") / F.lit(100.0))
            .alias("profit"),
        )
    )


def tpch_q9ish_oracle_sql(name_prefix: str = "red") -> str:
    return f"""
WITH {PARTSUPP_CTE}
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       - CAST(sum(ps_supplycost_cents * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 100.0
           AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '{name_prefix}%'
JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


# ------------------------------------------------------------------ Q2


def tpch_q2ish(
    spark: SparkSession,
    sf_dir: str,
    region: str = "EUROPE",
    p_type: str = "LARGE",
    max_size: int = 10,
    k: int = 100,
) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): for each qualifying
    part, the supplier(s) in one region offering it at the region's
    minimum supply cost — the correlated-scalar-MIN subquery,
    decorrelated to aggregate-then-rejoin (the same pattern as Q17,
    here on a composite condition: equal part AND equal min cost).

    Substitutions (reduced schema): ``p_type like '%BRASS'`` →
    ``p_type = '{LARGE}' AND p_size <= max_size``; the p_mfgr output
    column → ``p_brand``; s_address/s_phone/s_comment are absent and
    omitted.

    Scale shape: region→nation→supplier is a broadcast dim chain onto
    the derived ps; the per-part MIN reuses the regional join's
    partkey clustering; min-cost rows re-join on (partkey, cents) —
    both sides aggregates. Top-k via TakeOrderedAndProject on the
    four-key spec order, never a global sort.
    """
    ps = _partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == p_type) & (F.col("p_size") <= max_size))
        .select("p_partkey", "p_brand")
    )
    sup = _regional_suppliers(
        spark, sf_dir, region, ("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional = ps.join(F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey"))
    min_cost = regional.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost_cents").alias("min_cents")
    )
    return (
        regional.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost_cents") == F.col("min_cents")),
        )
        .drop("mc_partkey", "min_cents")
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "ps_supplycost_cents",
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(int(k))
    )


def tpch_q2ish_oracle_sql(
    region: str = "EUROPE", p_type: str = "LARGE", max_size: int = 10, k: int = 100
) -> str:
    return f"""
WITH {PARTSUPP_CTE},
regional AS (
    SELECT ps.*, s_name, s_acctbal, n_name
    FROM ps
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = '{region}'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost_cents
FROM regional
JOIN part ON ps_partkey = p_partkey
WHERE p_type = '{p_type}' AND p_size <= {int(max_size)}
  AND ps_supplycost_cents = (
        SELECT min(r2.ps_supplycost_cents) FROM regional r2
        WHERE r2.ps_partkey = regional.ps_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT {int(k)}
"""


# ------------------------------------------------------------------ Q11


def tpch_q11ish(
    spark: SparkSession, sf_dir: str, region: str = "EUROPE", fraction: float = 0.0005
) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape): parts whose
    regional inventory value exceeds a FRACTION of the region's total
    inventory value — the group-by + global-scalar HAVING pattern
    (the threshold is a one-row aggregate of the same relation,
    broadcast back, exactly Q15/Q22's scalar shape).

    Q11's single nation ('GERMANY') widens to a region for a
    non-degenerate supplier count on the reduced testdata (25 nations
    over 100 suppliers); value stays in exact BIGINT cents so both the
    per-part sums and the global threshold comparison are
    integer-exact (the fraction scales the DOUBLE cast of an exact
    sum — one IEEE multiply, same on both engines).

    Scale shape: one broadcast dim chain onto ps, ONE partkey
    partial-aggregated shuffle for the per-part values, and a 1-row
    broadcast for the threshold; no global sort (hash compare is
    order-insensitive).
    """
    ps = _partsupp(spark, sf_dir)
    sup = _regional_suppliers(spark, sf_dir, region, ("s_suppkey",))
    value = F.col("ps_supplycost_cents") * F.col("ps_availqty")
    per_part = (
        ps.join(F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(F.sum(value).alias("value_cents"))
    )
    total = per_part.groupBy().agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents").cast("double")
            > F.col("total_cents").cast("double") * F.lit(float(fraction))
        )
        .select("ps_partkey", "value_cents")
    )


def tpch_q11ish_oracle_sql(region: str = "EUROPE", fraction: float = 0.0005) -> str:
    return f"""
WITH {PARTSUPP_CTE},
regional AS (
    SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v
    FROM ps
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = '{region}'
)
SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents
FROM regional
GROUP BY ps_partkey
HAVING CAST(sum(v) AS DOUBLE) >
       (SELECT CAST(sum(v) AS DOUBLE) * {fraction!r} FROM regional)
"""


# ------------------------------------------------------------------ Q16


def tpch_q16ish(
    spark: SparkSession,
    sf_dir: str,
    excl_brand: str = "Brand#4",
    excl_type: str = "PROMO",
    sizes: tuple[int, ...] = (1, 2, 3, 4, 5, 8, 9, 10),
) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): how many
    DISTINCT suppliers can provide parts of each (brand, type, size)
    combination, excluding one brand, one type family, and a
    blocklisted supplier set — the count-distinct-over-join +
    NOT-IN-subquery pattern.

    Substitutions: the ``s_comment LIKE '%Customer%Complaints%'``
    blocklist (no s_comment column) → suppliers with negative account
    balance; ``p_type NOT LIKE 'MEDIUM POLISHED%'`` → ``p_type <>
    excl_type`` (bare categories).

    Scale shape: the part filter prunes at the scan and broadcasts
    onto ps; the blocklist is a tiny broadcast ANTI join (NOT IN with
    non-null keys ≡ anti); count(DISTINCT ps_suppkey) per attr triple
    runs as the standard two-level partial aggregate (expand on the
    group keys — no row explosion beyond the distinct pairs).
    """
    ps = _partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != excl_brand)
            & (F.col("p_type") != excl_type)
            & F.col("p_size").isin(*[int(s) for s in sizes])
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    blocklist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(blocklist),
            F.col("ps_suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


def tpch_q16ish_oracle_sql(
    excl_brand: str = "Brand#4",
    excl_type: str = "PROMO",
    sizes: tuple[int, ...] = (1, 2, 3, 4, 5, 8, 9, 10),
) -> str:
    size_list = ", ".join(str(int(s)) for s in sizes)
    return f"""
WITH {PARTSUPP_CTE}
SELECT p_brand, p_type, p_size,
       count(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> '{excl_brand}'
  AND p_type <> '{excl_type}'
  AND p_size IN ({size_list})
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# ------------------------------------------------------------------ Q20


def tpch_q20ish(
    spark: SparkSession,
    sf_dir: str,
    region: str = "EUROPE",
    name_prefix: str = "blue",
    year: int = 1997,
) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape): suppliers in one
    region holding EXCESS stock — more than half the quantity they
    actually shipped of a name-matched part during one year — the
    nested-EXISTS shape: supplier ∈ (ps pairs where availqty >
    ½·shipped(part, supp, year)).

    Q20's nation ('CANADA') widens to a region (testdata density);
    the half-shipped threshold compares an exact integer availqty
    against 0.5·an exact integer-valued DOUBLE sum — both engines
    evaluate the same two IEEE ops on identical operands.

    Scale shape: the per-(part, supp, year) shipped quantities are ONE
    partial-aggregated shuffle of the pruned-year lineitem on the SAME
    (partkey, suppkey) key ps is clustered on — the excess-stock join
    is co-shuffled; the part name filter broadcasts; the final
    supplier projection is a semi-join (distinct suppliers), then a
    broadcast nation/region chain.
    """
    ps = _partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(name_prefix))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("shipped_qty"))
    )
    excess = (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(
            F.col("ps_availqty").cast("double") > F.lit(0.5) * F.col("shipped_qty")
        )
        .select("ps_suppkey")
        .distinct()
    )
    sup = _regional_suppliers(spark, sf_dir, region, ("s_suppkey", "s_name", "n_name"))
    return sup.join(
        excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "n_name")


def tpch_q20ish_oracle_sql(
    region: str = "EUROPE", name_prefix: str = "blue", year: int = 1997
) -> str:
    return f"""
WITH {PARTSUPP_CTE},
shipped AS (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS shipped_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{year}-01-01'
      AND l_shipdate < TIMESTAMP '{year + 1}-01-01'
    GROUP BY 1, 2
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = '{region}'
WHERE s_suppkey IN (
    SELECT ps_suppkey
    FROM ps
    JOIN part ON ps_partkey = p_partkey AND p_name LIKE '{name_prefix}%'
    JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    WHERE CAST(ps_availqty AS DOUBLE) > 0.5 * shipped_qty)
"""
