"""Relational coverage ops: TPC-H-Q1-style pricing summary, set
operations, session windows, regex scalar family, date parse/format.

Reference mapping (SURVEY.md §2, all [U] — checkout empty):
- set ops (§2.8): absent in the reference (streams are unioned by
  running separate jobs); exposed here because the engine is a
  superset and the driver oracle can check them for free.
- session windows (T9): absent in reference (course-mentioned only);
  Spark has first-class ``session_window``.
- P5 regex filter/extract: ``HotPagesNetworkFlow.scala :: main``
  [~L42] filters static-resource URLs by pattern; here the analog is
  regex extraction over the ``events.props`` JSON string (treating it
  as an unparsed log line, exactly the reference's hand-parse idiom).
- P6/P7 date parse + format: ``SimpleDateFormat`` parse in
  ``HotPagesNetworkFlow`` [~L32], ``new Timestamp(...)`` formatting in
  ``TopNHotItems.onTimer`` [~L100].
- tpch_q1ish: engine sanity op from BASELINE.md (80.2 ms @ sf0.1) —
  exercises exact DECIMAL money sums + deterministic averages.

Scale posture: every query is a single partial-aggregated shuffle
(or none); money math is DECIMAL so partial-agg order can't change
results; session windows shuffle once on user_id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_project_userbehavioranalysis_spark.functions import exact_avg, money
from flink_project_userbehavioranalysis_spark.io import load_events, load_table

# ------------------------------------------------------------------ TPC-H Q1


def tpch_q1ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary aggregate on lineitem (TPC-H Q1 shape).

    Sums run in DECIMAL(18,2)/(22,4) so partial-aggregation order can
    never wobble a cent; averages divide the exact sum by the exact
    count (one IEEE division — deterministic, oracle-identical).
    At 100 TB this is one map-side-combined shuffle over 6 groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - money("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + money("l_tax"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money("l_quantity")).alias("sum_qty"),
            F.sum(money("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", exact_avg(F.col("sum_qty"), F.col("count_order")))
        .withColumn("avg_price", exact_avg(F.col("sum_base_price"), F.col("count_order")))
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_base_price").cast("double").alias("sum_base_price"),
        F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
        F.col("sum_charge").cast("double").alias("sum_charge"),
        "avg_qty",
        "avg_price",
        "count_order",
    )


TPCH_Q1ISH_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
                * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""


# ------------------------------------------------------------------- set ops


def user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 set operations over two derived relations: users who
    viewed vs users who purchased → INTERSECT / EXCEPT / UNION, tagged.
    Each set op is a distinct-aggregated co-partitioned join under the
    hood — one shuffle per branch on user_id, no driver round-trip."""
    events = load_events(spark, sf_dir)
    viewers = events.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return (
        viewers.intersect(buyers).select(F.lit("both").alias("op"), "user_id")
        .unionByName(viewers.exceptAll(buyers).select(F.lit("view_only").alias("op"), "user_id"))
        .unionByName(buyers.exceptAll(viewers).select(F.lit("buy_only").alias("op"), "user_id"))
        .unionByName(viewers.union(buyers).distinct().select(F.lit("any").alias("op"), "user_id"))
    )


USER_SET_OPS_SQL = """
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
     b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'both' AS op, user_id FROM (SELECT user_id FROM v INTERSECT SELECT user_id FROM b)
UNION ALL
SELECT 'view_only', user_id FROM (SELECT user_id FROM v EXCEPT SELECT user_id FROM b)
UNION ALL
SELECT 'buy_only', user_id FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM v)
UNION ALL
SELECT 'any', user_id FROM (SELECT user_id FROM v UNION SELECT user_id FROM b)
"""


# ------------------------------------------------------------ session windows


def user_sessions(spark: SparkSession, sf_dir: str, gap: str = "30 minutes") -> DataFrame:
    """T9 session windows: per-user sessions with a 30-min inactivity
    gap — session bounds (epoch s) + event count. One shuffle on
    user_id; Spark's session_window merges adjacent rows server-side.
    Oracle = classic gaps-and-islands (lag + running sum)."""
    events = load_events(spark, sf_dir)
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "n_events",
        )
    )


def user_sessions_oracle_sql(gap_seconds: int = 1800) -> str:
    # session_window's end = last event + gap (half-open), per Spark
    # docs. All comparisons in integer microseconds (epoch_us) so the
    # gap test and the final floor-to-seconds match Spark's µs
    # arithmetic exactly (a plain epoch() would truncate before the
    # gap compare and misclassify gaps with fractional seconds).
    return f"""
WITH t AS (
    SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                     - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                           OVER (PARTITION BY user_id ORDER BY ts) > {gap_seconds} * 1000000
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
), s AS (
    SELECT user_id, us,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                                  ROWS UNBOUNDED PRECEDING) AS sid
    FROM t
)
SELECT user_id,
       min(us) // 1000000 AS session_start,
       max(us) // 1000000 + {gap_seconds} AS session_end,
       count(*) AS n_events
FROM s
GROUP BY user_id, sid
"""


# ----------------------------------------------------- regex scalar family P5


def regex_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6 analog: treat ``props`` as an unparsed log line (the
    reference hand-parses apache.log with patterns) — regex-extract the
    numeric k, keep only two-digit values ending in 0–4 (the 'exclude
    static resources' filter shape, inverted match), count per k."""
    events = load_events(spark, sf_dir)
    k_str = F.regexp_extract("props", r'"k":\s*(\d+)', 1)
    # regexp_extract yields '' on no match; ANSI mode would throw on
    # cast, so route through NULL explicitly.
    k = F.when(k_str == "", F.lit(None)).otherwise(k_str).cast("int")
    return (
        events.select(k.alias("k"))
        .filter(F.col("k").isNotNull() & F.col("k").cast("string").rlike(r"^\d[0-4]$"))
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
    )


REGEX_EXTRACT_PROPS_SQL = r"""
SELECT TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k, count(*) AS cnt
FROM events
WHERE TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) IS NOT NULL
  AND regexp_matches(CAST(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS VARCHAR),
                     '^\d[0-4]$')
GROUP BY 1
"""


# ------------------------------------------------- date parse/format P6 + P7


def date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P7: format event-time to 'yyyy-MM-dd HH:mm' strings
    (reference: SimpleDateFormat in TopNHotItems.onTimer [~L100] [U])
    and parse back with to_timestamp, proving the round trip is exact
    at minute grain. Output: minute string + epoch + count."""
    events = load_events(spark, sf_dir)
    minute_str = F.date_format(F.date_trunc("minute", F.col("ts")), "yyyy-MM-dd HH:mm")
    return (
        events.select(minute_str.alias("minute_str"))
        .groupBy("minute_str")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "minute_epoch",
            F.unix_timestamp(F.to_timestamp("minute_str", "yyyy-MM-dd HH:mm")),
        )
        .select("minute_str", "minute_epoch", "cnt")
    )


DATE_ROUNDTRIP_SQL = """
SELECT strftime(date_trunc('minute', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M') AS minute_str,
       CAST(epoch(date_trunc('minute', CAST(ts AS TIMESTAMP))) AS BIGINT) AS minute_epoch,
       count(*) AS cnt
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------- rollup / percentile freebies


def pv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS family (absent in the reference — SURVEY §2.4
    notes it comes free in Spark SQL): event counts at (day, type),
    (day), and grand-total levels via ROLLUP, disambiguated by
    grouping_id. One shuffle; partial aggregation covers all levels."""
    events = load_events(spark, sf_dir)
    return (
        events.withColumn("day_start", F.date_trunc("day", "ts").cast("long"))
        .rollup("day_start", "event_type")
        .agg(F.count("*").alias("cnt"), F.grouping_id().cast("long").alias("gid"))
    )


PV_ROLLUP_SQL = """
WITH t AS (
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start, event_type
    FROM events
)
SELECT day_start, event_type, count(*) AS cnt,
       CAST(grouping(day_start) * 2 + grouping(event_type) AS BIGINT) AS gid
FROM t
GROUP BY ROLLUP(day_start, event_type)
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (median + p90) —
    the percentile family the reference lacks. Spark ``percentile`` and
    DuckDB ``quantile_cont`` both use linear interpolation; results are
    rounded to 6 dp for cross-engine float identity. At 100 TB swap to
    ``percentile_approx`` (mergeable t-digest-style sketch)."""
    events = load_events(spark, sf_dir)
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90
FROM events
GROUP BY 1
"""


def value_percentiles_approx(
    spark: SparkSession, sf_dir: str, accuracy: int = 10000
) -> DataFrame:
    """The 100 TB percentile path promised above: ``percentile_approx``
    (Greenwald-Khanna style mergeable quantile summary — partial
    summaries merge associatively across partitions, no global sort).
    Error is bounded by 1/accuracy of the rank; tests assert the
    estimate lands between the exact neighbors around each target
    rank. Rows-only driver check: estimates are engine-specific."""
    events = load_events(spark, sf_dir)
    return events.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(accuracy)).alias("p50"),
        F.percentile_approx("value", F.lit(0.9), F.lit(accuracy)).alias("p90"),
    )


# ------------------------------------------------------------ funnel analysis


def funnel_conversion(
    spark: SparkSession, sf_dir: str, horizon_s: int = 86400
) -> DataFrame:
    """Ordered 3-step conversion funnel (view → click → purchase) per
    user — the classic behavior-analytics query over the events table,
    horizon-anchored at the funnel entry: step k's timestamp is the
    EARLIEST event of that type strictly after step k-1 AND within
    ``horizon_s`` of the first view (first-touch semantics; strict >
    so a simultaneous pair can't satisfy an ordering; the shared
    anchor makes 'converted within a day' one funnel, not a chain of
    per-step windows). The 24 h default splits this corpus 150→60→14
    per 150 view-users at sf0.01 — every stage populated, asserted in
    tests.

    Scale shape: stage 1 is one partial-aggregated groupBy(user); each
    later stage is a narrow equi-join on user_id (both sides only
    (user_id, ts[, anchor])) followed by a re-aggregation — the
    sequential dependency between steps is inherently iterative, but
    every iteration shuffles only id+timestamp pairs, never the event
    payload, and the user key partitions all three stages identically
    (one co-partitioned chain under AQE). LEFT joins keep every
    stage-1 user so per-stage drop-off is the row count per `stage`.

    Output: (user_id, t1_s, t2_s, t3_s, stage) — epoch seconds, nulls
    past the reached stage.
    """
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    deadline = F.col("t1") + F.expr(f"INTERVAL {int(horizon_s)} SECOND")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id", "t2")
        .agg(F.min("ts").alias("t3"))
    )
    out = (
        t1.join(t2.select("user_id", "t2"), "user_id", "left")
        .join(t3.select("user_id", "t3"), "user_id", "left")
    )
    stage = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .otherwise(1)
    )
    return out.select(
        "user_id",
        F.col("t1").cast("long").alias("t1_s"),
        F.col("t2").cast("long").alias("t2_s"),
        F.col("t3").cast("long").alias("t3_s"),
        stage.alias("stage"),
    )


def funnel_conversion_oracle_sql(horizon_s: int = 86400) -> str:
    return f"""
WITH v AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY 1
), c AS (
    SELECT e.user_id, v.t1, min(e.ts) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
     AND e.ts <= v.t1 + INTERVAL {int(horizon_s)} SECOND
    WHERE e.event_type = 'click' GROUP BY 1, 2
), p AS (
    SELECT e.user_id, c.t2, min(e.ts) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
     AND e.ts <= c.t1 + INTERVAL {int(horizon_s)} SECOND
    WHERE e.event_type = 'purchase' GROUP BY 1, 2
)
SELECT v.user_id,
       CAST(floor(epoch(v.t1)) AS BIGINT) AS t1_s,
       CAST(floor(epoch(c.t2)) AS BIGINT) AS t2_s,
       CAST(floor(epoch(p.t3)) AS BIGINT) AS t3_s,
       CASE WHEN p.t3 IS NOT NULL THEN 3
            WHEN c.t2 IS NOT NULL THEN 2 ELSE 1 END AS stage
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = v.user_id
"""


def cohort_retention(
    spark: SparkSession, sf_dir: str, cohort_event: str = "purchase"
) -> DataFrame:
    """Weekly cohort-retention matrix — the second canonical
    behavior-analytics rollup beside the funnel: users are cohorted by
    the week of their first ``cohort_event`` (default: first purchase
    — conversion week), and retention(cohort, k) counts the cohort's
    users with ANY activity k weeks after it. Weeks are epoch-anchored
    7-day buckets (floor(epoch/604800) — engine-portable, no locale
    week rules). Cohorting on first *overall* event is degenerate on
    dense corpora (every always-on user lands in week 0 — this one
    included); first-conversion cohorts spread, which is also the
    product question retention matrices actually answer.

    Scale shape: cohort assignment is one partial-aggregated
    groupBy(user) over the filtered cohort events; activity is a
    distinct (user, week) projection; the join attaches each user's
    narrow cohort row (two BIGINTs) before a (cohort_week, k)
    count-distinct — at 100 TB the join and both aggs share the
    user hash partitioning under AQE, and nothing wider than ids and
    week numbers ever shuffles. Output is the dense observed matrix
    (rows only where retained > 0), k ≥ 0 (pre-conversion activity is
    not "retention" and is filtered), with k=0 ≥ cohort size by
    construction (the conversion week itself is active).

    Output: (cohort_week, k, retained) — all exact integers.
    """
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.floor(F.col("ts").cast("long") / F.lit(604800)).alias("week"),
    )
    cohort = (
        ev.filter(F.col("event_type") == cohort_event)
        .groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
    )
    active = ev.select("user_id", "week").distinct()
    return (
        active.join(cohort, "user_id")
        .filter(F.col("week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("k")
        )
        .agg(F.count_distinct("user_id").alias("retained"))
    )


COHORT_RETENTION_SQL = """
WITH ev AS (
    SELECT user_id, event_type,
           CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week
    FROM events
), cohort AS (
    SELECT user_id, min(week) AS cohort_week FROM ev
    WHERE event_type = 'purchase' GROUP BY 1
), active AS (
    SELECT DISTINCT user_id, week FROM ev
)
SELECT c.cohort_week, a.week - c.cohort_week AS k,
       count(DISTINCT a.user_id) AS retained
FROM active a JOIN cohort c USING (user_id)
WHERE a.week >= c.cohort_week
GROUP BY 1, 2
"""


# --------------------------------------------------------------- TPC-H Q3/Q6


def tpch_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority revenue (TPC-H Q3 shape): customer ⋈ orders ⋈
    lineitem with selective filters on all three inputs, DECIMAL
    revenue aggregation per order, top-10 by revenue.

    Scale shape: the segment-filtered CUSTOMER side is explicitly
    broadcast (a single-segment customer slice is a classic
    broadcastable dim even at 100 TB scale-factor — it prunes to
    ~1/5 of a dimension table); orders→lineitem is the fact-fact join
    and shuffles on the order key, which the revenue groupBy then
    REUSES (same key ⇒ no second exchange). Filters sit against the
    scans (pushed into parquet), and the top-10 is a
    TakeOrderedAndProject, never a global sort.

    Revenue sums run in exact DECIMAL so partial-agg order cannot
    wobble a cent; final cast to DOUBLE matches the oracle.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-01-01").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.sum(
        money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - money("l_discount"))
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


TPCH_Q3ISH_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def tpch_q6ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change (TPC-H Q6 shape): pure scan→filter→agg
    with range predicates on date, discount and quantity — the
    canonical predicate-pushdown / column-pruning probe. The whole
    query is one map-only pass plus a single-row global aggregate;
    the shipdate and quantity predicates reach the parquet reader
    (PushedFilters audited in tests/test_plans.py) and only 4 of 11
    lineitem columns are read. The discount bound is deliberately NOT
    pushable: it compares through a DECIMAL(3,2) cast (exactness over
    pushdown — see below), so it evaluates post-scan inside the same
    codegen stage.

    The discount BETWEEN bound quantizes to exact DECIMAL(3,2) BEFORE
    comparison — comparing raw float64 0.05/0.07 against binary floats
    like 0.06999... would make boundary rows engine-dependent;
    DECIMAL-vs-DECIMAL is exact on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = money("l_discount").cast("decimal(3,2)")
    out = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (d >= F.lit("0.05").cast("decimal(3,2)"))
        & (d <= F.lit("0.07").cast("decimal(3,2)"))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(money("l_extendedprice") * money("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )
    return out


TPCH_Q6ISH_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND CAST(l_discount AS DECIMAL(3,2)) BETWEEN CAST(0.05 AS DECIMAL(3,2))
                                           AND CAST(0.07 AS DECIMAL(3,2))
  AND l_quantity < 24
"""


def tpch_q5ish(spark: SparkSession, sf_dir: str, region: str = "ASIA") -> DataFrame:
    """Local-supplier-volume (TPC-H Q5 shape): the deepest join tree in
    the engine — region → nation → supplier and customer → orders →
    lineitem meeting on BOTH the order key and the "local supplier"
    condition (customer and supplier share a nation), grouped to
    per-nation revenue.

    Scale shape: the ONLY forced broadcast is geography — the
    region-filtered nation list (≤ |nations| rows by construction, the
    one table bounded at any scale factor). Suppliers and customers
    are SF-proportional dimensions (TPC-H grows both linearly), so
    hinting them broadcast would be a 100 TB lie: they reach the facts
    through plain equi-joins whose strategy stays size-based — AQE
    broadcasts the region-pruned supplier slice when it measures
    small and shuffles it when it doesn't. The two FACT relations
    (orders, lineitem) meet in one shuffle join on the order key; the
    final per-nation rollup is a partial-aggregated shuffle over
    ≤ |nations| groups.

    Money math in exact DECIMAL (the q1/q3 discipline).
    """
    nat = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(
        money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - money("l_discount"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == F.col("s_suppkey"))
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"))
    )


def tpch_q5ish_oracle_sql(region: str = "ASIA") -> str:
    return f"""
SELECT n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{region}'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def tpch_q18ish(spark: SparkSession, sf_dir: str, threshold: int = 300) -> DataFrame:
    """Large-volume-customer (TPC-H Q18 shape): the HAVING-subquery /
    semi-join pattern — find orders whose total line quantity exceeds
    ``threshold``, then enrich with order and customer attributes and
    return the top-100 by order value.

    Scale shape: the quantity rollup is ONE partial-aggregated shuffle
    on ``l_orderkey``; the classic formulation then SEMI-joins lineitem
    back to the big-order list and re-aggregates, but the rollup
    already carries the per-order sum, so the re-join is dropped
    (algebraically identical, one fewer fact-scan). The orders join
    lands on the SAME order-key clustering the rollup produced — AQE
    sees the filtered big-order side is tiny (HAVING > 300 keeps
    ~0.05% of orders at any SF: the threshold is a per-order bound,
    not SF-proportional) and broadcasts it. Customer joins size-based.
    Top-100 is a TakeOrderedAndProject, never a global sort.

    Quantity sums run in exact DECIMAL (quantities are integral
    doubles); final cast to DOUBLE matches the oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .filter(F.col("total_qty") > threshold)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


def tpch_q18ish_oracle_sql(threshold: int = 300) -> str:
    return f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {int(threshold)})
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY 1, 2, 3, 4, 5
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


def tpch_q13ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-order-count distribution (TPC-H Q13 shape): the OUTER
    join + double aggregation pattern — every customer keeps a row
    even with zero qualifying orders (``count(o_orderkey)`` counts
    non-null, so no-order customers land in the ``c_count = 0`` bin),
    then the per-customer counts collapse into a distribution.

    Scale shape: the left-outer join shuffles both sides on the
    customer key and the per-customer groupBy REUSES that clustering
    (same key ⇒ no second exchange before the first aggregate); the
    distribution rollup's key domain is max-orders-per-customer —
    constant-bounded, so the final shuffle is trivially small at any
    SF. The priority filter stands in for Q13's ``o_comment NOT
    LIKE`` and is pushed to the orders scan. No hints anywhere: both
    sides are SF-proportional, strategy stays size-based.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


TPCH_Q13ISH_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) t
GROUP BY c_count
"""


# ------------------------------------------------------------------ pivot

BEHAVIOR_TYPES = ("click", "signup", "error", "view", "purchase")


def behavior_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel behavior matrix via PIVOT — the wide-format rollup
    (one row per channel, one count column per behavior) BI tools ask
    of an analytics engine.

    Scale shape: the pivot VALUES ARE DECLARED (``BEHAVIOR_TYPES``) —
    the load-bearing detail: an undeclared ``pivot(col)`` makes Spark
    run a distinct-collect job over the pivot column BEFORE planning
    (a full extra pass + driver round-trip at 100 TB). With declared
    values the pivot compiles to exactly the CASE-sum conditional
    aggregation the oracle writes: one partial-aggregated shuffle
    over |channels| groups, no extra scan, no driver hop. Missing
    combinations surface as 0 (not NULL) — a channel that never
    errored reads as zero errors.
    """
    from flink_project_userbehavioranalysis_spark.operators.market import CHANNELS

    ev = load_events(spark, sf_dir).withColumn(
        "channel",
        F.concat(F.lit("ch"), (F.col("user_id") % CHANNELS).cast("string")),
    )
    wide = ev.groupBy("channel").pivot("event_type", list(BEHAVIOR_TYPES)).count()
    return wide.select(
        "channel",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in BEHAVIOR_TYPES
        ],
    )


def _behavior_pivot_sql() -> str:
    # derived from the SAME constants as the Spark side (market.CHANNELS,
    # BEHAVIOR_TYPES) — a literal here would silently break hash parity
    # the day either constant changes
    from flink_project_userbehavioranalysis_spark.operators.market import CHANNELS

    cases = "\n".join(
        f"       CAST(coalesce(sum(CASE WHEN event_type = '{t}' THEN 1 END), 0) AS BIGINT) AS n_{t},"
        for t in BEHAVIOR_TYPES
    ).rstrip(",")
    return f"""
SELECT 'ch' || CAST(user_id % {CHANNELS} AS VARCHAR) AS channel,
{cases}
FROM events
GROUP BY 1
"""


BEHAVIOR_PIVOT_SQL = _behavior_pivot_sql()


# -------------------------------------------------------------- SCD2 build


def user_tier_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build — the warehouse-modeling
    operator that turns a per-day attribute change log into validity
    ranges: one row per (user, consecutive run of equal attribute)
    carrying [valid_from, valid_to) day bounds, valid_to NULL on the
    current row. The attribute here is an activity tier derived from
    exact integer day-counts (≤2 events → 0, ≤5 → 1, else → 2), so
    every column the oracle hashes is engine-exact.

    Dataflow (the gaps-and-islands the sessionizer already uses, at
    day grain): daily partial-aggregated counts → per-user ordered
    change detection (lag) → run ids (running sum) → per-run collapse
    → valid_to via lead over the collapsed runs. ONE user-key shuffle;
    the three window passes share its clustering; the collapse is a
    partial-aggregated groupBy on (user, run). The incoming day's
    delta merges into the STORED SCD2 table without a rebuild via
    ``maintenance.user_tier_scd2_maintain`` (registered) — a
    user-bucket-partitioned MERGE whose cost ∝ delta.

    Output: (user_id, tier, valid_from, valid_to, n_days) — dates as
    ISO strings, valid_to NULL on each user's current row.
    """
    return _scd2_from_daily(_daily_counts(load_events(spark, sf_dir)))


def _daily_counts(ev: DataFrame) -> DataFrame:
    """Per-(user, day) event counts — the single daily rollup BOTH the
    SCD2 build and the as-of consumer derive from (shared subplan, so
    one registered query never aggregates the fact table twice; the
    identical shuffles are also exchange-reuse candidates)."""
    return ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )


def _tier_of(n) -> "F.Column":
    """The shared day-count → activity-tier rule (exact integers)."""
    return F.when(n <= 2, 0).when(n <= 5, 1).otherwise(2)


def _scd2_from_daily(daily_counts: DataFrame, with_meta: bool = False) -> DataFrame:
    from pyspark.sql import Window

    daily = daily_counts.select("user_id", "d", _tier_of(F.col("n")).alias("tier"))
    by_user = Window.partitionBy("user_id").orderBy("d")
    runs = daily.withColumn(
        "new_run",
        F.when(F.lag("tier").over(by_user).isNull() | (F.lag("tier").over(by_user) != F.col("tier")), 1).otherwise(0),
    ).withColumn(
        "run_id",
        F.sum("new_run").over(by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    collapsed = runs.groupBy("user_id", "run_id").agg(
        F.max("tier").alias("tier"),  # constant within the run
        F.min("d").alias("valid_from_d"),
        F.count("*").alias("n_days"),
        F.max("d").alias("last_day_d"),
    )
    by_user_runs = Window.partitionBy("user_id").orderBy("valid_from_d")
    meta = (
        # merge bookkeeping for the incremental MERGE consumer
        # (operators/maintenance.py :: user_tier_scd2_maintain): the
        # run's most recent event-day makes delta application
        # idempotent — a replayed day is detectable as already counted
        [F.col("last_day_d").cast("string").alias("last_day")] if with_meta else []
    )
    return collapsed.select(
        "user_id",
        F.col("tier").cast("long").alias("tier"),
        F.col("valid_from_d").cast("string").alias("valid_from"),
        F.lead("valid_from_d").over(by_user_runs).cast("string").alias("valid_to"),
        "n_days",
        *meta,
    )


def user_tier_scd2_oracle_sql() -> str:
    return """
WITH daily AS (
    SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, count(*) AS n
    FROM events GROUP BY 1, 2
), tiers AS (
    SELECT user_id, d,
           CASE WHEN n <= 2 THEN 0 WHEN n <= 5 THEN 1 ELSE 2 END AS tier
    FROM daily
), marked AS (
    SELECT user_id, d, tier,
           CASE WHEN lag(tier) OVER (PARTITION BY user_id ORDER BY d) IS NULL
                     OR lag(tier) OVER (PARTITION BY user_id ORDER BY d) <> tier
                THEN 1 ELSE 0 END AS new_run
    FROM tiers
), runs AS (
    SELECT user_id, d, tier,
           sum(new_run) OVER (PARTITION BY user_id ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS run_id
    FROM marked
), collapsed AS (
    SELECT user_id, run_id, CAST(max(tier) AS BIGINT) AS tier,
           min(d) AS valid_from_d, count(*) AS n_days
    FROM runs GROUP BY 1, 2
)
SELECT user_id, tier,
       strftime(valid_from_d, '%Y-%m-%d') AS valid_from,
       strftime(lead(valid_from_d) OVER (PARTITION BY user_id ORDER BY valid_from_d),
                '%Y-%m-%d') AS valid_to,
       n_days
FROM collapsed
"""


def events_with_tier_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 dimension join — the consumption side of
    ``user_tier_scd2``: enrich each event with the tier that was valid
    ON ITS DAY (the as-of dimension lookup every warehouse fact query
    runs against a type-2 dim; historically correct, no leakage from
    later tier changes).

    Scale shape: ONE user-key equi-shuffle joins facts to the SCD2
    rows (a handful per user — the residual validity-range predicate
    rides the join, never a cartesian); the daily rollup before the
    join means the join input is (user, day) grain, not raw events.
    Summary output keeps the driver row small: per (tier, day) event
    counts — the tier-mix time series.

    Output: (d, tier, n_user_days, n_events) — exact integers, date as
    ISO string.
    """
    daily = _daily_counts(load_events(spark, sf_dir)).withColumnRenamed(
        "n", "n_events"
    )
    scd2 = _scd2_from_daily(_daily_counts(load_events(spark, sf_dir))).select(
        F.col("user_id").alias("s_user"), "tier",
        F.to_date("valid_from").alias("vf"),
        F.to_date("valid_to").alias("vt"),
    )
    joined = daily.join(
        scd2,
        (daily.user_id == scd2.s_user)
        & (daily.d >= scd2.vf)
        & (scd2.vt.isNull() | (daily.d < scd2.vt)),
    )
    return (
        joined.groupBy(F.col("d").cast("string").alias("d"), "tier")
        .agg(
            F.count("*").alias("n_user_days"),
            F.sum("n_events").alias("n_events"),
        )
    )


def events_with_tier_asof_oracle_sql() -> str:
    scd2 = user_tier_scd2_oracle_sql().strip()
    return f"""
WITH scd2 AS ({scd2}),
daily AS (
    SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, count(*) AS n_events
    FROM events GROUP BY 1, 2
)
SELECT strftime(daily.d, '%Y-%m-%d') AS d, s.tier,
       count(*) AS n_user_days,
       CAST(sum(daily.n_events) AS BIGINT) AS n_events
FROM daily JOIN scd2 s
  ON daily.user_id = s.user_id
 AND daily.d >= CAST(s.valid_from AS DATE)
 AND (s.valid_to IS NULL OR daily.d < CAST(s.valid_to AS DATE))
GROUP BY 1, 2
"""
