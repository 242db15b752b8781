"""Custom join operators Spark's API lacks as primitives: as-of
(point-in-time) join and range join — expressed as compositions of
existing DataFrame ops, per the brief's custom-operator ladder
(composition first, Pandas UDF only if semantics demand it).

No reference analog (the Flink project joins only on equality+interval,
SURVEY §2.3); these generalize that family the way a feature-store /
training-data pipeline needs: "attribute each purchase to the latest
preceding click" (as-of) and "band numeric measures into configured
tiers" (range join).

Spark-first shapes:
- As-of join = union both sides tagged, ONE window pass per key with
  ``last(value, ignorenulls=True)`` over rows UNBOUNDED PRECEDING..
  CURRENT. This is the scalable form: a single shuffle on the key,
  sequential scan within each key partition, O(n) state — never the
  naive "join all earlier rows then argmax" which explodes to O(n²)
  pairs per key. Matches DuckDB's ASOF LEFT JOIN semantics exactly.
- Range join = explode the range side into covering fixed-width
  buckets, equi-join on bucket id, then re-check the exact bounds as a
  residual predicate. The equi-key turns a nested-loop/cross plan into
  a hash join; with a tiny range side Catalyst broadcasts it (audited
  in tests), and with a LARGE range side the same plan becomes a
  shuffled hash join on bucket — the both-sides-big scale path a plain
  BETWEEN theta-join (BroadcastNestedLoopJoin) cannot take.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flink_project_userbehavioranalysis_spark.functions import money
from flink_project_userbehavioranalysis_spark.io import load_events

# ------------------------------------------------------------- as-of join


def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time attribution: for every 'purchase', the latest
    'click' by the same user at-or-before the purchase (left as-of
    join — purchases with no prior click keep NULLs).

    Tie-break (same user, same µs timestamp): the click with the
    larger event_id wins, both here (window order ``event_id ASC`` →
    ``last`` picks the max) and in the oracle (clicks pre-reduced to
    ``max(event_id)`` per (user, ts) before DuckDB's ASOF JOIN, whose
    own tie choice would otherwise be unspecified).

    Plan: one exchange on user_id, one Window node computing both
    carried columns, filter side=purchase. State per key is one row —
    the running latest click — so the same shape runs at any scale.
    """
    events = load_events(spark, sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("side"),
    )
    pays = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("side"), F.asc_nulls_first("click_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = clicks.unionByName(pays)
    return (
        tagged.withColumn("m_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn(
            "m_click_ts",
            F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w),
        )
        .filter(F.col("side") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").cast("long").alias("purchase_s"),
            F.col("m_click_id").alias("click_id"),
            F.col("m_click_ts").cast("long").alias("click_s"),
        )
    )


def asof_last_click_oracle_sql() -> str:
    return """
WITH clicks AS (
    SELECT user_id, ts, max(event_id) AS click_id
    FROM events WHERE event_type = 'click' GROUP BY 1, 2
), pays AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id,
       p.user_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_s,
       c.click_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_s
FROM pays p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# ------------------------------------------------------------- range join

# (tier, lo, hi) — half-open [lo, hi) bands over events.value.
VALUE_TIERS = [
    ("micro", 0, 25),
    ("small", 25, 50),
    ("medium", 50, 100),
    ("large", 100, 250),
    ("jumbo", 250, 1000),
]
_BUCKET_W = 25


def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band events into configured value tiers via a bucketed range
    join, then aggregate count + exact-DECIMAL revenue per tier.

    Each [lo, hi) band is exploded into its covering width-25 buckets;
    events compute ``floor(value/25)`` and equi-join on the bucket id
    with the exact bounds as a residual predicate. Tier boundaries are
    integers and bucket-aligned, so the residual only trims rows when a
    band doesn't align (kept anyway for generality). The tier side here
    is tiny (Catalyst broadcasts the exploded ~45 rows — plan-audited);
    the identical plan with a LARGE range side becomes a shuffled hash
    join on bucket, which a BETWEEN-only theta join can never be.
    """
    events = load_events(spark, sf_dir)
    tiers = spark.createDataFrame(VALUE_TIERS, "tier string, lo int, hi int")
    bucketed = tiers.select(
        "tier",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                (F.col("lo") / _BUCKET_W).cast("long"),
                ((F.col("hi") - 1) / _BUCKET_W).cast("long"),
            )
        ).alias("bucket"),
    )
    ev = events.select("value", F.floor(F.col("value") / _BUCKET_W).alias("bucket"))
    return (
        ev.join(bucketed, "bucket")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(money("value")).cast("double").alias("sum_value"),
        )
    )


def range_join_tiers_oracle_sql() -> str:
    values = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in VALUE_TIERS)
    return f"""
WITH tiers(tier, lo, hi) AS (VALUES {values})
SELECT t.tier,
       count(*) AS n_events,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e
JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY 1
"""
