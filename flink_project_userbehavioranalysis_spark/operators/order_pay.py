"""OrderPayDetect capabilities: order-timeout detection and two-stream
transaction reconciliation — the reference's join/CEP module.

Reference: OrderPayDetect/.../{OrderTimeout, OrderTimeoutWithoutCep,
TxMatch, TxMatchWithJoin}.scala [U] (SURVEY §2.3 J1-J3, §2.7 ST5-ST7).

Mapping onto driver testdata (FIXTURES §B): create := 'signup' events,
pay := 'purchase' events, keyed per user_id; the second reconcile
stream (receipts) := 'click' events (click↔purchase self-join).

Spark-first shapes (not NFA/CoProcessFunction translations):
- J3 order timeout  = LEFT ANTI join with a time-range condition. The
  join strategy is deliberately NOT hinted: the pay side grows with the
  events table, so a forced broadcast would OOM every executor at 100×.
  The equi-key (user_id) makes the large-scale plan a shuffled anti-join
  (sort-merge / shuffled-hash), and AQE upgrades it to broadcast at
  runtime when the filtered pay side is actually under the threshold —
  both regimes are plan-audited in tests.
- J3 matched        = range equi-join + min(pay_ts) per create (CEP
  "first pay after create within horizon").
- J2 interval join  = inner equi-join on user_id with the range as a
  join-time filter — Catalyst plans one shuffle on the key; the range
  predicate is evaluated inside the join, never as a post-join filter
  on an exploded cross product.
- J1 reconcile      = FULL OUTER equi-join on user_id with ±delta range
  condition; null-padded sides replace the reference's side outputs
  ('unmatched-pays' / 'unmatched-receipts').

Scale notes: all joins key on user_id → single hash-partition exchange
per side; AQE skew-join splitting handles hot users. No driver-side
state; horizons bound streaming state when the same plans run with
watermarks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_project_userbehavioranalysis_spark.io import load_events


def _typed(events: DataFrame, event_type: str, prefix: str) -> DataFrame:
    return events.filter(F.col("event_type") == event_type).select(
        F.col("user_id").alias(f"{prefix}_user"),
        F.col("ts").alias(f"{prefix}_ts"),
        F.col("event_id").alias(f"{prefix}_id"),
    )


def order_timeout(spark: SparkSession, sf_dir: str, horizon: str = "24 hours") -> DataFrame:
    """J3/ST5/ST6 timeout branch — 'signup' (create) events with no
    'purchase' (pay) by the same user within ``horizon``.

    Reference OrderTimeout.scala :: OrderTimeoutSelect timeout side
    output [U]. Batch = LEFT ANTI join on the user key; strategy left
    to Catalyst/AQE (broadcast only when the pay side is actually
    small — it is unbounded in general, so no forced hint).
    """
    events = load_events(spark, sf_dir)
    creates = _typed(events, "signup", "c")
    pays = _typed(events, "purchase", "p")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return (
        creates.join(pays, cond, "left_anti")
        .select(
            F.col("c_user").alias("user_id"),
            F.col("c_id").alias("order_id"),
            F.col("c_ts").cast("long").alias("create_s"),
        )
    )


def order_pay_matched(spark: SparkSession, sf_dir: str, horizon: str = "24 hours") -> DataFrame:
    """J3 matched branch — first 'purchase' after each 'signup' within
    ``horizon`` (CEP create followedBy pay within(horizon), reference
    OrderTimeout.scala :: OrderPaySelect [U])."""
    events = load_events(spark, sf_dir)
    creates = _typed(events, "signup", "c")
    pays = _typed(events, "purchase", "p")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return (
        creates.join(pays, cond, "inner")
        .groupBy("c_user", "c_id", "c_ts")
        .agg(F.min("p_ts").alias("pay_ts"))
        .select(
            F.col("c_user").alias("user_id"),
            F.col("c_id").alias("order_id"),
            F.col("c_ts").cast("long").alias("create_s"),
            F.col("pay_ts").cast("long").alias("pay_s"),
        )
    )


def interval_join(spark: SparkSession, sf_dir: str, horizon: str = "1 hour") -> DataFrame:
    """J2 — inner interval join: every (click, purchase) pair per user
    with purchase time in [click, click + horizon] (reference
    TxMatchWithJoin.scala :: TxPayMatchByJoin .between(...) [U])."""
    events = load_events(spark, sf_dir)
    clicks = _typed(events, "click", "c")
    pays = _typed(events, "purchase", "p")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return clicks.join(pays, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        F.col("c_id").alias("click_id"),
        F.col("p_id").alias("pay_id"),
        F.col("c_ts").cast("long").alias("click_s"),
        F.col("p_ts").cast("long").alias("pay_s"),
    )


def tx_reconcile(spark: SparkSession, sf_dir: str, delta: str = "5 minutes") -> DataFrame:
    """J1/ST7 — full-outer reconciliation of 'purchase' (pays) against
    'click' (receipts) per user within ±delta (reference TxMatch.scala
    :: TxPayMatch CoProcessFunction [U]). Null-padded rows are the
    reference's 'unmatched-pays' / 'unmatched-receipts' side outputs,
    expressed as a status column instead of separate streams."""
    events = load_events(spark, sf_dir)
    pays = _typed(events, "purchase", "p")
    receipts = _typed(events, "click", "r")
    cond = (
        (F.col("p_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {delta}"))
        & (F.col("r_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {delta}"))
    )
    joined = pays.join(receipts, cond, "full_outer")
    return joined.select(
        F.coalesce("p_user", "r_user").alias("user_id"),
        F.col("p_id").alias("pay_id"),
        F.col("r_id").alias("receipt_id"),
        F.col("p_ts").cast("long").alias("pay_s"),
        F.col("r_ts").cast("long").alias("receipt_s"),
        F.when(F.col("p_id").isNull(), F.lit("unmatched_receipt"))
        .when(F.col("r_id").isNull(), F.lit("unmatched_pay"))
        .otherwise(F.lit("matched"))
        .alias("status"),
    )


# ---------------------------------------------------------------- oracle SQL


def order_timeout_oracle_sql(horizon_hours: int = 24) -> str:
    return f"""
SELECT s.user_id,
       s.event_id AS order_id,
       CAST(floor(epoch(s.ts)) AS BIGINT) AS create_s
FROM events s
WHERE s.event_type = 'signup'
  AND NOT EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id = s.user_id
      AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL {horizon_hours} HOUR)
"""


def order_pay_matched_oracle_sql(horizon_hours: int = 24) -> str:
    return f"""
SELECT s.user_id,
       s.event_id AS order_id,
       CAST(floor(epoch(s.ts)) AS BIGINT) AS create_s,
       CAST(floor(epoch(min(p.ts))) AS BIGINT) AS pay_s
FROM events s
JOIN events p
  ON p.user_id = s.user_id AND p.event_type = 'purchase'
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL {horizon_hours} HOUR
WHERE s.event_type = 'signup'
GROUP BY s.user_id, s.event_id, s.ts
"""


def interval_join_oracle_sql(horizon_hours: int = 1) -> str:
    return f"""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS pay_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_s,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS pay_s
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL {horizon_hours} HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


def tx_reconcile_oracle_sql(delta_minutes: int = 5) -> str:
    return f"""
WITH pays AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), receipts AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
)
SELECT COALESCE(p.user_id, r.user_id) AS user_id,
       p.event_id AS pay_id,
       r.event_id AS receipt_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS pay_s,
       CAST(floor(epoch(r.ts)) AS BIGINT) AS receipt_s,
       CASE WHEN p.event_id IS NULL THEN 'unmatched_receipt'
            WHEN r.event_id IS NULL THEN 'unmatched_pay'
            ELSE 'matched' END AS status
FROM pays p
FULL OUTER JOIN receipts r
  ON p.user_id = r.user_id
 AND r.ts >= p.ts - INTERVAL {delta_minutes} MINUTE
 AND r.ts <= p.ts + INTERVAL {delta_minutes} MINUTE
"""
