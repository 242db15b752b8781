"""Declarative data-quality expectations over the ingest tables — the
Deequ-style verification gate a production pipeline runs BEFORE
letting a batch into training or analytics (null checks, key
uniqueness, domain membership, range bounds, referential integrity).

Reference mapping (SURVEY.md §2, [U] — checkout empty): the reference
project implicitly trusts its CSV inputs; this is the missing guard a
100 TB deployment adds in front of every operator in this repo.

Scale shape — the whole suite compiles to:
- ONE aggregate pass per table: N column expectations over a table
  become N conditional sums inside a single partial-aggregated scan
  (never one job per check, which would re-read the fact N times).
  The per-table aggregate is a single row; exploding it to one row
  per check is a map-only ``stack``.
- ONE anti-join per referential check: orphan counting probes the
  parent key with a LeftAnti equi-join (build side = parent keys
  only, 1 column) and counts survivors — no full-row join, no
  distinct-collect.
Uniqueness uses exact ``count_distinct`` (one shuffle of the key
column only); at 100 TB swap in ``approx_count_distinct`` if the
key column shuffle dominates — the violation signal (n − distinct)
tolerates sketch error on a gate that alerts, not bills.

Output: (check, n_checked, n_violations, passed) — one row per
expectation, tiny at any SF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_project_userbehavioranalysis_spark.io import load_events, load_table

EVENT_TYPES = ("click", "signup", "error", "view", "purchase")
ORDER_STATUSES = ("O", "F", "P")


def _viol(cond) -> F.Column:
    """Count rows violating an expectation; NULL counts as violation
    (a NULL domain/range value is not a pass). The outer coalesce
    makes the count 0 (not NULL) over an empty table, so an empty
    partition gate-passes instead of emitting NULL verdicts."""
    return F.coalesce(
        F.sum(F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0)), F.lit(0)
    ).cast("long")


def table_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the expectation suite over events / orders / lineitem.

    Eleven expectations, five jobs' worth of work fused into three
    table scans + two key anti-joins (see module docstring).
    """
    ev = load_events(spark, sf_dir)
    ev_agg = ev.agg(
        F.count("*").cast("long").alias("n"),
        (F.count("*") - F.count_distinct("event_id")).cast("long").alias("v_unique"),
        _viol(F.col("ts").isNull()).alias("v_ts_null"),
        _viol(~F.col("event_type").isin(*EVENT_TYPES)).alias("v_type"),
        _viol(~(F.col("value") > 0)).alias("v_value_pos"),
        _viol(F.col("value") > 400).alias("v_value_cap"),
    )
    ev_rows = ev_agg.select(
        F.expr(
            "stack(5,"
            " 'events_event_id_unique', v_unique,"
            " 'events_ts_nonnull', v_ts_null,"
            " 'events_type_in_domain', v_type,"
            " 'events_value_positive', v_value_pos,"
            " 'events_value_le_400', v_value_cap) AS (check, n_violations)"
        ),
        F.col("n").alias("n_checked"),
    )

    orders = load_table(spark, sf_dir, "orders")
    ord_agg = orders.agg(
        F.count("*").cast("long").alias("n"),
        _viol(~F.col("o_orderstatus").isin(*ORDER_STATUSES)).alias("v_status"),
        _viol(~(F.col("o_totalprice") > 0)).alias("v_price"),
    )
    ord_rows = ord_agg.select(
        F.expr(
            "stack(2,"
            " 'orders_status_in_domain', v_status,"
            " 'orders_totalprice_positive', v_price) AS (check, n_violations)"
        ),
        F.col("n").alias("n_checked"),
    )

    li = load_table(spark, sf_dir, "lineitem")
    li_agg = li.agg(
        F.count("*").cast("long").alias("n"),
        _viol(~F.col("l_quantity").between(1, 50)).alias("v_qty"),
        _viol(~F.col("l_discount").between(0, 1)).alias("v_disc"),
    )
    li_rows = li_agg.select(
        F.expr(
            "stack(2,"
            " 'lineitem_quantity_in_range', v_qty,"
            " 'lineitem_discount_unit_interval', v_disc) AS (check, n_violations)"
        ),
        F.col("n").alias("n_checked"),
    )

    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey")
    ord_orphans = (
        orders.select("o_custkey")
        .join(cust_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").cast("long").alias("n_violations"))
        .select(
            F.lit("orders_custkey_references_customer").alias("check"),
            "n_violations",
        )
    )
    ord_keys = orders.select("o_orderkey")
    li_orphans = (
        li.select("l_orderkey")
        .join(ord_keys, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").cast("long").alias("n_violations"))
        .select(
            F.lit("lineitem_orderkey_references_orders").alias("check"),
            "n_violations",
        )
    )
    fk = (
        ord_orphans.crossJoin(
            F.broadcast(orders.agg(F.count("*").cast("long").alias("n_checked")))
        )
        .select("check", "n_violations", "n_checked")
        .unionByName(
            li_orphans.crossJoin(
                F.broadcast(li.agg(F.count("*").cast("long").alias("n_checked")))
            ).select("check", "n_violations", "n_checked")
        )
    )

    out = (
        ev_rows.select("check", "n_checked", "n_violations")
        .unionByName(ord_rows.select("check", "n_checked", "n_violations"))
        .unionByName(li_rows.select("check", "n_checked", "n_violations"))
        .unionByName(fk.select("check", "n_checked", "n_violations"))
    )
    return out.withColumn("passed", F.col("n_violations") == 0)


def table_expectations_oracle_sql() -> str:
    types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    stats = ", ".join(f"'{s}'" for s in ORDER_STATUSES)
    return f"""
WITH ev AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS v_unique,
           CAST(coalesce(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_ts_null,
           CAST(coalesce(sum(CASE WHEN coalesce(event_type NOT IN ({types}), TRUE)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_type,
           CAST(coalesce(sum(CASE WHEN coalesce(NOT (value > 0), TRUE)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_value_pos,
           CAST(coalesce(sum(CASE WHEN coalesce(value > 400, TRUE)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_value_cap
    FROM events
), ords AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(CASE WHEN coalesce(o_orderstatus NOT IN ({stats}), TRUE)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_status,
           CAST(coalesce(sum(CASE WHEN coalesce(NOT (o_totalprice > 0), TRUE)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_price
    FROM orders
), li AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(CASE WHEN coalesce(NOT (l_quantity BETWEEN 1 AND 50), TRUE)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_qty,
           CAST(coalesce(sum(CASE WHEN coalesce(NOT (l_discount BETWEEN 0 AND 1), TRUE)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_disc
    FROM lineitem
), rows_out AS (
    SELECT 'events_event_id_unique' AS check_, n AS n_checked, v_unique AS n_violations FROM ev
    UNION ALL SELECT 'events_ts_nonnull', n, v_ts_null FROM ev
    UNION ALL SELECT 'events_type_in_domain', n, v_type FROM ev
    UNION ALL SELECT 'events_value_positive', n, v_value_pos FROM ev
    UNION ALL SELECT 'events_value_le_400', n, v_value_cap FROM ev
    UNION ALL SELECT 'orders_status_in_domain', n, v_status FROM ords
    UNION ALL SELECT 'orders_totalprice_positive', n, v_price FROM ords
    UNION ALL SELECT 'lineitem_quantity_in_range', n, v_qty FROM li
    UNION ALL SELECT 'lineitem_discount_unit_interval', n, v_disc FROM li
    UNION ALL SELECT 'orders_custkey_references_customer', (SELECT n FROM ords),
        CAST((SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL SELECT 'lineitem_orderkey_references_orders', (SELECT n FROM li),
        CAST((SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
)
SELECT check_ AS "check", n_checked, n_violations,
       n_violations = 0 AS passed
FROM rows_out
"""


def expectations_hourly_oracle_sql() -> str:
    """Batch oracle for ``streaming.windowed.expectations_stream`` —
    the same conditional sums grouped by event-time hour."""
    types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    return f"""
WITH w AS (
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour')
                AS BIGINT) AS window_end,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(coalesce(sum(CASE WHEN coalesce(event_type NOT IN ({types}), TRUE)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_type,
           CAST(coalesce(sum(CASE WHEN coalesce(NOT (value > 0), TRUE)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_value_pos,
           CAST(coalesce(sum(CASE WHEN coalesce(value > 400, TRUE)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_value_cap
    FROM events GROUP BY 1
)
SELECT window_end, 'events_type_in_domain' AS "check", n_checked,
       v_type AS n_violations, v_type = 0 AS passed FROM w
UNION ALL
SELECT window_end, 'events_value_positive', n_checked,
       v_value_pos, v_value_pos = 0 FROM w
UNION ALL
SELECT window_end, 'events_value_le_400', n_checked,
       v_value_cap, v_value_cap = 0 FROM w
"""
