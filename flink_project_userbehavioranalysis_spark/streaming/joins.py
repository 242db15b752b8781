"""Stream-stream joins (J1/J2 streaming; SURVEY §2.3).

The reference's TxMatch family is a CoProcessFunction/intervalJoin over
two keyed streams; Spark's declarative twin is the watermarked
stream-stream join — both sides buffered in the state store, matched
within the time-range condition, state evicted by watermark. This
module exposes exactly that (the stateful-processor variants in
processors.py are the imperative twins; both are tested equal to the
same batch oracles).

Inner joins emit eagerly on match; outer joins emit their null-padded
(unmatched) rows only once the watermark proves no partner can arrive —
so the full-outer reconcile needs the end-of-input sentinel to flush,
exactly like the processors.

Scale posture: both sides shuffle once on user_id (co-partitioned by
the join exchange); state per key is bounded by the range condition ×
watermark delay. This is the shape that replaces the reference's
payState/receiptState at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_project_userbehavioranalysis_spark.streaming.replay import (
    SENTINEL_TYPE,
    events_stream,
    run_append_memory,
)


def _typed_stream(
    ev: DataFrame, event_type: str, prefix: str, keep_sentinel: bool = False
) -> DataFrame:
    """Filter one side of the join to its event type. ``keep_sentinel``
    retains the far-future sentinel row: the type filter would
    otherwise be pushed below the watermark operator and the sentinel
    would never be observed — the watermark then stops short of the
    final deadlines and outer-join tails stay buffered forever. The
    sentinel's user_id is -1, so callers drop it after the join."""
    cond = F.col("event_type") == event_type
    if keep_sentinel:
        cond = cond | (F.col("event_type") == SENTINEL_TYPE)
    return ev.filter(cond).select(
        F.col("user_id").alias(f"{prefix}_user"),
        F.col("ts").alias(f"{prefix}_ts"),
        F.col("event_id").alias(f"{prefix}_id"),
    )


def interval_join_stream(
    spark: SparkSession,
    sf_dir: str,
    horizon: str = "1 hour",
    n_chunks: int = 4,
    watermark: str = "10 minutes",
) -> DataFrame:
    """J2 streaming — watermarked stream-stream INNER join: every
    (click, purchase) pair per user with purchase in [click, click+h]
    (reference TxMatchWithJoin.scala :: intervalJoin.between [U]).
    Inner pairs emit eagerly, so finite input needs no sentinel."""
    clicks = _typed_stream(
        events_stream(spark, sf_dir, n_chunks=n_chunks, watermark=watermark), "click", "c"
    )
    pays = _typed_stream(
        events_stream(spark, sf_dir, n_chunks=n_chunks, watermark=watermark),
        "purchase",
        "p",
    )
    joined = clicks.join(
        pays,
        F.expr(
            f"c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL {horizon}"
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        F.col("c_id").alias("click_id"),
        F.col("p_id").alias("pay_id"),
        F.col("c_ts").cast("long").alias("click_s"),
        F.col("p_ts").cast("long").alias("pay_s"),
    )
    return run_append_memory(joined, "interval_join_stream", spark)


def tx_reconcile_stream_join(
    spark: SparkSession,
    sf_dir: str,
    delta: str = "5 minutes",
    n_chunks: int = 4,
    watermark: str = "10 minutes",
) -> DataFrame:
    """J1/ST7 streaming — watermarked FULL OUTER stream-stream join of
    purchases against clicks per user within ±delta (reference
    TxMatch.scala :: TxPayMatch [U]). Null-padded rows are the
    unmatched side outputs; they emit when the watermark proves no
    partner can arrive, so the end-of-input sentinel flushes the tail.
    Same output contract as the batch tx_reconcile and the
    keyed_reconcile processor."""
    pays = _typed_stream(
        events_stream(
            spark, sf_dir, n_chunks=n_chunks, sentinel=True, watermark=watermark
        ),
        "purchase",
        "p",
        keep_sentinel=True,
    )
    receipts = _typed_stream(
        events_stream(
            spark, sf_dir, n_chunks=n_chunks, sentinel=True, watermark=watermark
        ),
        "click",
        "r",
        keep_sentinel=True,
    )
    joined = pays.join(
        receipts,
        F.expr(
            f"p_user = r_user AND r_ts >= p_ts - INTERVAL {delta} "
            f"AND r_ts <= p_ts + INTERVAL {delta}"
        ),
        "full_outer",
    ).select(
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
    out = run_append_memory(joined, "tx_reconcile_stream_join", spark)
    return out.filter(F.col("user_id") >= 0)  # drop the sentinel's self-match
