"""S2 — schema'd CSV ingest (no hand parsing).

The reference hand-parses every CSV with ``line.split(",") →
CaseClass`` (HotItems.scala :: main [~L31] and five clones [U]). The
Spark-native form is a schema'd CSV reader — parse errors become
nulls/PERMISSIVE records instead of exceptions, and the parse runs
JVM-side inside the scan (column pruning + filter pushdown included).
``from_csv`` covers the Kafka-value case where the line arrives as a
column rather than a file.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# The reference's UserBehavior.csv analog for the driver events table:
# epoch-µs long for ts (CSV carries no nanos; µs keeps batch parity).
EVENTS_CSV_SCHEMA = (
    "event_id BIGINT, ts_us BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def write_events_csv(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Materialize the events table as CSV (test fixture / S6 analog)."""
    from flink_project_userbehavioranalysis_spark.io import load_events

    (
        load_events(spark, sf_dir)
        .select(
            "event_id",
            F.expr("ts_ns div 1000").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .option("quote", '"')
        .option("escape", '"')
        .csv(out_dir, header=False)
    )


def read_events_csv(spark: SparkSession, csv_dir: str) -> DataFrame:
    """Schema'd CSV scan → normalized event columns (ts TimestampType),
    mirroring io.normalize_events minus the nanos leg."""
    raw = spark.read.schema(EVENTS_CSV_SCHEMA).option("quote", '"').option("escape", '"').csv(csv_dir)
    return raw.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
        F.get_json_object("props", "$.k").cast("int").alias("item_id"),
    )


def events_from_csv_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """``from_csv`` on a line column — the parse used when lines arrive
    from Kafka (S3) instead of files. Same schema, same outputs."""
    parsed = lines.select(
        F.from_csv(
            F.col(line_col),
            F.lit(EVENTS_CSV_SCHEMA),
            {"quote": '"', "escape": '"'},  # match write_events_csv quoting
        ).alias("r")
    ).select("r.*")
    return parsed.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
        F.get_json_object("props", "$.k").cast("int").alias("item_id"),
    )
