"""S3/S6 — Kafka consumer and producer builders.

Reference: FlinkKafkaConsumer over topic 'hotitems' + the
KafkaProducerUtil test harness (HotItems.scala kafka variant,
KafkaProducerUtil.scala :: writeToKafka [U]).

Spark-native: ``format("kafka")`` both ways. The spark-sql-kafka
connector jar is NOT on this container's classpath, so these builders
raise Spark's clear data-source-not-found error at ``load()``/
``start()`` time; construction and option plumbing are testable
regardless.

To enable in a real deployment (PySpark 4.1.x is Scala 2.13), either::

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 app.py

or in code, before the session is created::

    SparkSession.builder.config(
        "spark.jars.packages",
        "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2")

``tests/test_sources.py::test_kafka_roundtrip`` is the live integration
check: it is skip-marked and activates automatically when the connector
class is on the classpath AND ``$KAFKA_BOOTSTRAP`` points at a broker.

At scale: maxOffsetsPerTrigger is the backpressure analog of Flink's
credit-based flow control (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_project_userbehavioranalysis_spark.sources.csv_source import (
    events_from_csv_lines,
)


def kafka_events_stream(
    spark: SparkSession,
    topic: str = "hotitems",
    bootstrap: str = "localhost:9092",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """readStream from Kafka, CSV-parsing the value column into the
    normalized event schema (S3 + S2's from_csv leg)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()  # raises if the kafka connector jar is absent
    return events_from_csv_lines(raw.selectExpr("CAST(value AS STRING) AS value"))


def kafka_writer(df: DataFrame, topic: str, bootstrap: str = "localhost:9092"):
    """S6 — Kafka producer leg: CSV-ish value column → topic. Returns
    the configured writer (caller calls .start() / .save())."""
    out = df.selectExpr("CAST(event_id AS STRING) AS key", "to_csv(struct(*)) AS value")
    if df.isStreaming:
        return (
            out.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
        )
    return (
        out.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
    )
