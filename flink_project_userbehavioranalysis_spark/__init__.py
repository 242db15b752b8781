"""PySpark-native analytics engine with the capabilities of the
reference Flink project ``agoclover/flink-project-UserBehaviorAnalysis``.

Brand-new Spark-first design (DataFrame / SQL / Catalyst / Structured
Streaming) — NOT a port of the reference's DataStream code. See
SURVEY.md for the capability inventory this package implements.

Layout:
    session.py    SparkSession builder tuned for the testdata + scale posture
    io.py         table loading / event-time normalization
    operators/    batch implementations of every SURVEY §2 capability
    streaming/    Structured Streaming variants + stateful processors
    functions/    reusable column-expression helpers (JSON, text, vectors)
"""

from flink_project_userbehavioranalysis_spark.session import get_spark
from flink_project_userbehavioranalysis_spark.io import load_table, load_events, TABLES

__all__ = ["get_spark", "load_table", "load_events", "TABLES"]
