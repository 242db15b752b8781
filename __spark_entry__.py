"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_project_userbehavioranalysis_spark.operators import hot_items as _hot


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine-required conf to a driver-provided session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # may be static in some builds; reader then needs pre-set conf
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (W1 hot-items Top-N) on /root/testdata/sf0.001."""
    _configure(spark)
    return _hot.hot_items(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def q(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {
        "hot_items_topn": q(_hot.hot_items),
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry."""
    return {
        "hot_items_topn": _hot.hot_items_oracle_sql(),
    }
