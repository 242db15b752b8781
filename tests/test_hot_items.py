import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.operators.hot_items import (
    hot_items,
    hot_items_oracle_sql,
)
from tests.oracle import assert_matches_oracle


def test_hot_items_matches_oracle(spark, sf_dir):
    df = hot_items(spark, sf_dir)
    assert_matches_oracle(df, hot_items_oracle_sql(), sf_dir)


def test_hot_items_rank_bounded(spark, sf_dir):
    df = hot_items(spark, sf_dir, n=3)
    assert df.filter(F.col("rn") > 3).count() == 0
    # every window has at most 3 rows and ranks are 1..k without gaps
    per_win = df.groupBy("window_end").agg(
        F.count("*").alias("c"), F.max("rn").alias("mx")
    )
    assert per_win.filter(F.col("c") != F.col("mx")).count() == 0
