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


def test_hot_items_bucketed_equals_direct(spark, sf_dir):
    """Two-level bucket rollup ≡ direct sliding window, row for row,
    and it matches the shared oracle independently."""
    from flink_project_userbehavioranalysis_spark.operators.hot_items import (
        hot_items,
        hot_items_bucketed,
        hot_items_oracle_sql,
    )
    from tests.oracle import assert_matches_oracle

    direct = {tuple(r) for r in hot_items(spark, sf_dir).collect()}
    bucketed_df = hot_items_bucketed(spark, sf_dir)
    bucketed = {tuple(r) for r in bucketed_df.collect()}
    assert bucketed == direct and len(bucketed) > 0
    assert_matches_oracle(bucketed_df, hot_items_oracle_sql(), sf_dir)


def test_hot_items_bucketed_plan_two_stage(spark, sf_dir):
    """The rollup's plan shape: partial aggregation before BOTH
    exchanges (slide-grain stage and window stage), explode runs on
    aggregated rows (after the first exchange), no Python eval."""
    from flink_project_userbehavioranalysis_spark.operators.hot_items import (
        hot_items_bucketed,
    )

    plan = (
        hot_items_bucketed(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("partial_count") >= 1 and plan.count("partial_sum") >= 1
    assert "BatchEvalPython" not in plan
    # explode (Generate) sits above the first HashAggregate, not on the scan
    gen_pos = plan.find("Generate explode")
    first_agg_pos = plan.rfind("partial_count")
    assert gen_pos != -1 and first_agg_pos != -1 and gen_pos < first_agg_pos


def test_hot_items_sql_equals_dataframe(spark, sf_dir):
    """§2.9 SQL-variant parity: the pure-SQL flagship is row-identical
    to the DataFrame one and hits the same oracle — one engine, two
    front ends."""
    from flink_project_userbehavioranalysis_spark.operators.hot_items import (
        hot_items,
        hot_items_oracle_sql,
        hot_items_sql,
    )
    from tests.oracle import assert_matches_oracle

    sql_df = hot_items_sql(spark, sf_dir)
    assert {tuple(r) for r in sql_df.collect()} == {
        tuple(r) for r in hot_items(spark, sf_dir).collect()
    }
    assert_matches_oracle(sql_df, hot_items_oracle_sql(), sf_dir)
