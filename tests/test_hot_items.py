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


def test_hot_items_rollup_equals_direct(spark, sf_dir):
    """Two-level bucket rollup (the flagship) ≡ direct sliding window,
    row for row, and the direct twin matches the shared oracle
    independently."""
    from flink_project_userbehavioranalysis_spark.operators.hot_items import (
        hot_items,
        hot_items_direct,
        hot_items_oracle_sql,
    )
    from tests.oracle import assert_matches_oracle

    rollup = {tuple(r) for r in hot_items(spark, sf_dir).collect()}
    direct_df = hot_items_direct(spark, sf_dir)
    direct = {tuple(r) for r in direct_df.collect()}
    assert rollup == direct and len(rollup) > 0
    assert_matches_oracle(direct_df, hot_items_oracle_sql(), sf_dir)


def test_hot_items_indivisible_slide_falls_back(spark, sf_dir):
    """A window/slide pair the rollup can't decompose still answers
    (via the direct formulation) and matches the direct twin."""
    from flink_project_userbehavioranalysis_spark.operators.hot_items import (
        hot_items,
        hot_items_direct,
    )

    got = {tuple(r) for r in hot_items(spark, sf_dir, window="1 hour", slide="7 minutes").collect()}
    want = {tuple(r) for r in hot_items_direct(spark, sf_dir, window="1 hour", slide="7 minutes").collect()}
    assert got == want and len(got) > 0


def test_hot_items_plan_two_stage(spark, sf_dir):
    """The flagship rollup's plan shape: partial aggregation before
    BOTH exchanges (slide-grain stage and window stage), explode runs
    on aggregated rows (after the first exchange), no Python eval."""
    plan = (
        hot_items(spark, sf_dir)
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
