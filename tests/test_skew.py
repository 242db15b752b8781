"""Skew-handling audits: salting is a physical rewrite (P9/A4) and
bucketing co-locates joins — both must leave results bit-identical
while visibly changing the plan."""

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.io import load_table
from flink_project_userbehavioranalysis_spark.operators import market as M
from flink_project_userbehavioranalysis_spark.operators import skew as SK


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_equals_plain(spark, sf_dir):
    salted = SK.salted_count_by_channel(spark, sf_dir, buckets=16)
    plain = M.count_by_channel_behavior(spark, sf_dir)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_agg_is_two_stage(spark, sf_dir):
    plan = _plan(SK.salted_count_by_channel(spark, sf_dir, buckets=16))
    # the salt expression exists in stage 1's grouping (Catalyst renames
    # the column to _groupingexpression but keeps the hash expression)
    assert "pmod(xxhash64" in plan
    # two logical shuffles: (key, salt) then (key) — vs one in the plain plan
    assert plan.count("Exchange hashpartitioning") >= 2
    plain = _plan(M.count_by_channel_behavior(spark, sf_dir))
    assert plain.count("Exchange hashpartitioning") == 1


def test_salted_join_is_shuffled_not_broadcast(spark, sf_dir):
    df = SK.revenue_by_priority_salted(spark, sf_dir, buckets=4)
    plan = _plan(df)
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_salted_join_equals_plain_broadcast_join(spark, sf_dir):
    salted = SK.revenue_by_priority_salted(spark, sf_dir, buckets=4)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    from flink_project_userbehavioranalysis_spark.functions import money

    disc = money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - money("l_discount"))
    plain = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), F.sum(disc).alias("rev"))
        .select("o_orderpriority", "n_lines", F.col("rev").cast("double").alias("revenue"))
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salt_is_deterministic_across_runs(spark, sf_dir):
    a = _sorted_rows(SK.revenue_by_priority_salted(spark, sf_dir, buckets=4))
    b = _sorted_rows(SK.revenue_by_priority_salted(spark, sf_dir, buckets=4))
    assert a == b


# ------------------------------------------------------------ bucketed joins


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketing both sides of a recurring join key removes the
    per-query shuffle entirely — the 100 TB pattern for fact tables
    joined on the same key every day. Both sides are written with
    ``bucketBy(4, l_orderkey/o_orderkey)``; the sort-merge join over
    the bucketed scans must contain NO Exchange."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    (
        li.write.mode("overwrite")
        .bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "li_b"))
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "ord_b"))
        .saveAsTable("ord_bucketed")
    )
    try:
        joined = (
            spark.table("li_bucketed")
            .hint("merge")
            .join(
                spark.table("ord_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
        # and the result is the same as the plain (shuffling) join
        n_bucketed = joined.count()
        n_plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert n_bucketed == n_plain
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_aqe_skew_join_split(spark):
    """AQE skew-join splitting — the engine's default answer to hot
    keys (SURVEY §4.1): a sort-merge join whose probe side is 90%
    one key gets its oversized partition split at runtime, visible as
    skew=true on the join in the AQE-final plan. Salting (the explicit
    rewrite, tested above) is the fallback when AQE can't apply."""
    import pyspark.sql.functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in [
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        big = spark.range(400_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(400_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        joined = big.join(dim, "k")
        rows = joined.collect()  # finalize AQE on THIS plan object
        assert len(rows) == 400_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime bloom-filter semi-join reduction (the 100 TB fact-fact
    join saver): with the optimizer's runtime bloom filter enabled, a
    selective dim-side filter injects a might_contain() pre-filter on
    the fact scan BEFORE its shuffle — rows that cannot join never
    enter the exchange. Results must be identical with and without
    (it is a pure physical rewrite). Conf is set-and-restored; the
    engine leaves the default planner state untouched elsewhere."""
    import pyspark.sql.functions as FF

    from tests.conftest import SF_DIR_MID as sf

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet").filter(
        FF.col("o_orderpriority") == "1-URGENT"
    )

    def q():
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(FF.count("*").alias("n"), FF.sum("l_quantity").alias("q"))
        )

    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # shuffled join, so pruning matters
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        with_bloom = q().collect()
        plan = q()._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]
    baseline = q().collect()
    assert sorted(map(tuple, with_bloom)) == sorted(map(tuple, baseline))
