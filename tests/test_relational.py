"""Relational coverage ops: oracle-match + invariants."""

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.operators import relational as R
from tests.oracle import assert_matches_oracle


def test_tpch_q1ish(spark, sf_dir):
    df = R.tpch_q1ish(spark, sf_dir)
    assert_matches_oracle(df, R.TPCH_Q1ISH_SQL, sf_dir)
    assert df.count() == 6  # R/A/N × O/F minus impossible combos


def test_user_set_ops(spark, sf_dir):
    df = R.user_set_ops(spark, sf_dir)
    assert_matches_oracle(df, R.USER_SET_OPS_SQL, sf_dir)
    # |any| == |both| + |view_only| + |buy_only| (partition invariant)
    c = {r["op"]: r["cnt"] for r in df.groupBy("op").agg(F.count("*").alias("cnt")).collect()}
    assert c["any"] == c.get("both", 0) + c.get("view_only", 0) + c.get("buy_only", 0)


def test_user_sessions(spark, sf_dir):
    df = R.user_sessions(spark, sf_dir)
    assert_matches_oracle(df, R.user_sessions_oracle_sql(), sf_dir)
    # Σ session event counts == total events (conservation)
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert df.agg(F.sum("n_events")).collect()[0][0] == total
    # sessions are non-degenerate: end - start >= gap
    assert df.filter(F.col("session_end") - F.col("session_start") < 1800).count() == 0


def test_behavior_pivot(spark, sf_dir):
    df = R.behavior_pivot(spark, sf_dir)
    assert_matches_oracle(df, R.BEHAVIOR_PIVOT_SQL, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # declared pivot values: ONE scan, no distinct-collect pre-pass
    # (AQE prints final + initial plans; count the final section only)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("events.parquet") == 1
    # wide counts conserve the long total
    import pyspark.sql.functions as _F
    from flink_project_userbehavioranalysis_spark.io import load_events

    total = sum(
        sum(r[f"n_{t}"] for t in R.BEHAVIOR_TYPES) for r in df.collect()
    )
    assert total == load_events(spark, sf_dir).count()


def test_regex_extract_props(spark, sf_dir):
    df = R.regex_extract_props(spark, sf_dir)
    assert_matches_oracle(df, R.REGEX_EXTRACT_PROPS_SQL, sf_dir)
    assert df.count() > 0


def test_date_roundtrip(spark, sf_dir):
    df = R.date_roundtrip(spark, sf_dir)
    assert_matches_oracle(df, R.DATE_ROUNDTRIP_SQL, sf_dir)
    # parse(format(t)) == t at minute grain: epoch is minute-aligned
    assert df.filter(F.col("minute_epoch") % 60 != 0).count() == 0


def test_pv_rollup(spark, sf_dir):
    df = R.pv_rollup(spark, sf_dir)
    assert_matches_oracle(df, R.PV_ROLLUP_SQL, sf_dir)
    # grand total row (gid=3) equals the table row count
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert df.filter(F.col("gid") == 3).collect()[0]["cnt"] == total


def test_value_percentiles(spark, sf_dir):
    df = R.value_percentiles(spark, sf_dir)
    assert_matches_oracle(df, R.VALUE_PERCENTILES_SQL, sf_dir)
    assert df.filter(F.col("p90") < F.col("p50")).count() == 0


def test_funnel_conversion_oracle(spark, sf_dir):
    assert_matches_oracle(
        R.funnel_conversion(spark, sf_dir), R.funnel_conversion_oracle_sql(), sf_dir
    )


def test_funnel_conversion_semantics(spark, sf_dir):
    """One row per view-user; step times strictly increase and stay
    inside the horizon anchored at the first view; every stage is
    populated (genuine drop-off on this corpus at the 24 h default)."""
    df = R.funnel_conversion(spark, sf_dir)
    n_view_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert df.count() == n_view_users
    assert df.filter(F.col("t2_s").isNotNull() & (F.col("t2_s") < F.col("t1_s"))).count() == 0
    assert df.filter(F.col("t3_s").isNotNull() & (F.col("t3_s") < F.col("t2_s"))).count() == 0
    assert (
        df.filter(
            F.col("t3_s").isNotNull() & (F.col("t3_s") - F.col("t1_s") > 86400 + 1)
        ).count()
        == 0
    )
    stages = {r["stage"] for r in df.select("stage").distinct().collect()}
    assert stages == {1, 2, 3}


def test_cohort_retention_oracle(spark, sf_dir):
    assert_matches_oracle(
        R.cohort_retention(spark, sf_dir), R.COHORT_RETENTION_SQL, sf_dir
    )


def test_cohort_retention_semantics(spark, sf_dir):
    """k=0 retention per cohort equals the cohort size exactly (the
    conversion week itself is active), retention never exceeds it at
    any k, k is never negative, and ≥2 cohorts with ≥2 offsets exist
    (the matrix is a matrix, not a row)."""
    df = R.cohort_retention(spark, sf_dir)
    assert df.filter(F.col("k") < 0).count() == 0
    base = df.filter(F.col("k") == 0).select(
        "cohort_week", F.col("retained").alias("size")
    )
    from flink_project_userbehavioranalysis_spark.io import load_events

    ev = load_events(spark, sf_dir)
    sizes = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.floor(F.min(F.col("ts").cast("long")) / 604800).alias("cohort_week"))
        .groupBy("cohort_week")
        .count()
    )
    mismatch = base.join(sizes, "cohort_week", "full").filter(
        F.col("size") != F.col("count")
    )
    assert mismatch.count() == 0
    joined = df.join(base, "cohort_week")
    assert joined.filter(F.col("retained") > F.col("size")).count() == 0
    assert base.count() >= 2
    assert df.select("k").distinct().count() >= 2


def test_user_tier_scd2_validity_ranges(spark, sf_dir):
    """SCD2 invariants: exactly one current (NULL valid_to) row per
    user; ranges are chronologically chained (each row's valid_to =
    next row's valid_from); adjacent runs differ in tier; n_days sums
    to the user's distinct active days."""
    import pyspark.sql.functions as FF

    from flink_project_userbehavioranalysis_spark.io import load_events
    from flink_project_userbehavioranalysis_spark.operators import relational as R

    rows = R.user_tier_scd2(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    active = {
        r["user_id"]: r["nd"]
        for r in load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(FF.countDistinct(FF.to_date("ts")).alias("nd"))
        .collect()
    }
    for u, rs in per_user.items():
        rs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in rs if r["valid_to"] is None) == 1
        assert rs[-1]["valid_to"] is None  # the current row is the last
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]  # chained, no gaps/overlap
            assert a["tier"] != b["tier"]  # runs collapse maximally
        assert sum(r["n_days"] for r in rs) == active[u]


def test_events_with_tier_asof_covers_every_user_day(spark, sf_dir):
    """The point-in-time join is TOTAL (every (user, day) hits exactly
    one validity range — counts conserve) and never a cartesian."""
    import pyspark.sql.functions as FF

    from flink_project_userbehavioranalysis_spark.io import load_events
    from flink_project_userbehavioranalysis_spark.operators import relational as R

    df = R.events_with_tier_asof(spark, sf_dir)
    rows = df.collect()
    ev = load_events(spark, sf_dir)
    n_user_days = ev.select("user_id", FF.to_date("ts")).distinct().count()
    assert sum(r["n_user_days"] for r in rows) == n_user_days
    assert sum(r["n_events"] for r in rows) == ev.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
