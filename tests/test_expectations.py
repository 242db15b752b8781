"""Data-quality expectation suite: oracle-match + fusion invariants."""

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.io import TABLES, load_table
from flink_project_userbehavioranalysis_spark.operators import expectations as X
from tests.oracle import assert_matches_oracle


def test_table_expectations_oracle(spark, sf_dir):
    df = X.table_expectations(spark, sf_dir)
    assert_matches_oracle(df, X.table_expectations_oracle_sql(), sf_dir)
    rows = {r["check"]: r for r in df.collect()}
    assert len(rows) == 11
    # every check verdict is consistent with its violation count
    for r in rows.values():
        assert r["passed"] == (r["n_violations"] == 0)
        assert 0 <= r["n_violations"] <= r["n_checked"]
    # the generated data satisfies keys/domains/FKs
    for name in (
        "events_event_id_unique",
        "events_type_in_domain",
        "orders_custkey_references_customer",
        "lineitem_orderkey_references_orders",
    ):
        assert rows[name]["passed"], name


def test_expectations_fused_single_pass(spark, sf_dir):
    """N column checks on one table must compile to ONE aggregate scan
    of it, not N jobs. events carries 5 expectations and no FK role →
    exactly one scan proves the fusion. orders/lineitem additionally
    appear as FK anti-join sides (key-only, 1-column reads) and a
    row-count for the FK verdict's n_checked (metadata-only parquet
    count) — bounded, never another full-width pass per check."""
    df = X.table_expectations(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftAnti") == 2
    assert plan.count("events.parquet") == 1
    assert plan.count("orders.parquet") <= 4
    assert plan.count("lineitem.parquet") <= 3


def test_expectations_empty_input_gate_passes(spark, sf_dir, tmp_path):
    """An empty batch is a PASS (0 violations), not a NULL verdict."""
    d = tmp_path / "sf_empty"
    d.mkdir()
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(0).write.parquet(str(d / f"{t}.parquet"))
    rows = X.table_expectations(spark, str(d)).collect()
    assert len(rows) == 11
    for r in rows:
        assert r["n_violations"] == 0 and bool(r["passed"]) is True


def test_expectations_stream_matches_hourly_oracle(spark, sf_dir):
    """Streaming twin: per-hour violation counts over the replayed
    event stream equal the batch hourly SQL on identical input."""
    from flink_project_userbehavioranalysis_spark.streaming.windowed import (
        expectations_stream,
    )

    df = expectations_stream(spark, sf_dir)
    assert_matches_oracle(df, X.expectations_hourly_oracle_sql(), sf_dir)
    rows = df.collect()
    checks = {r["check"] for r in rows}
    assert checks == {
        "events_type_in_domain",
        "events_value_positive",
        "events_value_le_400",
    }
    # generated data is in-domain: only the value cap can fire
    assert all(r["passed"] for r in rows if r["check"] != "events_value_le_400")


def test_expectations_catch_planted_violations(spark, sf_dir, tmp_path):
    """Plant one violation of each family and assert the right checks
    flip to failed with exact counts."""
    d = tmp_path / "sf_bad"
    d.mkdir()
    for t in TABLES:
        if t in ("events", "orders"):
            continue
        load_table(spark, sf_dir, t).write.parquet(str(d / f"{t}.parquet"))
    ev = load_table(spark, sf_dir, "events")
    dup = ev.limit(1)  # duplicate key
    bad_type = ev.limit(1).withColumn("event_type", F.lit("bogus")).withColumn(
        "event_id", F.col("event_id") + 10_000_000
    )
    ev.unionByName(dup).unionByName(bad_type).write.parquet(str(d / "events.parquet"))
    orders = load_table(spark, sf_dir, "orders")
    orphan = (
        orders.limit(1)
        .withColumn("o_custkey", F.lit(-1).cast("long"))
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    orders.unionByName(orphan).write.parquet(str(d / "orders.parquet"))
    rows = {r["check"]: r for r in X.table_expectations(spark, str(d)).collect()}
    assert rows["events_event_id_unique"]["n_violations"] == 1
    assert rows["events_type_in_domain"]["n_violations"] == 1
    assert rows["orders_custkey_references_customer"]["n_violations"] == 1
    assert not rows["orders_custkey_references_customer"]["passed"]
    # untouched families still pass
    assert rows["lineitem_quantity_in_range"]["passed"]
