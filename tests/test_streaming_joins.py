"""Stream-stream joins: watermarked inner/full-outer ≡ batch ≡ oracle
on finite input (J1/J2 streaming; the declarative twins of the
keyed_reconcile processor)."""

from flink_project_userbehavioranalysis_spark.operators import order_pay as OP
from flink_project_userbehavioranalysis_spark.streaming import joins as J
from tests.oracle import assert_matches_oracle


def test_interval_join_stream(spark, sf_dir):
    df = J.interval_join_stream(spark, sf_dir)
    assert_matches_oracle(df, OP.interval_join_oracle_sql(), sf_dir)
    batch = {tuple(r) for r in OP.interval_join(spark, sf_dir).collect()}
    assert {tuple(r) for r in df.collect()} == batch


def test_tx_reconcile_stream_join(spark, sf_dir):
    """Full-outer: matched pairs + both unmatched side outputs, flushed
    by the end-of-input sentinel watermark."""
    df = J.tx_reconcile_stream_join(spark, sf_dir)
    assert_matches_oracle(df, OP.tx_reconcile_oracle_sql(), sf_dir)
    batch = {tuple(r) for r in OP.tx_reconcile(spark, sf_dir).collect()}
    assert {tuple(r) for r in df.collect()} == batch
