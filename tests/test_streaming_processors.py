"""Stateful processor tests: streaming ≡ batch ≡ oracle on finite
input (the ST2/ST4/ST5/ST6/ST7 parity promised by SURVEY §4.3)."""

from flink_project_userbehavioranalysis_spark.operators import login as L
from flink_project_userbehavioranalysis_spark.operators import market as M
from flink_project_userbehavioranalysis_spark.operators import order_pay as OP
from flink_project_userbehavioranalysis_spark.streaming import processors as P
from tests.oracle import assert_matches_oracle


def test_order_lifecycle_stream(spark, sf_dir):
    """ST5/ST6: every signup resolves to exactly one of payed/timeout;
    equals the batch matched-join ∪ anti-join."""
    df = P.order_lifecycle_stream(spark, sf_dir)
    assert_matches_oracle(df, P.order_lifecycle_oracle_sql(), sf_dir)
    # batch twins: timeout branch and matched branch partition the output
    t = OP.order_timeout(spark, sf_dir).count()
    m = OP.order_pay_matched(spark, sf_dir).count()
    assert df.count() == t + m


def test_order_lifecycle_equals_batch_union(spark, sf_dir):
    stream = {
        (r["user_id"], r["order_id"], r["create_s"], r["pay_s"], r["status"])
        for r in P.order_lifecycle_stream(spark, sf_dir).collect()
    }
    batch = {
        (r["user_id"], r["order_id"], r["create_s"], r["pay_s"], "payed")
        for r in OP.order_pay_matched(spark, sf_dir).collect()
    } | {
        (r["user_id"], r["order_id"], r["create_s"], None, "timeout")
        for r in OP.order_timeout(spark, sf_dir).collect()
    }
    assert stream == batch


def test_consec_fail_stream(spark, sf_dir):
    """ST2 streaming-exact equals the batch lag() formulation."""
    df = P.consec_fail_stream(spark, sf_dir)
    assert_matches_oracle(df, L.consec_fail_oracle_sql(), sf_dir)
    batch = {tuple(r) for r in L.consec_fail(spark, sf_dir).collect()}
    assert {tuple(r) for r in df.collect()} == batch


def test_tx_reconcile_stream(spark, sf_dir):
    """ST7 streaming-exact equals the batch full-outer range join —
    including both unmatched side outputs."""
    df = P.tx_reconcile_stream(spark, sf_dir)
    assert_matches_oracle(df, OP.tx_reconcile_oracle_sql(), sf_dir)
    batch = {tuple(r) for r in OP.tx_reconcile(spark, sf_dir).collect()}
    assert {tuple(r) for r in df.collect()} == batch


def test_blacklist_stream_keys_equal_batch(spark, sf_dir):
    """ST4 fire-once: the set of blacklisted (day, user, ad) keys
    equals the batch HAVING formulation's keys."""
    df = P.blacklist_stream(spark, sf_dir)
    assert_matches_oracle(df, P.blacklist_stream_oracle_sql(), sf_dir)
    batch = {
        (r["day_start"], r["user_id"], r["ad_id"])
        for r in M.blacklist(spark, sf_dir).collect()
    }
    assert {tuple(r) for r in df.collect()} == batch


def test_funnel_stream_equals_batch_and_oracle(spark, sf_dir):
    """Streaming CEP funnel is row-for-row the batch operator (sentinel
    MAX_WATERMARK decides every pending anchor), and therefore matches
    the batch oracle too."""
    from flink_project_userbehavioranalysis_spark.operators import relational as R

    st = sorted(tuple(r) for r in P.funnel_stream(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in R.funnel_conversion(spark, sf_dir).collect())
    assert st == b
    assert_matches_oracle(
        P.funnel_stream(spark, sf_dir), R.funnel_conversion_oracle_sql(), sf_dir
    )


def test_trailing_features_stream_equals_batch_oracle(spark, sf_dir):
    """Online/offline feature parity: the stateful streaming generator
    must hash-match the batch RANGE-window oracle exactly — including
    with a different chunking (state crosses micro-batch boundaries)."""
    from flink_project_userbehavioranalysis_spark.operators import behavior as B

    assert_matches_oracle(
        P.trailing_features_stream(spark, sf_dir),
        B.user_trailing_features_oracle_sql(),
        sf_dir,
    )
    assert_matches_oracle(
        P.trailing_features_stream(spark, sf_dir, n_chunks=7),
        B.user_trailing_features_oracle_sql(),
        sf_dir,
    )
