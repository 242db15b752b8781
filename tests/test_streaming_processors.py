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


def test_trailing_features_func_cross_batch_same_microsecond():
    """Unit-drive the generator across micro-batch boundaries with
    same-µs peers straddling the split — the tail-run re-derivation
    path the real corpus never exercises (no same-user same-µs events
    in the shipped testdata). Frame contract: count strictly-earlier
    events within [us - horizon, us - 1]; same-µs peers excluded;
    t = us - horizon exactly INCLUDED."""
    import pandas as pd

    from flink_project_userbehavioranalysis_spark.streaming.processors import (
        trailing_features_func,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = trailing_features_func(window_days=7)
    horizon = 7 * 86_400 * 1_000_000
    state = FakeState()

    def run(rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts_us", "event_type"]
        ).assign(user_id=1)
        out = list(fn((1,), iter([pdf]), state))
        return list(out[0].itertuples(index=False)) if out else []

    # batch 1: two same-µs events at t=100, one purchase
    r1 = run([(1, 100, "purchase"), (2, 100, "view")])
    assert [(r.n_prev, r.n_prev_purchases) for r in r1] == [(0, 0), (0, 0)]
    # batch 2 REOPENS the same microsecond, then moves on: the third
    # peer at t=100 must still see 0 (state-carried tail run), and the
    # t=200 event sees all three
    r2 = run([(3, 100, "view"), (4, 200, "click")])
    assert [(r.n_prev, r.n_prev_purchases) for r in r2] == [(0, 0), (3, 1)]
    # eviction boundary: t exactly us - horizon is IN the frame;
    # one µs older is OUT
    r3 = run([(5, 100 + horizon, "view")])
    assert [(r.n_prev, r.n_prev_purchases) for r in r3] == [(4, 1)]
    r4 = run([(6, 201 + horizon, "view")])
    # frame [201, 200+horizon]: 100,100,100 AND 200 all evicted
    # (200 < 201); only the event at 100+horizon remains
    assert [(r.n_prev, r.n_prev_purchases) for r in r4] == [(1, 0)]
