"""Time-series gap analytics (operators/timeseries.py): oracle parity,
grid density/boundedness, LOCF fill semantics, exact interpolation vs a
Fraction recompute, and the OHLC plan shape (one partial-agg shuffle).
"""

from fractions import Fraction

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.operators import timeseries as T
from flink_project_userbehavioranalysis_spark.streaming.windowed import ts_ohlc_stream
from tests.oracle import assert_matches_oracle


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ohlc_matches_oracle(spark, sf_dir):
    assert_matches_oracle(T.ts_ohlc_hourly(spark, sf_dir), T.ts_ohlc_oracle_sql(), sf_dir)


def test_locf_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        T.ts_gapfill_locf(spark, sf_dir), T.ts_gapfill_locf_oracle_sql(), sf_dir
    )


def test_interp_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        T.ts_gapfill_interp(spark, sf_dir), T.ts_gapfill_interp_oracle_sql(), sf_dir
    )


def test_ohlc_stream_matches_batch_oracle(spark, sf_dir):
    """streaming ≡ batch ≡ oracle on the finite replay."""
    assert_matches_oracle(ts_ohlc_stream(spark, sf_dir), T.ts_ohlc_oracle_sql(), sf_dir)


def test_grid_dense_and_bounded(spark, sf_dir):
    """The LOCF output is the FULL (type × hour) rectangle: every type
    carries every hour in [min, max] exactly once — the grid's row
    count is (time range × type roster), independent of raw rows."""
    rows = T.ts_gapfill_locf(spark, sf_dir).collect()
    types = {r.event_type for r in rows}
    hours = {r.hour_start for r in rows}
    assert len(rows) == len(types) * len(hours)
    assert hours == set(range(min(hours), max(hours) + 3600, 3600))
    seen = {(r.event_type, r.hour_start) for r in rows}
    assert len(seen) == len(rows)


def test_locf_fill_semantics(spark, sf_dir):
    """Gap rows carry the last observed hour's value; rows before a
    type's first observation stay NULL; observed rows carry their own
    hourly last value."""
    rows = sorted(
        T.ts_gapfill_locf(spark, sf_dir).collect(),
        key=lambda r: (r.event_type, r.hour_start),
    )
    last_by_type: dict[str, int | None] = {}
    n_gap_filled = 0
    for r in rows:
        prev = last_by_type.get(r.event_type)
        if r.obs == 0:
            assert r.cents == prev  # None before first obs, carried after
            n_gap_filled += prev is not None
        else:
            assert r.cents is not None
            last_by_type[r.event_type] = r.cents
    assert n_gap_filled > 0, "fixture has no gap to fill — test is vacuous"


def test_interp_exact_vs_fraction_recompute(spark, sf_dir):
    """milli == floor(1000 · exact rational interpolation) recomputed
    per grid point from the raw bracketing observations with Fraction —
    pins the overflow-free BIGINT split to the true rational value."""
    obs = sorted(
        T._obs(spark, sf_dir).collect(), key=lambda r: (r.event_type, r.t_us, r.event_id)
    )
    out = T.ts_gapfill_interp(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in obs:
        by_type.setdefault(r.event_type, []).append(r)
    import bisect

    checked = 0
    for r in out:
        series = by_type[r.event_type]
        ts = [o.t_us for o in series]
        t = r.hour_start * 1_000_000
        i = bisect.bisect_right(ts, t)  # first obs strictly after t
        prev = series[i - 1] if i > 0 else None
        nxt = series[i] if i < len(series) else None
        if prev is None or nxt is None:
            assert r.milli is None and r.span_us is None
            continue
        den = nxt.t_us - prev.t_us
        exact = Fraction(
            prev.cents * (nxt.t_us - t) + nxt.cents * (t - prev.t_us), den
        )
        assert r.milli == (1000 * exact.numerator) // exact.denominator
        assert r.span_us == den
        checked += 1
    assert checked > 100


def test_ohlc_invariants(spark, sf_dir):
    df = T.ts_ohlc_hourly(spark, sf_dir)
    assert (
        df.filter(
            (F.col("low_cents") > F.least("open_cents", "close_cents"))
            | (F.col("high_cents") < F.greatest("open_cents", "close_cents"))
        ).count()
        == 0
    )
    total = df.agg(F.sum("n_events")).first()[0]
    raw = T._obs(spark, sf_dir).count()
    assert total == raw


def test_ohlc_plan_one_shuffle_no_sort(spark, sf_dir):
    """Open/close via struct extrema keeps OHLC a plain partial-agg
    rollup: exactly one hash Exchange, no window Sort, no Python."""
    plan = _plan(T.ts_ohlc_hourly(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_locf_grid_joins_are_bounded(spark, sf_dir):
    """The only nested-loop join in the fill plans is the grid cross
    join over two grid-sized relations (types × hour spine), and the
    grid→hourly attach is a plain join — no corpus-scale cartesian."""
    plan = _plan(T.ts_gapfill_locf(spark, sf_dir))
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_seasonal_naive_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        T.ts_seasonal_naive(spark, sf_dir), T.ts_seasonal_naive_oracle_sql(), sf_dir
    )


def test_seasonal_naive_semantics(spark, sf_dir):
    """Every backtest row: the forecast equals the filled grid value
    exactly one week earlier, abs_err consistent, and no row earlier
    than one week past the series start."""
    filled = {
        (r.event_type, r.hour_start): r.cents
        for r in T.ts_gapfill_locf(spark, sf_dir).collect()
    }
    rows = T.ts_seasonal_naive(spark, sf_dir).collect()
    assert rows
    h0 = min(h for (_t, h) in filled)
    for r in rows:
        assert r.hour_start >= h0 + T.WEEK_S
        assert r.forecast_cents == filled[(r.event_type, r.hour_start - T.WEEK_S)]
        assert r.abs_err == abs(r.actual_cents - r.forecast_cents)
