"""Sketch-estimate bound tests: approximate operators must land inside
their published error envelopes against exact recomputation."""

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.io import load_events
from flink_project_userbehavioranalysis_spark.operators import network_flow as NF
from flink_project_userbehavioranalysis_spark.operators import relational as R


def test_cms_estimates_bound_true_counts(spark, sf_dir):
    """Count-Min never underestimates, and at eps=1e-4 the overestimate
    on this corpus (N ≈ thousands of views) is ≤ eps·N ≈ a handful."""
    rows = NF.item_freq_sketch(spark, sf_dir, top_n=20).collect()
    assert rows  # non-vacuous
    n_total = (
        load_events(spark, sf_dir)
        .filter((F.col("event_type") == "view") & F.col("item_id").isNotNull())
        .count()
    )
    for r in rows:
        assert r["est_cnt"] >= r["true_cnt"]
        assert r["est_cnt"] <= r["true_cnt"] + max(1, int(0.001 * n_total))


def test_approx_percentiles_near_exact(spark, sf_dir):
    exact = {r["event_type"]: r for r in R.value_percentiles(spark, sf_dir).collect()}
    approx = {
        r["event_type"]: r
        for r in R.value_percentiles_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for et, e in exact.items():
        a = approx[et]
        # GK summary returns a real data value near the target rank;
        # exact interpolates between neighbors. Allow a small relative
        # envelope around the interpolated value.
        for col in ("p50", "p90"):
            tol = max(abs(e[col]) * 0.05, 1e-6)
            assert abs(a[col] - e[col]) <= tol, (et, col, a[col], e[col])


def test_uv_trailing_sketch_bound(spark, sf_dir):
    """Trailing-24h sketch UV within 5% of the exact trailing UV at
    every window position, and position set = hourly ends fanned out
    24 slots (partial edge windows included)."""
    from collections import defaultdict

    import pyspark.sql.functions as F

    from flink_project_userbehavioranalysis_spark.io import load_events
    from flink_project_userbehavioranalysis_spark.operators import network_flow

    got = {
        r["window_end"]: r["uv_trailing"]
        for r in network_flow.uv_trailing_sketch(spark, sf_dir).collect()
    }
    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.floor(F.unix_micros("ts") / 3_600_000_000).cast("long").alias("h"),
            "user_id",
        )
    )
    by_h = defaultdict(set)
    for r in ev.collect():
        by_h[r["h"]].add(r["user_id"])
    exact = defaultdict(set)
    for h, us in by_h.items():
        for j in range(24):
            exact[(h + 1 + j) * 3600] |= us
    assert got.keys() == exact.keys()
    for k, s in exact.items():
        assert abs(got[k] - len(s)) <= max(2, 0.05 * len(s))


def test_retention_sketch_bounds(spark, sf_dir):
    """Inclusion-exclusion retention estimate stays within 10% of the
    exact D1 retention (relative to that day's actives — intersection
    error compounds both sketches'), on every day."""
    from flink_project_userbehavioranalysis_spark.operators import behavior as BX
    from flink_project_userbehavioranalysis_spark.operators import network_flow as NF

    sk = {r["day"]: r for r in NF.retention_sketch(spark, sf_dir).collect()}
    ex = {r["day"]: r for r in BX.retention_rolling(spark, sf_dir).collect()}
    assert sk and set(sk) <= set(ex)
    for day, s in sk.items():
        e = ex[day]
        assert abs(s["active_est"] - e["active"]) <= 0.05 * e["active"] + 1
        assert abs(s["retained_est"] - e["retained_1"]) <= 0.10 * e["active"] + 1
