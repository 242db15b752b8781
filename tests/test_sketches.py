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


def test_value_hist_percentiles_within_half_bucket(spark, sf_dir):
    """The construction guarantee: the value at rank ceil(q*n) lies in
    the picked bucket, so the midpoint estimate is within HALF a
    bucket width (0.125 at bin_inv=4) of the exact discrete-rank
    value — for every q, every event_type. (The interpolated
    ``value_percentiles`` twin can sit further away at tiny n because
    interpolation crosses bucket boundaries between sparse order
    statistics; the discrete rank is what the histogram answers.)"""
    import math
    from collections import defaultdict

    ev = load_events(spark, sf_dir)
    by_type = defaultdict(list)
    for r in ev.filter(F.col("value").isNotNull()).select(
        "event_type", "value"
    ).collect():
        by_type[r["event_type"]].append(r["value"])
    hist = {
        r["event_type"]: r
        for r in NF.value_percentiles_hist(spark, sf_dir).collect()
    }
    assert set(hist) == set(by_type)
    for et, h in hist.items():
        vals = sorted(by_type[et])
        for q, col in [(0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")]:
            v_rank = vals[math.ceil(q * len(vals)) - 1]
            assert abs(h[col] - v_rank) <= 0.125 + 1e-9, (et, q, h[col], v_rank)


def test_value_hist_merge_is_exact(spark, sf_dir):
    """Summary mergeability is EXACT, not approximate: summing the
    per-day summaries by bucket must equal the histogram computed
    directly over the raw range — and any split of days into parts
    merges to the same thing (sum associativity, demonstrated on an
    odd/even-day split)."""
    daily = NF.value_hist_daily(spark, sf_dir).cache()
    try:
        merged = sorted(
            daily.groupBy("event_type", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
        ev = load_events(spark, sf_dir)
        direct = sorted(
            ev.filter(F.col("value").isNotNull())
            .groupBy(
                "event_type", F.floor(F.col("value") * 4).alias("bucket")
            )
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        assert [tuple(r) for r in merged] == [tuple(r) for r in direct]
        # associativity: merge(merge(odd days), merge(even days))
        part = daily.withColumn(
            "half", F.dayofmonth(F.to_date("day")) % 2
        )
        partials = part.groupBy("half", "event_type", "bucket").agg(
            F.sum("cnt").alias("cnt")
        )
        remerged = sorted(
            partials.groupBy("event_type", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
        assert [tuple(r) for r in remerged] == [tuple(r) for r in merged]
    finally:
        daily.unpersist()


def test_value_hist_summary_is_compact(spark, sf_dir):
    """The persisted artifact must be summary-sized: bounded by
    days x event_types x (value_range/width), orders of magnitude
    under the raw row count."""
    daily = NF.value_hist_daily(spark, sf_dir)
    n_summary = daily.count()
    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    # capacity bound: days x types x (value_range/width + 1) — the
    # artifact size is INDEPENDENT of the raw row count, which is the
    # whole 100 TB point (raw/summary compression only shows once raw
    # rows exceed the grid capacity, so it is asserted at sf >= 0.1)
    stats = ev.agg(
        F.countDistinct(F.to_date("ts")).alias("days"),
        F.countDistinct("event_type").alias("types"),
        F.max("value").alias("vmax"),
        F.count("*").alias("raw"),
    ).collect()[0]
    capacity = stats["days"] * stats["types"] * (int(stats["vmax"] * 4) + 1)
    assert n_summary <= capacity
    if stats["raw"] >= 50_000:
        assert n_summary < stats["raw"] / 10
    # one row per (day, type, bucket) triple — already aggregated
    assert daily.groupBy("day", "event_type", "bucket").count().filter(
        "count > 1"
    ).count() == 0


def test_value_ddsketch_relative_error_guarantee(spark, sf_dir):
    """DDSketch's construction guarantee: every estimate is within
    alpha (1%) RELATIVE error of the exact discrete-rank value (exact
    zero for the zero-bucket) — the relative-accuracy complement to
    the fixed grid's absolute half-bucket bound."""
    import math
    from collections import defaultdict

    ev = load_events(spark, sf_dir)
    by_type = defaultdict(list)
    for r in ev.filter(F.col("value").isNotNull()).select(
        "event_type", "value"
    ).collect():
        by_type[r["event_type"]].append(r["value"])
    est = {
        r["event_type"]: r
        for r in NF.value_percentiles_ddsketch(spark, sf_dir).collect()
    }
    assert set(est) == set(by_type)
    for et, row in est.items():
        vals = sorted(by_type[et])
        for q, col in [(0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")]:
            v = vals[math.ceil(q * len(vals)) - 1]
            if v <= 0:
                assert row[col] == 0.0
            else:
                assert abs(row[col] - v) / v <= 0.01 + 1e-6, (et, q, row[col], v)
