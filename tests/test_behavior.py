"""Behavior-analytics pillar (paths / attribution / RFM / dwell):
oracle-match + semantic invariants + plan shape."""

import pytest
import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.io import load_events
from flink_project_userbehavioranalysis_spark.operators import behavior as B
from tests.oracle import assert_matches_oracle


def test_session_paths_topk(spark, sf_dir):
    df = B.session_paths_topk(spark, sf_dir)
    assert_matches_oracle(df, B.session_paths_topk_oracle_sql(), sf_dir)
    rows = df.collect()
    assert rows, "corpus is dense enough to have 3-step paths"
    # rank() semantics: rnk values start at 1 and every path is 3 steps
    assert min(r["rnk"] for r in rows) == 1
    assert all(r["path"].count(">") == 2 for r in rows)
    # counts are non-increasing when sorted by rank
    by_rank = sorted(rows, key=lambda r: (r["rnk"], r["path"]))
    cnts = [r["cnt"] for r in by_rank]
    assert cnts == sorted(cnts, reverse=True)


def test_ad_attribution(spark, sf_dir):
    df = B.ad_attribution(spark, sf_dir)
    assert_matches_oracle(df, B.ad_attribution_oracle_sql(), sf_dir)
    agg = df.agg(
        F.sum("n_first").alias("f"), F.sum("n_last").alias("l"), F.sum("n_touch").alias("t")
    ).collect()[0]
    # every attributed purchase has exactly one first and one last touch
    assert agg["f"] == agg["l"]
    assert agg["t"] >= agg["f"]
    # Σ n_first == purchases with ≥1 preceding click in the horizon
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "event_id"
    )
    touched = (
        purchases.join(clicks, "user_id")
        .filter(
            (F.col("cts") < F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 86400 SECOND"))
        )
        .select("event_id")
        .distinct()
        .count()
    )
    assert agg["f"] == touched


def test_rfm_segments(spark, sf_dir):
    df = B.rfm_segments(spark, sf_dir)
    assert_matches_oracle(df, B.RFM_SEGMENTS_SQL, sf_dir)
    rows = df.collect()
    # all scores in 1..4, user partition is exact
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 4, r
    n_users = load_events(spark, sf_dir).select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users


def test_rfm_no_single_task_sort(spark, sf_dir):
    """The quartile boundary computation must be a histogram over the
    value domain, not an ntile() global sort of all users: no window in
    the plan may run over an *unpartitioned* relation (the reintroduced
    global-sort regression this guards against), and the boundary row
    must come back via broadcast, not a collect."""
    plan = B.rfm_segments(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    assert "ntile" not in plan
    # every Window node must carry a non-empty partition spec: a global
    # window prints as "Window [...], [ordercols...]" with no
    # "partitionBy"-derived hash clustering — detectable as a Window
    # whose required child distribution collapsed to SinglePartition
    # (plan shows an Exchange SinglePartition feeding a Sort+Window)
    import re

    for m in re.finditer(r"Exchange SinglePartition", plan):
        # the only legal SinglePartition exchanges here are the tiny
        # boundary/corpus-max aggregations, never one feeding a Window
        tail = plan[max(0, m.start() - 400) : m.start()]
        assert "Window" not in tail, (
            "Window over SinglePartition exchange — global sort reintroduced"
        )


def test_rfm_mon_bucket_coarsens(spark, sf_dir):
    """The monetary-domain scale dial: coarsened RFM matches its own
    oracle (boundaries chosen AND applied on the coarsened domain),
    keeps valid quartile scores, and genuinely shrinks the domain."""
    df = B.rfm_segments(spark, sf_dir, mon_bucket=25)
    assert_matches_oracle(df, B.rfm_segments_oracle_sql(mon_bucket=25), sf_dir)
    for r in df.collect():
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 4, r
    with pytest.raises(ValueError):
        B.rfm_segments(spark, sf_dir, mon_bucket=0)


def test_dwell_gaps(spark, sf_dir):
    df = B.dwell_gaps(spark, sf_dir)
    assert_matches_oracle(df, B.dwell_gaps_oracle_sql(), sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["n_gaps"] > 0
        assert 0 <= r["avg_dwell_s"] <= B.GAP_SECONDS  # in-session gap ≤ gap bound
        # totals and means agree (total is floor-seconds of the µs sum)
        assert abs(r["avg_dwell_s"] * r["n_gaps"] - r["total_dwell_s"]) <= 1


def test_session_paths_stream_matches_batch(spark, sf_dir):
    """Streaming twin ≡ batch ≡ oracle: the append-mode session
    collect + batch 3-gram rollup reproduces the batch path miner
    bit-for-bit on finite input (sentinel flushes tail sessions)."""
    from flink_project_userbehavioranalysis_spark.streaming import windowed as W

    df = W.session_paths_stream(spark, sf_dir)
    assert_matches_oracle(df, B.session_paths_topk_oracle_sql(), sf_dir)


def test_paths_and_dwell_share_session_semantics(spark, sf_dir):
    """Gap-islands here ≡ session_window in relational.user_sessions:
    the number of (user, session) islands equals the session count."""
    from flink_project_userbehavioranalysis_spark.operators import relational as R

    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    islands = (
        B._sessionized(ev, B.GAP_SECONDS).select("user_id", "sid").distinct().count()
    )
    assert islands == R.user_sessions(spark, sf_dir).count()


def test_co_purchase_pairs(spark, sf_dir):
    df = B.co_purchase_pairs(spark, sf_dir)
    assert_matches_oracle(df, B.co_purchase_pairs_oracle_sql(), sf_dir)
    for r in df.collect():
        assert r["item_a"] < r["item_b"]
        # a pair can't co-occur more often than either item occurs
        assert r["pair_n"] <= min(r["a_n"], r["b_n"])
        assert r["pair_n"] >= 2


def test_co_purchase_max_basket_drops_wide_basket(spark, tmp_path):
    """Crafted celebrity basket: one user-day with 40 distinct items,
    two normal 2-item baskets. The cap must (a) remove every pair the
    wide basket would generate, (b) report exactly one dropped basket
    on every row, (c) keep the normal baskets' pair intact."""
    from tests.test_properties import BASE_NS, write_events

    rows = []
    eid = 0
    # celebrity: user 1, 40 distinct items, same day
    for k in range(1, 41):
        rows.append((eid, BASE_NS + eid * 1_000_000_000, 1, "purchase", k))
        eid += 1
    # two normal users buy items (100, 101) the same day → support-2 pair
    for uid in (2, 3):
        for k in (100, 101):
            rows.append((eid, BASE_NS + eid * 1_000_000_000, uid, "purchase", k))
            eid += 1
    path = write_events(spark, str(tmp_path), rows)

    capped = B.co_purchase_pairs(spark, path, min_support=2, max_basket=3).collect()
    assert len(capped) == 1
    r = capped[0]
    assert (r["item_a"], r["item_b"], r["pair_n"]) == (100, 101, 2)
    assert r["n_dropped_baskets"] == 1
    # supports computed over the capped set only
    assert r["a_n"] == r["b_n"] == 2
    # uncapped: the celebrity basket floods in (40·39/2 pairs at support
    # 1 are cut by min_support, but item pair (k,k') appears once each —
    # so only the support-2 pair survives; widen min_support to prove
    # the quadratic existed)
    uncapped = B.co_purchase_pairs(spark, path, min_support=1).collect()
    assert len(uncapped) == 40 * 39 // 2 + 1


def test_pv_anomaly(spark):
    """Anomaly flags at sf0.01 (sf0.001's per-item hourly buckets never
    accumulate a full lookback — the gate SF is the non-vacuous one):
    oracle-match plus every flagged bucket genuinely exceeds its own
    trailing baseline mean."""
    from tests.conftest import SF_DIR_MID
    from flink_project_userbehavioranalysis_spark.operators import network_flow as NF

    df = NF.pv_anomaly(spark, SF_DIR_MID)
    assert_matches_oracle(df, NF.pv_anomaly_oracle_sql(), SF_DIR_MID)
    rows = df.collect()
    assert len(rows) >= 5  # non-vacuous at the gate SF
    assert all(r["cnt"] >= 1 for r in rows)


def test_pv_anomaly_stream_matches_batch(spark):
    """Streaming twin ≡ batch ≡ oracle at the gate SF: append-mode
    watermark-closed hourly buckets + the identical trailing z-score
    expression reproduce the batch detector bit-for-bit."""
    from tests.conftest import SF_DIR_MID
    from flink_project_userbehavioranalysis_spark.operators import network_flow as NF
    from flink_project_userbehavioranalysis_spark.streaming import windowed as W

    df = W.pv_anomaly_stream(spark, SF_DIR_MID)
    assert_matches_oracle(df, NF.pv_anomaly_oracle_sql(), SF_DIR_MID)


def test_append_filter_keeps_sentinel_flush(spark, sf_dir):
    """Regression (r5): a pushable pre-agg filter gets pushed below the
    EventTimeWatermark node and row-group-prunes the sentinel file, so
    append-mode output silently loses the corpus's FINAL hour of
    windows. pv_anomaly_stream's filter ORs the sentinel type through;
    this asserts the emitted bucket set reaches the last batch hour
    (at the flag level the bug only shows when a tail bucket happens
    to flag — sf0.1 caught it; the bucket-completeness check here is
    deterministic at every SF)."""
    import pyspark.sql.functions as FF

    from flink_project_userbehavioranalysis_spark.io import load_events
    from flink_project_userbehavioranalysis_spark.streaming import windowed as W
    from flink_project_userbehavioranalysis_spark.streaming.replay import (
        SENTINEL_TYPE,
        events_stream,
        run_append_memory,
    )

    ev = events_stream(spark, sf_dir, n_chunks=4, sentinel=True)
    keep = (
        (FF.col("event_type") == "view") & FF.col("item_id").isNotNull()
    ) | (FF.col("event_type") == SENTINEL_TYPE)
    hourly = (
        ev.filter(keep)
        .groupBy("item_id", FF.window("ts", "1 hour").alias("w"))
        .agg(FF.count("*").alias("cnt"))
        .select("item_id", FF.col("w.end").cast("long").alias("hour_s"), "cnt")
    )
    got = run_append_memory(hourly, "sentinel_flush_probe", spark).filter(
        FF.col("item_id").isNotNull()
    )
    batch = (
        load_events(spark, sf_dir)
        .filter((FF.col("event_type") == "view") & FF.col("item_id").isNotNull())
        .groupBy("item_id", FF.window("ts", "1 hour").alias("w"))
        .agg(FF.count("*").alias("cnt"))
        .select("item_id", FF.col("w.end").cast("long").alias("hour_s"), "cnt")
    )
    assert got.count() == batch.count()  # no withheld tail buckets
    assert (
        got.agg(FF.max("hour_s")).collect()[0][0]
        == batch.agg(FF.max("hour_s")).collect()[0][0]
    )


def test_dwell_gaps_stream_matches_batch(spark, sf_dir):
    """Streaming dwell twin ≡ batch ≡ oracle (shares the session
    collect stage with the path miner; gap set identical on finite
    input)."""
    from flink_project_userbehavioranalysis_spark.streaming import windowed as W

    df = W.dwell_gaps_stream(spark, sf_dir)
    assert_matches_oracle(df, B.dwell_gaps_oracle_sql(), sf_dir)


def test_user_trailing_features_point_in_time(spark, sf_dir):
    """Leakage-freedom: each row's features equal a brute recount of
    the SAME user's events in [ts-7d, ts) — never including the row
    itself or same-µs peers (strict-preceding frame), never another
    user. Oracle-match is auto-covered; this pins the semantics."""
    df = B.user_trailing_features(spark, sf_dir)
    rows = df.collect()
    assert rows
    from collections import defaultdict

    from flink_project_userbehavioranalysis_spark.io import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("us"), "event_type"
    )
    by_user = defaultdict(list)
    for r in ev.collect():
        by_user[r["user_id"]].append((r["us"], r["event_type"]))
    horizon = 7 * 86_400 * 1_000_000
    for r in rows[:500]:
        evs = by_user[r["user_id"]]
        prev = [t for t, _ in evs if r["ts_us"] - horizon <= t < r["ts_us"]]
        purch = [
            t for t, k in evs
            if r["ts_us"] - horizon <= t < r["ts_us"] and k == "purchase"
        ]
        assert r["n_prev"] == len(prev), r
        assert r["n_prev_purchases"] == len(purch), r


def test_user_trailing_features_single_shuffle(spark, sf_dir):
    """Both feature columns must share ONE user-key exchange."""
    plan = B.user_trailing_features(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_negative_sample_pairs_are_true_negatives(spark, sf_dir):
    """Every sampled pair is (a) a catalog item, (b) never interacted
    with by that user, (c) ranked 1..k densely, and the sample is
    reproducible."""
    df = B.negative_sample_pairs(spark, sf_dir)
    rows = df.collect()
    assert rows
    ev = load_events(spark, sf_dir).filter(F.col("item_id").isNotNull())
    pop = {
        r["item_id"]
        for r in ev.groupBy("item_id").count()
        .orderBy(F.desc("count"), F.asc("item_id")).limit(20).collect()
    }
    inter = {(r["user_id"], r["item_id"]) for r in ev.select("user_id", "item_id").distinct().collect()}
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in rows:
        assert r["item_id"] in pop
        assert (r["user_id"], r["item_id"]) not in inter
        per_user[r["user_id"]].append(r["rnk"])
    for u, rnks in per_user.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= 5
    again = {(r["user_id"], r["item_id"], r["rnk"]) for r in B.negative_sample_pairs(spark, sf_dir).collect()}
    assert again == {(r["user_id"], r["item_id"], r["rnk"]) for r in rows}


def test_churn_labels_censoring_and_semantics(spark, sf_dir):
    """Labels look strictly forward, censored hours are absent, every
    label equals a brute recount of the user's future activity, and
    both classes exist (non-vacuous target)."""
    from collections import defaultdict

    df = B.churn_labels(spark, sf_dir)
    rows = df.collect()
    assert rows
    ev = (
        load_events(spark, sf_dir)
        .select("user_id", F.date_trunc("hour", "ts").cast("long").alias("hs"))
        .distinct()
    )
    by_user = defaultdict(set)
    max_s = 0
    for r in ev.collect():
        by_user[r["user_id"]].add(r["hs"])
        max_s = max(max_s, r["hs"])
    horizon = 24 * 3600
    for r in rows[:500]:
        assert r["hour_s"] + horizon <= max_s  # censored rows excluded
        future = {x for x in by_user[r["user_id"]] if x > r["hour_s"]}
        nxt = min(future) if future else None
        want = 1 if (nxt is None or nxt - r["hour_s"] > horizon) else 0
        assert r["churned"] == want, r
        assert r["next_gap_hours"] == ((nxt - r["hour_s"]) // 3600 if nxt else None)
    labels = {r["churned"] for r in rows}
    assert labels == {0, 1}


def test_churn_training_set_is_leakage_free(spark, sf_dir):
    """Features recount only strictly-earlier activity; every row
    carries a label from churn_labels; one row per labeled example."""
    from collections import defaultdict

    df = B.churn_training_set(spark, sf_dir)
    rows = df.collect()
    assert rows
    labels = {
        (r["user_id"], r["hour_s"]): r["churned"]
        for r in B.churn_labels(spark, sf_dir).collect()
    }
    assert len(rows) == len(labels)  # exactly the labeled examples
    ev = load_events(spark, sf_dir).select(
        "user_id",
        F.date_trunc("hour", "ts").cast("long").alias("hs"),
        "event_type",
    )
    by_user = defaultdict(list)
    for r in ev.collect():
        by_user[r["user_id"]].append((r["hs"], r["event_type"]))
    for r in rows[:300]:
        assert labels[(r["user_id"], r["hour_s"])] == r["churned"]
        lo = r["hour_s"] - 7 * 86_400
        prev = [t for t, _ in by_user[r["user_id"]] if lo <= t < r["hour_s"]]
        purch = [
            t for t, k in by_user[r["user_id"]]
            if lo <= t < r["hour_s"] and k == "purchase"
        ]
        assert r["n_prev_7d"] == len(prev), r
        assert r["n_purch_7d"] == len(purch), r


def test_retention_rolling(spark, sf_dir):
    """D1/D7 rolling retention: oracle-match; retained_k <= active on
    every day; last day's horizons are 0 (no future data)."""
    import pyspark.sql.functions as FF

    from tests.oracle import assert_matches_oracle

    df = B.retention_rolling(spark, sf_dir)
    assert_matches_oracle(df, B.retention_rolling_oracle_sql(), sf_dir)
    bad = df.filter(
        (FF.col("retained_1") > FF.col("active"))
        | (FF.col("retained_7") > FF.col("active"))
    ).count()
    assert bad == 0
    last = df.orderBy(FF.desc("day")).first()
    assert last["retained_1"] == 0 and last["retained_7"] == 0
