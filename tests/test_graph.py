"""Semantic + plan properties of the graph pillar (oracle match is
auto-covered by test_operators_oracle)."""

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.io import load_events
from flink_project_userbehavioranalysis_spark.operators import graph as G


def test_pagerank_matches_float_power_iteration(spark, sf_dir):
    """The integer-lattice recurrence must track the exact float power
    iteration to within truncation error (≤ a few lattice units per
    contribution, ~1e-6 relative at SCALE=1e9)."""
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "item_id")
    edges = {
        (r["src"], r["dst"]): (r["w"], r["wtot"])
        for r in G._transition_edges(ev, G.GAP_SECONDS).collect()
    }
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    r = {n: 1.0 for n in nodes}
    for _ in range(3):
        contrib = {n: 0.0 for n in nodes}
        for (s, d), (w, wtot) in edges.items():
            contrib[d] += r[s] * w / wtot
        r = {n: 0.15 + 0.85 * contrib[n] for n in nodes}

    got = {row["item_id"]: row["rank_q"] for row in G.item_pagerank(spark, sf_dir).collect()}
    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n] / G.SCALE - r[n]) < 1e-4, (n, got[n], r[n])


def test_pagerank_structural_properties(spark, sf_dir):
    rows = G.item_pagerank(spark, sf_dir).collect()
    base = 15 * G.SCALE // 100
    # every node keeps at least the damping base; truncation can only
    # LOSE mass, so the total never exceeds the uniform start
    assert all(r["rank_q"] >= base for r in rows)
    assert sum(r["rank_q"] for r in rows) <= len(rows) * G.SCALE


def test_pagerank_join_strategies(spark, sf_dir):
    # materialize=False keeps the lazy plan (the default localCheckpoint
    # collapses it to an ExistingRDD scan, hiding the joins)
    b = G.item_pagerank(spark, sf_dir, iters=1, rank_join="broadcast", materialize=False)
    plan_b = b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b
    assert "CartesianProduct" not in plan_b and "BroadcastNestedLoopJoin" not in plan_b

    s = G.item_pagerank(spark, sf_dir, iters=1, rank_join="shuffle", materialize=False)
    plan_s = s._jdf.queryExecution().executedPlan().toString()
    # the rank relation must honor the open-vocabulary form: its join
    # with edges runs as a shuffled hash join, not a broadcast
    assert "ShuffledHashJoin" in plan_s
    rows_b = sorted((r["item_id"], r["rank_q"]) for r in b.collect())
    rows_s = sorted((r["item_id"], r["rank_q"]) for r in s.collect())
    assert rows_b == rows_s  # strategy never changes values
