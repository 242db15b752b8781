"""Compare a bench.py JSON line against BASELINE.md's measured medians.

Usage:
    python bench.py | tail -1 > /tmp/bench.json
    python tools/bench_compare.py /tmp/bench.json

Prints one row per BASELINE.md query: baseline ms, Spark absolute ms,
overhead-adjusted ms, and both ratios vs the 2x bar. Queries without a
baseline row (extension pillars) are listed separately with absolute
times only.
"""

from __future__ import annotations

import json
import sys

# BASELINE.md "Locally measured baseline" medians (ms) at sf0.1.
BASELINE_MS = {
    "hot_items_topn": 199.2,
    "hot_items_topn_direct": 199.2,  # same query, textbook plan — same bar
    "pv_hourly": 6.9,
    "uv_hourly": 19.4,
    "uv_approx": 15.8,
    # r8 re-anchor: the registered 11,509-row query measured on its own
    # oracle (the old 11.2 ms row was a 2,880-row count_by_type analog)
    "count_by_channel_behavior": 22.3,
    "blacklist": 3.3,
    "consec_fail": 30.7,
    "order_timeout": 28.6,
    "interval_join": 14.1,
    "tpch_q1ish": 80.2,
    # r11 search-pillar anchors (median of 9, warm; BASELINE.md r11 rows)
    "fts_topk": 78.2,
    "fts_topk_indexed": 78.2,     # same relation off the persisted index
    "fts_topk_maintained": 78.2,  # same relation off base ∪ overlay
    "fts_topk_any": 78.7,
    "fts_prefix_topk": 83.8,
    "fts_fuzzy_topk": 98.3,
    "hybrid_topk": 94.4,
    "phrase_search": 84.3,
    "term_associations": 132.9,
    "term_stats_maintain": 61.0,
    "edit_dup_pairs": 569.2,      # segment-filtered fast-oracle bar
    "search_snippets": 127.2,
}


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else None
    data = json.load(open(path)) if path else json.loads(sys.stdin.read())
    q = data["queries"]
    floor = data.get("floor_sec", 0.0) * 1000
    # the compact stdout line has no queries_adj (only bench_detail.json
    # does) — derive it from the floor so adj never silently equals abs
    adj = data.get("queries_adj") or {
        k: max(0.0, v - data.get("floor_sec", 0.0)) for k, v in q.items()
    }
    print(f"floor = {floor:.0f} ms (per-query scheduling+planning cost)")
    print(f"{'query':<28}{'base ms':>9}{'abs ms':>9}{'adj ms':>9}{'abs x':>7}{'adj x':>7}  verdict")
    worst = 0.0
    for name, base in BASELINE_MS.items():
        if name not in q:
            print(f"{name:<28}{base:>9.1f}{'—':>9}  (not in bench output)")
            continue
        a = q[name] * 1000
        j = adj.get(name, q[name]) * 1000
        ra, rj = a / base, j / base
        worst = max(worst, rj)
        verdict = "ok" if rj <= 2.0 else ("ok-abs" if ra <= 2.0 else "WEAK")
        print(f"{name:<28}{base:>9.1f}{a:>9.1f}{j:>9.1f}{ra:>7.2f}{rj:>7.2f}  {verdict}")
    shb = data.get("same_host_baseline") or {}
    if data.get("vs_duckdb_same_host") or shb:
        rc = data.get("vs_duckdb_same_host") or shb.get("ratio_collect_vs_fetchall")
        ra = data.get("vs_duckdb_same_host_arrow") or shb.get("ratio_arrow_vs_df")
        print(
            f"\nsame-host DuckDB (this run): collect/fetchall = {rc}x, "
            f"toPandas/.df() = {ra}x  <- host-drift-free ratios (r6 method)"
        )
    extras = sorted(set(q) - set(BASELINE_MS))
    if extras:
        print("\nextension queries (no baseline row):")
        for name in extras:
            print(f"{name:<28}{'':>9}{q[name]*1000:>9.1f}{adj.get(name, 0)*1000:>9.1f}")
    print(f"\nworst adjusted ratio vs 2.0 bar: {worst:.2f}")


if __name__ == "__main__":
    main()
