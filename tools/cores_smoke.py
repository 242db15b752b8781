"""Strong-scaling smoke — measured evidence that wall time tracks
cores at fixed data size (the other axis from tools/scale_smoke.py's
data scaling at fixed cores).

At 100 TB the cluster answer to a slow query is more executors; that
only works if the plans have no serial bottleneck (driver loops,
single-partition stages, unsplittable state). This harness times a
compute-heavy, low-output query subset on the ×10 synthesized dir
(3M events / 50k docs / 20k vectors — big enough that Spark's fixed
per-query floor stops dominating) under local[LOW] and local[HIGH]
sessions and reports the speedup and parallel efficiency
(speedup / (HIGH/LOW)).

Timing uses the distributed ``noop`` sink, NOT collect(): collect
transfer is driver-serial by design, so timing it measures the sink,
not the operators — at 100 TB results land in distributed storage,
which noop models. Only queries whose sf0.1-×10 wall time clears the
per-query scheduling floor by ~10× are included; sub-100 ms queries
measure overhead at any core count.

Usage:  python tools/cores_smoke.py [low] [high]    # default 4 32
Writes: human table + one JSON line; SCALE.md records a captured run.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

QUERIES = [
    "hot_items_topn",
    "user_sessions",
    "tx_reconcile",
    "dedup_exact_events",
    "pii_scrub",
    "simhash64",
    "quantize_embeddings",
]

RUNS = 3


def _time_queries(cores: int, data_dir: str) -> dict[str, float]:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from flink_project_userbehavioranalysis_spark import get_spark
    from flink_project_userbehavioranalysis_spark.io import cache_events, uncache_events

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(
        app_name=f"cores-smoke-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        streaming=True,
    )
    spark.sparkContext.setLogLevel("ERROR")
    cache_events(spark, data_dir)
    qs = entry_mod.queries()
    out: dict[str, float] = {}
    def run(df):
        # distributed noop sink: full execution, zero driver transfer
        df.write.format("noop").mode("overwrite").save()

    for name in QUERIES:
        df = qs[name](spark, data_dir)
        run(df)  # warm (plan compile + AQE) before timing
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            run(df)
            times.append(time.perf_counter() - t0)
        out[name] = statistics.median(times)
    uncache_events(spark, data_dir)
    spark.stop()
    return out


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    data_dir = "/tmp/ubx-scale-f10"
    if not os.path.exists(f"{data_dir}/.done"):
        from flink_project_userbehavioranalysis_spark import get_spark
        from tools.scale_smoke import synthesize

        synthesize(get_spark("cores-smoke-synth"), 10)
    t_low = _time_queries(low, data_dir)
    t_high = _time_queries(high, data_dir)
    ratio = high / low
    print(f"{'query':28s}  local[{low}] ms  local[{high}] ms  speedup  efficiency")
    results = {}
    for name in QUERIES:
        sp = t_low[name] / t_high[name] if t_high[name] else float("nan")
        eff = sp / ratio
        results[name] = {
            "low_sec": round(t_low[name], 3),
            "high_sec": round(t_high[name], 3),
            "speedup": round(sp, 2),
            "efficiency": round(eff, 2),
        }
        print(
            f"{name:28s}  {t_low[name] * 1e3:10.1f}  {t_high[name] * 1e3:11.1f}"
            f"  {sp:7.2f}  {eff:10.2f}"
        )
    print(json.dumps({"low": low, "high": high, "results": results}))


if __name__ == "__main__":
    main()
