"""Measure the maintenance-tier claim: incremental MV refresh costs
~1/|days| of a full rebuild (cost ∝ delta, not corpus).

Times, in one warm session at the given sf dir (default sf0.1):
  - full build: hourly-PV rollup over ALL days → partitioned write
  - incremental refresh: rollup over the NEWEST day only → dynamic
    partition overwrite of that one partition
and reports wall times, the days touched, and the refresh's scan-side
pruning (the ts predicate reaches the parquet row-group stats, so the
delta aggregation reads a slice even though raw events are not
day-partitioned — at 100 TB the raw log IS day-partitioned and the
same filter prunes whole directories instead).

Usage: python tools/maintenance_smoke.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark import get_spark
from flink_project_userbehavioranalysis_spark.io import load_events
from flink_project_userbehavioranalysis_spark.operators import maintenance as mt


def _median(fn, runs: int = 3) -> float:
    fn()  # warm
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="maintenance-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_events(spark, sf_dir)
    maxd = ev.agg(F.max(F.to_date("ts"))).collect()[0][0]
    n_days = ev.select(F.to_date("ts").alias("d")).distinct().count()
    delta = ev.filter(F.to_date("ts") >= F.lit(maxd))

    full_dir = tempfile.mkdtemp(prefix="ubx-smoke-full-")

    def full_build():
        mt.build_mv(mt._hourly_pv(ev), full_dir)  # overwrite: one dir reused

    # refresh target: a prebuilt history MV (so the refresh write is
    # the real dynamic-overwrite path against existing partitions)
    base = tempfile.mkdtemp(prefix="ubx-smoke-mv-")
    mt.build_mv(mt._hourly_pv(ev.filter(F.to_date("ts") < F.lit(maxd))), base)

    def refresh():
        mt.refresh_mv(spark, mt._hourly_pv(delta), base)

    t_full = _median(full_build)
    t_refresh = _median(refresh)
    print(
        f"days={n_days} full_build={t_full*1000:.0f}ms "
        f"refresh_1day={t_refresh*1000:.0f}ms "
        f"ratio={t_refresh/t_full:.2f} (ideal ~{1/n_days:.2f} plus fixed write cost)"
    )


if __name__ == "__main__":
    main()
