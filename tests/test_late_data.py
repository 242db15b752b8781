"""T6/T7 — late-data semantics: a scrambled replay (whole chunk
arriving late) exercises watermark drops, surfaced via the
numRowsDroppedByWatermark metric (the engine's side-output analog)."""

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.operators import network_flow as NF
from flink_project_userbehavioranalysis_spark.streaming import windowed as W


def test_late_chunk_is_dropped_and_observed(spark, sf_dir):
    out, dropped = W.pv_hourly_late_observed(spark, sf_dir, watermark="10 minutes")
    assert dropped > 0  # the late chunk was detected and counted
    # emitted counts are a subset-or-equal of batch per window: late
    # rows were dropped, never double-counted
    batch = {r["window_end"]: r["pv"] for r in NF.pv_hourly(spark, sf_dir).collect()}
    for r in out.groupBy("window_end").agg(F.max("pv").alias("pv")).collect():
        assert r["pv"] <= batch[r["window_end"]]


def test_generous_watermark_tolerates_late_chunk(spark, sf_dir):
    """With a watermark delay larger than the scramble disorder, the
    same late replay loses nothing (T2 bounded-out-of-orderness)."""
    out, dropped = W.pv_hourly_late_observed(spark, sf_dir, watermark="40 days")
    assert dropped == 0
    batch = {(r["window_end"], r["pv"]) for r in NF.pv_hourly(spark, sf_dir).collect()}
    final = {
        (r["window_end"], r["pv"])
        for r in out.groupBy("window_end")
        .agg(F.max("pv").alias("pv"))
        .collect()
    }
    assert final == batch
