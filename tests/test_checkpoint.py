"""Checkpoint / recovery: a streaming aggregation stopped mid-replay
and restarted from its checkpoint resumes exactly-once — no lost and no
double-counted windows (the fault-tolerance contract the reference gets
from Flink checkpoints; here it's the file-source offset log + state
store versioning)."""

import os
import shutil

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.io import normalize_events, load_table
from flink_project_userbehavioranalysis_spark.operators import network_flow as NF
from flink_project_userbehavioranalysis_spark.streaming import replay


def test_streaming_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    chunk_dir = replay._prepare_chunks(spark, sf_dir, 8, sentinel=False)
    files = sorted(f for f in os.listdir(chunk_dir) if f.endswith(".parquet"))
    assert len(files) == 8
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(staging)

    acc = {}

    def fold(batch_df, _bid):
        for r in batch_df.collect():
            acc[r["window_end"]] = r["pv"]

    def run_once():
        raw_schema = load_table(spark, sf_dir, "events").schema
        ev = normalize_events(
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        ).withWatermark("ts", "10 minutes")
        counts = (
            ev.filter(F.col("event_type") == "view")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("pv"))
            .select(F.col("w.end").cast("long").alias("window_end"), "pv")
        )
        q = (
            counts.writeStream.outputMode("update")
            .foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def stage(names, base_mtime):
        # explicit increasing mtimes: the file source processes oldest
        # first, and same-second copies would otherwise arrive in
        # arbitrary order and be watermark-dropped as late
        for i, f in enumerate(names):
            dst = os.path.join(staging, f)
            shutil.copy(os.path.join(chunk_dir, f), dst)
            os.utime(dst, (base_mtime + i * 10, base_mtime + i * 10))

    # phase 1: first half of the replay, then the query terminates
    stage(files[:4], 1_700_000_000)
    run_once()
    partial = dict(acc)
    assert partial  # something was aggregated before the "failure"

    # phase 2: rest of the data arrives; a NEW query restarts from the
    # same checkpoint and processes only the unseen files
    stage(files[4:], 1_700_000_100)
    run_once()

    batch = {r["window_end"]: r["pv"] for r in NF.pv_hourly(spark, sf_dir).collect()}
    assert acc == batch  # exactly-once: resume lost nothing, re-read nothing
    # and the restart genuinely continued (phase 1 alone was incomplete)
    assert partial != batch
