"""Python DataSource API source (S4): batch read, partitioning,
determinism, and micro-batch streaming with replayable offsets."""

import time

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.sources import pyds


def _run_until(spark, q, table: str, predicate, timeout_s: int = 90):
    """Poll a memory-sink table until predicate(df) or timeout; stop q.

    Python micro-batch sources don't support Trigger.AvailableNow (the
    runtime falls back to one batch), so bounded streams are driven by
    a short processing-time trigger + a row-budget cap (max_rows)."""
    deadline = time.monotonic() + timeout_s
    try:
        while time.monotonic() < deadline:
            if predicate(spark.table(table)):
                return
            time.sleep(0.5)
        raise AssertionError(f"{table}: predicate not reached in {timeout_s}s")
    finally:
        q.stop()


def _registered(spark):
    pyds.register(spark)
    return spark


def test_batch_read_rows_and_partitions(spark):
    _registered(spark)
    df = (
        spark.read.format("marketing_events")
        .option("n_rows", 200)
        .option("n_partitions", 4)
        .load()
    )
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 4
    assert df.columns == ["seq", "ts", "user_id", "behavior", "channel"]


def test_batch_read_is_deterministic_and_domain_mapped(spark):
    _registered(spark)
    df = spark.read.format("marketing_events").option("n_rows", 40).load()
    rows = sorted(df.collect(), key=lambda r: r["seq"])
    again = sorted(
        spark.read.format("marketing_events").option("n_rows", 40).load().collect(),
        key=lambda r: r["seq"],
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    for r in rows:
        assert r["behavior"] == pyds.BEHAVIORS[r["seq"] % 4]
        assert r["channel"] == pyds.CHANNELS[(r["seq"] // 4) % 5]


def test_stream_read_equals_batch_prefix(spark, tmp_path):
    """Run the streaming reader for a bounded row budget; the appended
    output must equal the batch read of the same seq range — the
    replayable-offset contract."""
    _registered(spark)
    stream = (
        spark.readStream.format("marketing_events")
        .option("rows_per_batch", 50)
        .option("max_rows", 150)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    _run_until(spark, q, "pyds_stream", lambda df: df.count() >= 150)
    got = sorted(spark.table("pyds_stream").collect(), key=lambda r: r["seq"])
    want = sorted(
        spark.read.format("marketing_events").option("n_rows", 150).load().collect(),
        key=lambda r: r["seq"],
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_per_element_trigger_fire_and_purge_approximation(spark, tmp_path):
    """T8 closure demo (SURVEY §2.6): the reference's custom trigger
    (UvWithBloom.scala :: MyTrigger [U]) FIRE_AND_PURGEs on every
    element — one emission per arriving record carrying the updated
    count. Structured Streaming is micro-batch, so exact per-record
    firing doesn't exist; the documented approximation is
    rows_per_batch=1 + processingTime='0 seconds' + update mode: every
    micro-batch holds exactly one element and update mode emits exactly
    the one changed key. On finite input the emission *sequence* is
    then bit-identical to the reference's per-element FIRE_AND_PURGE
    output: for each key, successive counts 1,2,3,… in arrival order —
    asserted here end-to-end through the Python DataSource stream."""
    import collections

    _registered(spark)
    n = 20
    stream = (
        spark.readStream.format("marketing_events")
        .option("rows_per_batch", 1)
        .option("max_rows", n)
        .load()
    )
    counts = stream.groupBy("channel").agg(F.count("*").alias("cnt"))
    emissions: list[list[tuple]] = []

    def capture(batch_df, _bid):
        rows = [(r["channel"], r["cnt"]) for r in batch_df.collect()]
        if rows:
            emissions.append(rows)

    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt_t8"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.monotonic() + 90
    try:
        while time.monotonic() < deadline:
            if sum(len(b) for b in emissions) >= n:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    flat = [e for batch in emissions for e in batch]
    assert len(flat) >= n
    # reference FIRE_AND_PURGE sequence on the same finite input
    running: dict[str, int] = collections.defaultdict(int)
    expected = []
    for seq in range(n):
        ch = pyds.CHANNELS[(seq // len(pyds.BEHAVIORS)) % len(pyds.CHANNELS)]
        running[ch] += 1
        expected.append((ch, running[ch]))
    assert flat[:n] == expected
    # per-element firing: no micro-batch ever coalesced two elements
    assert all(len(b) == 1 for b in emissions)


def test_windowed_agg_over_pyds_stream(spark, tmp_path):
    """The source composes with the engine's windowed aggs: per-channel
    counts over the generated stream match the closed-form expectation
    (deterministic domain mapping)."""
    _registered(spark)
    stream = (
        spark.readStream.format("marketing_events")
        .option("rows_per_batch", 100)
        .option("max_rows", 200)
        .load()
    )
    counts = stream.groupBy("channel").agg(F.count("*").alias("cnt"))
    q = (
        counts.writeStream.format("memory")
        .queryName("pyds_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    _run_until(
        spark,
        q,
        "pyds_counts",
        lambda df: sum(r["cnt"] for r in df.collect()) >= 200,
    )
    got = {r["channel"]: r["cnt"] for r in spark.table("pyds_counts").collect()}
    assert sum(got.values()) == 200
    assert got == {"AppStore": 40, "HuaweiStore": 40, "weibo": 40, "wechat": 40, "tieba": 40}


def test_filter_pushdown_semantics(spark):
    """Spark 4.1 pushFilters: pushed predicates produce the same rows
    as unpushed (Spark re-applies nothing wrongly), and the reader
    object proves what it absorbed — seq bounds narrow the partition
    range, equality prunes generation."""
    _registered(spark)
    base = spark.read.format("marketing_events").option("n_rows", 400).load()
    filtered = base.filter(
        (F.col("behavior") == "CLICK") & (F.col("seq") >= 100) & (F.col("seq") < 300)
    )
    rows = sorted(tuple(r) for r in filtered.collect())
    want = sorted(
        tuple(r)
        for r in base.collect()
        if r["behavior"] == "CLICK" and 100 <= r["seq"] < 300
    )
    assert rows == want and len(rows) == 50  # every 4th seq in [100, 300)


def test_filter_pushdown_prunes_partitions_and_generation(spark):
    """Direct reader contract: supported filters are absorbed (not
    yielded back), seq bounds shrink partitions() output, and read()
    never materializes a pruned row."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNotNull, LessThan

    from flink_project_userbehavioranalysis_spark.sources.pyds import (
        MarketingEventsReader,
    )

    r = MarketingEventsReader({"n_rows": "400", "n_partitions": "4"})
    leftover = list(
        r.pushFilters(
            [
                EqualTo(("behavior",), "CLICK"),
                GreaterThanOrEqual(("seq",), 100),
                LessThan(("seq",), 300),
                IsNotNull(("channel",)),  # not pushable → handed back
            ]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["IsNotNull"]
    parts = r.partitions()
    assert parts[0].start == 100 and parts[-1].end == 300
    produced = [row for p in parts for row in r.read(p)]
    assert len(produced) == 50
    assert all(row[3] == "CLICK" and 100 <= row[0] < 300 for row in produced)
