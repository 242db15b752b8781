"""Ingest schema adaptivity: normalize_events must accept BOTH shapes
the generated events.parquet has shipped — BIGINT epoch-nanos ts and
native timestamp[us] (TIMESTAMP_NTZ) — and produce the identical
normalized contract (TimestampType ts, BIGINT ts_ns). A generation
switch in the testdata must never break ingest again."""

import datetime


from flink_project_userbehavioranalysis_spark.io import normalize_events

ROWS = [
    # (event_id, epoch-nanos ts, user_id, event_type, value, props)
    (1, 1_704_067_798_778_549_000, 13, "view", 1.0, '{"k": 87}'),
    (2, 1_704_068_166_738_090_000, 12, "click", 2.0, '{"k": 0}'),
    (3, 1_704_068_217_102_229_999, 12, "purchase", 3.0, "{}"),
]


def test_normalize_long_nanos_and_native_timestamp_agree(spark):
    long_df = spark.createDataFrame(
        ROWS,
        schema="event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    ts_rows = [
        (eid, datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=ns // 1000),
         uid, typ, val, props)
        for eid, ns, uid, typ, val, props in ROWS
    ]
    ntz_df = spark.createDataFrame(
        ts_rows,
        schema="event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    a = normalize_events(long_df).orderBy("event_id").collect()
    b = normalize_events(ntz_df).orderBy("event_id").collect()
    # identical schema contract
    assert normalize_events(long_df).schema == normalize_events(ntz_df).schema
    for ra, rb, (eid, ns, *_r) in zip(a, b, ROWS):
        assert ra["ts"] == rb["ts"]
        # nanos survive exactly on the long path; the timestamp path is
        # µs-grain by construction (the parquet column itself is µs)
        assert ra["ts_ns"] == ns
        assert rb["ts_ns"] == ns // 1000 * 1000
        assert ra["item_id"] == rb["item_id"]
    ts_type = dict(normalize_events(ntz_df).dtypes)["ts"]
    assert ts_type == "timestamp"
