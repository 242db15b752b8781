"""Structured Streaming layer: micro-batch replay source, watermarked
windowed aggregations, foreachBatch Top-N, and transformWithStateInPandas
stateful processors (SURVEY §2.6, §2.7, M3).

The reference is a Flink DataStream application; every batch operator in
``operators/`` has its streaming twin here, sharing the same column
logic (``io.normalize_events`` and the window/rank shapes), so the
batch≡streaming equality tests compare one implementation against
itself under two execution models — exactly the invariant SURVEY §5.2
promises.
"""

from flink_project_userbehavioranalysis_spark.streaming.replay import (  # noqa: F401
    events_stream,
    run_update_collect,
    run_update_merge,
)
