"""S4 via the Spark 4 Python DataSource API — a first-class pluggable
source (``spark.read.format("marketing_events")``), batch AND
micro-batch streaming, replacing the reference's RichSourceFunction
(AppMarketingByChannel.scala :: SimulatedEventSource [U]) with a
partition-parallel, replayable generator.

Why this exists next to ``generator.marketing_stream`` (rate source):
the rate source can only emit (timestamp, value) and needs expression
post-processing; a DataSource owns its schema, its partitioning, and
its offsets — the shape a real connector (Kafka-like, REST-paging,
file-tailing) takes. This one is deterministic end to end: row ``seq``
fully determines the row (same domain mapping as generator.py), so
batch reads are reproducible and the stream is exactly-replayable from
any offset — both are asserted in tests.

Scale posture: ``partitions()`` splits the seq range evenly; each
executor materializes only its slice (no driver-side row building);
offsets are plain integers so checkpoint state is O(1).
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

BEHAVIORS = ["CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL"]
CHANNELS = ["AppStore", "HuaweiStore", "weibo", "wechat", "tieba"]
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
SCHEMA = "seq BIGINT, ts TIMESTAMP, user_id BIGINT, behavior STRING, channel STRING"


def _row(seq: int, n_users: int):
    """seq → full row; the single source of truth for both readers."""
    return (
        seq,
        EPOCH + timedelta(seconds=seq),
        seq % n_users,
        BEHAVIORS[seq % len(BEHAVIORS)],
        CHANNELS[(seq // len(BEHAVIORS)) % len(CHANNELS)],
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class MarketingEventsReader(DataSourceReader):
    """Batch reader with REAL filter pushdown (Spark 4.1 `pushFilters`):

    - seq range predicates narrow the generated range *before*
      `partitions()` splits it — connector-level partition pruning, the
      move that matters at scale (pruned partitions are never
      scheduled, let alone read);
    - behavior/channel equality prunes row *generation* inside each
      partition (the generator skips non-matching seqs instead of
      materializing rows for Spark to discard).

    Unsupported filters are handed back to Spark, which applies them
    post-scan — the standard partial-pushdown contract.
    """

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 4))
        self.n_users = int(options.get("n_users", 100))
        self.seq_lo = 0
        self.seq_hi = self.n_rows
        self.eq: dict[str, str] = {}

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute in (("behavior",), ("channel",)):
                self.eq[f.attribute[0]] = f.value
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("seq",):
                self.seq_lo = max(self.seq_lo, int(f.value))
            elif isinstance(f, GreaterThan) and f.attribute == ("seq",):
                self.seq_lo = max(self.seq_lo, int(f.value) + 1)
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("seq",):
                self.seq_hi = min(self.seq_hi, int(f.value) + 1)
            elif isinstance(f, LessThan) and f.attribute == ("seq",):
                self.seq_hi = min(self.seq_hi, int(f.value))
            else:
                yield f  # not pushable — Spark applies it post-scan

    def partitions(self):
        lo, hi = self.seq_lo, max(self.seq_hi, self.seq_lo)
        n = hi - lo
        if n == 0:
            return [_RangePartition(lo, lo)]
        step = -(-n // self.n_parts)
        return [_RangePartition(i, min(i + step, hi)) for i in range(lo, hi, step)]

    def read(self, partition: _RangePartition):
        want_b = self.eq.get("behavior")
        want_c = self.eq.get("channel")
        for seq in range(partition.start, partition.end):
            if want_b is not None and BEHAVIORS[seq % len(BEHAVIORS)] != want_b:
                continue
            if (
                want_c is not None
                and CHANNELS[(seq // len(BEHAVIORS)) % len(CHANNELS)] != want_c
            ):
                continue
            yield _row(seq, self.n_users)


class MarketingEventsStreamReader(DataSourceStreamReader):
    """Micro-batch offsets are plain row sequence numbers; each batch
    advances by ``rows_per_batch``. Replay of any (start, end) range is
    bit-identical — the exactly-once contract a checkpoint needs."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 50))
        self.n_users = int(options.get("n_users", 100))
        self.max_rows = int(options.get("max_rows", 10**9))
        self._current = 0

    def initialOffset(self):
        return {"seq": 0}

    def latestOffset(self):
        self._current = min(self._current + self.rows_per_batch, self.max_rows)
        return {"seq": self._current}

    def partitions(self, start, end):
        return [_RangePartition(start["seq"], end["seq"])]

    def read(self, partition: _RangePartition):
        for seq in range(partition.start, partition.end):
            yield _row(seq, self.n_users)

    def commit(self, end):
        pass

    def stop(self):
        pass


class MarketingEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "marketing_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return MarketingEventsReader(self.options)

    def streamReader(self, schema):
        return MarketingEventsStreamReader(self.options)


def register(spark) -> None:
    try:
        # required for pushFilters to be honored (off by default in 4.1)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static-conf builds: pushdown simply stays off
    spark.dataSource.register(MarketingEventsDataSource)
