"""State-backend parity: the streaming twins must produce identical
results on the RocksDB state store — Spark's production state backend
(and the direct analog of the reference's Flink RocksDBStateBackend).

The default HDFSBackedStateStoreProvider keeps every key in executor
heap; at 100 TB state (UV dedup keys, open sessions, CEP partials)
that OOMs, and the deployment answer is
``spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider``
— off-heap, spillable, incremental-checkpointing. Because the engine's
operators only use public state semantics (windowed agg state,
dropDuplicates state, applyInPandasWithState), the backend swap must
be invisible in results; these tests pin exactly that, and a run
completing under the conf proves the provider class loads (Spark
fails the query on an unloadable provider).
"""

from __future__ import annotations

import pytest

from flink_project_userbehavioranalysis_spark.streaming import processors as stp
from flink_project_userbehavioranalysis_spark.streaming import windowed as stw

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_KEY = "spark.sql.streaming.stateStore.providerClass"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize(
    "twin",
    [
        stw.uv_hourly_stream,  # watermark-evicted windowed dedup+agg state
        stp.consec_fail_stream,  # applyInPandasWithState keyed CEP state
    ],
    ids=["windowed_agg_state", "applyInPandasWithState"],
)
def test_rocksdb_state_backend_is_result_identical(spark, sf_dir, twin):
    saved = spark.conf.get(_KEY, None)
    try:
        spark.conf.set(_KEY, ROCKSDB)
        rocks = _rows(twin(spark, sf_dir))
    finally:
        if saved is None:
            spark.conf.unset(_KEY)
        else:
            spark.conf.set(_KEY, saved)
    default = _rows(twin(spark, sf_dir))
    assert rocks == default and len(rocks) > 0
