"""transformWithStateInPandas gate (SURVEY §2.7 planned API).

The container lacks google.protobuf, which the TWS state-server
protocol requires, so the engine's processors run on
``applyInPandasWithState`` with the earliest-deadline timeout
reduction (processors.py module docstring). These tests make the gate
explicit, mirroring the Kafka connector gate:

- in this environment: assert the ImportError is exactly the
  documented one (not a latent engine bug);
- when protobuf IS installed (``pip install protobuf``): a minimal
  per-key running-count StatefulProcessor runs end to end and must
  agree with the batch count — the parity recipe for upgrading the
  processors to multi-state/multi-timer TWS.
"""

import pytest


def _protobuf_present() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_gate_documented(spark):
    if _protobuf_present():
        pytest.skip("protobuf available — covered by test_tws_running_count")
    with pytest.raises(ImportError, match="google"):
        # the generated state-protocol messages are the first hard
        # protobuf dependency on the TWS execution path
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401


@pytest.mark.skipif(
    not _protobuf_present(),
    reason="transformWithStateInPandas needs google.protobuf "
    "(pip install protobuf to activate)",
)
def test_tws_running_count(spark, sf_dir, tmp_path):
    """Minimal TWS parity check: ValueState running count per user over
    the replayed event stream equals the batch groupBy count."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    import pyspark.sql.functions as F
    from flink_project_userbehavioranalysis_spark.io import load_events
    from flink_project_userbehavioranalysis_spark.streaming.replay import (
        events_stream,
        run_update_merge,
    )

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("cnt", LongType())]
    )

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "count", StructType([StructField("c", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            self._count.update((prev + n,))
            yield pd.DataFrame({"user_id": [key[0]], "cnt": [prev + n]})

        def close(self) -> None:
            pass

    ev = events_stream(spark, sf_dir, n_chunks=4)
    counted = (
        ev.groupBy("user_id")
        .transformWithStateInPandas(
            RunningCount(), outputStructType=out_schema, outputMode="Update",
            timeMode="None",
        )
    )
    final = run_update_merge(counted, ["user_id"], spark)
    got = {r["user_id"]: r["cnt"] for r in final.collect()}
    want = {
        r["user_id"]: r["cnt"]
        for r in load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want
