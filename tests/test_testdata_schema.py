"""Testdata schema guard: fail LOUDLY (with a pointed message) if the
driver-regenerated parquet tables drift from the shapes the engine
handles, instead of erroring deep inside an operator. The round-3→4
regeneration changed events.ts from BIGINT nanos to timestamp[us] and
silently zeroed a whole round's scoreboard — this test makes the next
drift a one-line diagnosis."""

import pyarrow.parquet as pq
import pytest

TABLES_COLS = {
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
    "lineitem": None,  # TPC-H shapes checked by their queries
    "orders": None,
}

EVENTS_TS_HANDLED = {"int64", "timestamp[us]", "timestamp[ns]"}


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_known_tables_and_ts_generation(sf):
    for table, cols in TABLES_COLS.items():
        schema = pq.read_schema(f"/root/testdata/{sf}/{table}.parquet")
        if cols is not None:
            missing = cols - set(schema.names)
            assert not missing, (
                f"{sf}/{table}: columns {missing} disappeared from the "
                f"generated testdata — update io.py/operators for the new "
                f"generation (see tests/test_ingest_schema.py history)"
            )
    ts_type = str(pq.read_schema(f"/root/testdata/{sf}/events.parquet").field("ts").type)
    assert ts_type in EVENTS_TS_HANDLED, (
        f"events.ts is now {ts_type!r} — a THIRD schema generation. "
        f"normalize_events (io.py) handles {EVENTS_TS_HANDLED}; add a "
        f"branch for the new type and extend tests/test_ingest_schema.py"
    )
    emb_type = str(
        pq.read_schema(f"/root/testdata/{sf}/embeddings.parquet").field("embedding").type
    )
    assert "float" in emb_type or "double" in emb_type, (
        f"embeddings.embedding is now {emb_type!r}; similarity/quantization "
        f"oracles assume float32 components promoted to double"
    )
