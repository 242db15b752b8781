"""Multimodal column operators (§2.10): opaque binary payloads with
typed metadata, decode / feature-extract / frame-sample as Arrow-batched
Pandas UDFs over ``mapInPandas`` — plus the grouped-agg Pandas UDF that
rounds out the §2.9 UDF surface.

No reference analog (the Flink project is scalar-only). The image /
audio codec libraries are NOT in this container, so the *decode* step
is stubbed: ``decode_image_meta`` computes a deterministic fake
(clearly marked) from the payload bytes, and raises NotImplementedError
for real codecs. Everything Spark-side — schema (BinaryType + metadata
struct), partition-preserving mapInPandas, Arrow batch shapes, UDF
signatures — is real and tested; swapping the fake for PIL/ffmpeg is a
function-body change only.

Scale notes: binary payloads ride the scan as parquet BYTE_ARRAY;
mapInPandas streams Arrow batches (never materializes a partition);
feature extraction emits narrow rows so the shuffle after it carries
features, not blobs. Hash-based features are md5 so the DuckDB oracle
can reproduce them bit-for-bit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from flink_project_userbehavioranalysis_spark.io import load_events, load_table


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: text → opaque binary payload + typed
    metadata struct (mime, n_bytes). In production the payload column
    arrives this way from ingestion; here the docs corpus stands in."""
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


# ------------------------------------------------ feature extract (mapInPandas)


def binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload features via mapInPandas: byte length + md5 hex.

    The UDF sees Arrow record batches (pandas DataFrames), computes on
    raw bytes, and yields narrow feature rows — the canonical decode /
    featurize batch shape. md5 (not an engine hash) keeps the DuckDB
    oracle able to verify the identical values.
    """
    payloads = attach_binary_payload(load_table(spark, sf_dir, "documents"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return payloads.mapInPandas(
        extract, "doc_id BIGINT, n_bytes BIGINT, payload_md5 STRING, mime STRING"
    )


BINARY_FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       'application/octet-stream' AS mime
FROM documents
"""


# ----------------------------------------------------- decode stub (pandas_udf)

_FAKE_DECODER_NOTE = "deterministic FAKE decode (no codec libs in container)"


def _decode_image_meta_udf():
    """STUB image decode — **deterministic fake**, clearly marked.

    Real decoders (PIL/libjpeg) are absent in this container, so the
    'decoded' dimensions derive from the payload's md5 (stable across
    engines and runs). The UDF signature, Arrow transfer, and struct
    return type are exactly what a real decoder drops into. (Built
    lazily: pandas_udf parses its DDL against the active session.)
    """

    @pandas_udf("width INT, height INT, mean_luma DOUBLE")
    def decode_image_meta(payload: pd.Series) -> pd.DataFrame:
        def fake(b) -> tuple[int, int, float]:
            if b is None:
                return (0, 0, 0.0)
            h = hashlib.md5(bytes(b)).digest()
            # FAKE: dimensions/luma from hash bytes, not a real codec
            return (64 + h[0] % 192, 64 + h[1] % 192, round(h[2] / 255.0, 6))

        out = payload.map(fake)
        return pd.DataFrame(
            {
                "width": out.map(lambda t: t[0]),
                "height": out.map(lambda t: t[1]),
                "mean_luma": out.map(lambda t: t[2]),
            }
        )

    return decode_image_meta


def decode_meta_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + stub-decoded (width, height, mean_luma)."""
    payloads = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    decode_image_meta = _decode_image_meta_udf()
    return payloads.select("doc_id", decode_image_meta("payload").alias("img")).select(
        "doc_id", "img.width", "img.height", "img.mean_luma"
    )


def decode_real(payload: bytes, mime: str):
    """Entry point a real deployment implements; kept explicit so the
    stub boundary is visible to reviewers."""
    raise NotImplementedError(
        f"codec for {mime} not available in this environment ({_FAKE_DECODER_NOTE})"
    )


# ------------------------------------------------ frame sampling (mapInPandas)


def frame_sample(spark: SparkSession, sf_dir: str, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling shape: one payload row → n_frames
    frame rows (doc_id, frame_idx, frame_md5). The fan-out happens
    inside the Arrow batch (no explode shuffle); frame content is the
    payload slice — the FAKE stand-in for an actual frame grab."""
    payloads = attach_binary_payload(load_table(spark, sf_dir, "documents"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step]
                    rows.append((doc_id, i, hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])

    return payloads.mapInPandas(sample, "doc_id BIGINT, frame_idx INT, frame_md5 STRING")


# --------------------------------------------- §2.9 grouped-agg pandas_udf


def geomean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate the built-ins lack, as a GROUPED_AGG pandas_udf
    (the §2.9 Flink-AggregateFunction analog): geometric mean of
    (1 + |value|) per event_type, rounded so the float is comparable
    across engines."""
    import numpy as np

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log1p(np.abs(v)).mean()))

    events = load_events(spark, sf_dir)
    return (
        events.groupBy("event_type")
        .agg(F.round(geomean("value"), 6).alias("geomean_abs1p"))
    )


GEOMEAN_BY_TYPE_SQL = """
SELECT event_type, round(exp(avg(ln(1 + abs(value)))), 6) AS geomean_abs1p
FROM events
GROUP BY 1
"""
