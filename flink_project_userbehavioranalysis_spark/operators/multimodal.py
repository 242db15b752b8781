"""Multimodal column operators (§2.10): opaque binary payloads with
typed metadata, decode / feature-extract / frame-sample as Arrow-batched
Pandas UDFs over ``mapInPandas`` — plus the grouped-agg Pandas UDF that
rounds out the §2.9 UDF surface.

No reference analog (the Flink project is scalar-only). The jpeg/png/
mp4 codec libraries are NOT in this container; instead of a fake, the
decode path implements a REAL dependency-free decoder for one trivial
public format — Windows BMP (header fields at fixed offsets, bottom-up
padded scanlines) — over synthesized-but-valid BMP payloads, so the
decoded integers and scanline hashes are exact-oracle-checkable.
Unimplemented formats raise at the explicit ``decode_real`` boundary;
swapping in PIL/ffmpeg for them is a function-body change only.

Scale notes: binary payloads ride the scan as parquet BYTE_ARRAY;
mapInPandas streams Arrow batches (never materializes a partition);
feature extraction emits narrow rows so the shuffle after it carries
features, not blobs. Hash-based features are md5 so the DuckDB oracle
can reproduce them bit-for-bit.
"""

from __future__ import annotations

import hashlib
import struct
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


# ----------------------------------------------- real BMP codec (pure Python)
#
# A REAL decoder for one trivial public format: Windows BMP
# (BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp, bottom-up scanlines,
# 4-byte row padding — the layout documented in every BMP spec).
# Pure stdlib `struct`, no codec libraries. The testdata carries no
# image files, so `attach_bmp_payload` first ENCODES a valid BMP per
# document from deterministic text-derived dimensions/pixels; the
# decode pass then parses the actual header bytes at their fixed
# offsets. Because the encoding rules are closed-form integer
# arithmetic on octet_length(text), a DuckDB oracle can state the
# expected decode EXACTLY — a header-parse off-by-one anywhere
# hash-mismatches. Formats this module does not implement still raise
# at the explicit `decode_real` boundary.


def _bmp_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic synthetic dimensions from the payload text size."""
    return (n_bytes % 31 + 1, n_bytes % 17 + 1)


def _bmp_row_size(width: int) -> int:
    """24bpp scanline stride: 3 bytes/px padded up to 4-byte alignment."""
    return ((3 * width + 3) // 4) * 4


def _bmp_row_byte(n_bytes: int, r: int) -> int:
    """Pixel byte filling logical (top-down) row r — printable ASCII so
    the oracle can rebuild the scanline with repeat(chr(..))."""
    return 32 + (n_bytes + r) % 95


def encode_bmp(text_bytes: bytes | None) -> bytes:
    """Build a complete, valid 24bpp BMP file for a document payload."""
    n = len(text_bytes) if text_bytes is not None else 0
    w, h = _bmp_dims(n)
    rs = _bmp_row_size(w)
    data_size = rs * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    # BMP stores scanlines BOTTOM-UP: logical row r is written at
    # file position 54 + (h-1-r)*rs
    rows = [bytes([_bmp_row_byte(n, r)]) * rs for r in range(h)]
    return header + info + b"".join(reversed(rows))


def decode_bmp_meta(b: bytes) -> tuple[int, int, int, int]:
    """Parse (width, height, bpp, file_size) from the fixed header
    offsets (2=file size, 18=width, 22=height, 28=bpp)."""
    magic, file_size = struct.unpack_from("<2sI", b, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    return width, height, bpp, file_size


def bmp_scanline(b: bytes, r: int) -> bytes:
    """Extract logical (top-down) scanline r, honoring the bottom-up
    row order and the header's data offset."""
    width, height, bpp, _ = decode_bmp_meta(b)
    (data_off,) = struct.unpack_from("<I", b, 10)
    rs = ((bpp // 8 * width + 3) // 4) * 4
    start = data_off + (height - 1 - r) * rs
    return b[start : start + rs]


def attach_bmp_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload: binary BMP) via an Arrow-batched
    encode pass; NULL text encodes the 0-byte dimensions (total)."""
    src = docs.select("doc_id", F.col("text").cast("binary").alias("tb"))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["tb"].map(
                        lambda t: encode_bmp(None if t is None else bytes(t))
                    ),
                }
            )

    return src.mapInPandas(enc, "doc_id BIGINT, payload BINARY")


def decode_meta_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + REAL header-parsed (width, height, bpp, file_size).

    The payload column flows through Spark as a true binary column
    between the encode and decode passes (two separate Arrow-batched
    UDFs), so the plumbing a real image pipeline needs — schema,
    batch shapes, partitioning — is exercised end to end, and the
    decoded integers hash-match the oracle's closed form.
    """
    payloads = attach_bmp_payload(load_table(spark, sf_dir, "documents"))

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["payload"].map(lambda b: decode_bmp_meta(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": metas.map(lambda t: t[0]),
                    "height": metas.map(lambda t: t[1]),
                    "bpp": metas.map(lambda t: t[2]),
                    "file_size": metas.map(lambda t: t[3]),
                }
            )

    return payloads.mapInPandas(
        dec, "doc_id BIGINT, width INT, height INT, bpp INT, file_size BIGINT"
    )


DECODE_META_SQL = """
SELECT doc_id,
       CAST(width AS INTEGER) AS width,
       CAST(height AS INTEGER) AS height,
       24 AS bpp,
       CAST(54 + ((3 * width + 3) // 4) * 4 * height AS BIGINT) AS file_size
FROM (
    SELECT doc_id,
           coalesce(octet_length(CAST(text AS BLOB)), 0) % 31 + 1 AS width,
           coalesce(octet_length(CAST(text AS BLOB)), 0) % 17 + 1 AS height
    FROM documents
)
"""


def decode_real(payload: bytes, mime: str):
    """Boundary for formats this module does NOT decode (jpeg/png/
    mp4 codecs are absent in this container); kept explicit so the
    implemented-format line (BMP only) is visible to reviewers."""
    if mime == "image/bmp":
        return decode_bmp_meta(payload)
    raise NotImplementedError(f"codec for {mime} not available in this environment")


# ------------------------------------------------ frame sampling (mapInPandas)


def frame_sample(spark: SparkSession, sf_dir: str, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling over the decoded payload: one BMP row
    → ``n_frames`` sampled scanlines (doc_id, frame_idx, sampled_row,
    frame_md5), evenly spaced over the image height. The fan-out
    happens inside the Arrow batch (no explode shuffle); the scanline
    grab is the real bottom-up offset math (``bmp_scanline``), and the
    md5 of the extracted bytes hash-matches the oracle's rebuilt row."""
    payloads = attach_bmp_payload(load_table(spark, sf_dir, "documents"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                _, height, _, _ = decode_bmp_meta(b)
                for i in range(n_frames):
                    r = i * height // n_frames
                    rows.append(
                        (doc_id, i, r, hashlib.md5(bmp_scanline(b, r)).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "sampled_row", "frame_md5"]
            )

    return payloads.mapInPandas(
        sample, "doc_id BIGINT, frame_idx INT, sampled_row INT, frame_md5 STRING"
    )


def frame_sample_oracle_sql(n_frames: int = 4) -> str:
    return f"""
WITH dims AS (
    SELECT doc_id,
           coalesce(octet_length(CAST(text AS BLOB)), 0) AS n,
           coalesce(octet_length(CAST(text AS BLOB)), 0) % 31 + 1 AS width,
           coalesce(octet_length(CAST(text AS BLOB)), 0) % 17 + 1 AS height
    FROM documents
)
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       CAST((i * height) // {n_frames} AS INTEGER) AS sampled_row,
       md5(repeat(chr(CAST(32 + (n + (i * height) // {n_frames}) % 95 AS INTEGER)),
                  ((3 * width + 3) // 4) * 4)) AS frame_md5
FROM dims CROSS JOIN (SELECT unnest(range(0, {n_frames})) AS i)
"""


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
