"""Data-layout utilities for the 100 TB tier: hive-partitioned writes
(partition pruning), and Z-order (Morton) clustering for multi-column
data skipping.

No reference analog (the reference reads flat CSV; SURVEY §2.1 S1/S2
[U]) — but at 100 TB the dominant cost of every query in this engine
is the scan, and layout is the only lever that makes scans CHEAPER
than linear:

- ``write_partitioned`` lays a table out as ``path/col=value/...``
  hive directories. Any equality/range predicate on the partition
  columns then prunes whole directories at PLANNING time
  (``PartitionFilters`` in the scan node) — the 100 TB daily-ingest
  pattern is events partitioned by ``dt`` so a one-day query reads
  1/365th of the store.
- ``zorder_key`` interleaves the bits of several bucketized columns
  into one Morton code; sorting the table by that code before writing
  makes every parquet row group narrow in EVERY participating
  dimension at once, so single-column min/max footer stats skip row
  groups for predicates on ANY of the columns — the standard
  lakehouse multi-dimension clustering trick (Delta/Iceberg expose the
  same thing as OPTIMIZE ZORDER). A plain sort by (a, b) only skips
  well on ``a``; the Morton curve skips on both.

Everything is expression-level (shift/mask/or inside whole-stage
codegen): the clustering itself is one range repartition + in-partition
sort — exactly the shuffle a sorted write needs anyway.
"""

from __future__ import annotations

import math
import os
from functools import reduce
from urllib.parse import unquote, urlparse

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-partitioned overwrite write. Partition columns become
    directories (``path/dt=2017-11-26/...``); readers get planning-time
    partition pruning for free on any predicate over them.

    Partition columns should be LOW-cardinality (days, sources,
    regions): each distinct tuple is a directory, and at 100 TB a
    high-cardinality partition column shatters the store into millions
    of tiny files — use ``zorder_key`` clustering WITHIN partitions for
    high-cardinality skipping instead.
    """
    df.write.mode("overwrite").format(fmt).partitionBy(*partition_cols).save(path)


def quantize_col(c: Column, lo: Column | int, hi: Column | int, bits: int) -> Column:
    """Map a numeric column into the integer lattice [0, 2^bits) via
    min/max scaling — the per-column preparation step for Morton
    interleave. lo/hi are the column's domain bounds (from stats or a
    prior agg); values clamp to the lattice edges."""
    lo_c = F.lit(lo) if isinstance(lo, int) else lo
    hi_c = F.lit(hi) if isinstance(hi, int) else hi
    span = (hi_c - lo_c).cast("double")
    scaled = ((c.cast("double") - lo_c.cast("double")) / span) * ((1 << bits) - 1)
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of ``len(cols)`` lattice columns,
    each already quantized to [0, 2^bits) (see ``quantize_col``).

    Bit i of column j lands at output bit ``i*n + j`` — the classic
    bit-interleave, built from shiftright/shiftleft/bitwise-OR
    expressions that stay inside whole-stage codegen (no UDF). Total
    output bits = bits*n ≤ 63.
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*len(cols) = {bits * n} exceeds a signed 64-bit key")
    parts: list[Column] = []
    for j, c in enumerate(cols):
        for i in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zkey")


def cluster_zorder(
    df: DataFrame, zkey: Column, num_partitions: int | None = None
) -> DataFrame:
    """Range-repartition + in-partition sort by the Morton key — the
    write-side clustering pass. Range partitioning keeps the curve
    contiguous per output file (each file covers one z-range, so its
    per-column min/max footer stats are tight); the in-partition sort
    tightens each ROW GROUP the same way. One shuffle total — the same
    shuffle any sorted write pays."""
    if num_partitions:
        rp = df.repartitionByRange(num_partitions, zkey)
    else:
        rp = df.repartitionByRange(zkey)
    return rp.sortWithinPartitions(zkey)


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
) -> dict[str, int]:
    """OPTIMIZE-style bin-pack compaction: rewrite ``src_path`` into
    ``ceil(total_bytes / target_bytes)`` files at ``dst_path``.

    At 100 TB, FILE COUNT is the scan-planning killer — a day of
    ingest from a 1000-task writer leaves 1000 files per partition,
    and listing/footer-reading millions of small files dominates query
    startup long before a byte of data is read. The fix is the
    standard lakehouse maintenance pass (Delta/Iceberg ``OPTIMIZE``):
    periodically rewrite each partition's files into ~128 MB bins.

    With ``sort_cols`` the rewrite ALSO re-clusters (range-partition +
    in-partition sort — compaction is the natural moment to restore
    clustering, since it pays the full rewrite anyway); without, a
    round-robin ``repartition`` balances bytes evenly across bins.
    Returns ``{files_before, files_after, total_bytes, n_out}`` —
    driver-side file-listing metadata only, never row data.
    """
    df = spark.read.parquet(src_path)
    local = [unquote(urlparse(f).path) for f in df.inputFiles()]
    statable = [p for p in local if os.path.exists(p)]
    if local and not statable:
        # inputFiles() listed files but none are locally stat-able —
        # a non-local filesystem (hdfs://, s3a://). Silently treating
        # that as total=0 would funnel an arbitrarily large table into
        # ONE output file; fail loudly instead (this utility sizes
        # bins from local stat; remote stores need a FileSystem-API
        # listing).
        raise ValueError(
            f"compact_small_files: none of {len(local)} input files are "
            f"locally stat-able (non-local filesystem?): {local[0]!r}"
        )
    total = sum(os.path.getsize(p) for p in statable)
    n_out = max(1, math.ceil(total / target_bytes))
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_path)
    after = spark.read.parquet(dst_path)
    return {
        "files_before": len(local),
        "files_after": len(after.inputFiles()),
        "total_bytes": total,
        "n_out": n_out,
    }
