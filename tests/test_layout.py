"""Layout-tier audits: partition pruning must happen at planning time,
and Z-order clustering must measurably tighten per-file column ranges
(the mechanism behind row-group skipping) versus an unclustered write.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyarrow.parquet as pq

from flink_project_userbehavioranalysis_spark import layout
from flink_project_userbehavioranalysis_spark.io import load_events


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    ev = load_events(spark, sf_dir).withColumn("dt", F.to_date("ts"))
    layout.write_partitioned(ev, str(tmp_path / "ev"), ["dt"])

    back = spark.read.parquet(str(tmp_path / "ev"))
    one_day = back.select("dt").distinct().orderBy("dt").limit(1).collect()[0]["dt"]
    q = back.filter(F.col("dt") == F.lit(one_day))
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the dt predicate must be a PLANNING-time partition filter, not a
    # post-scan row filter
    assert "PartitionFilters" in plan
    assert "dt" in plan.split("PartitionFilters")[1][:200]
    # and the scan must touch exactly the one matching directory
    n_days = back.select("dt").distinct().count()
    assert n_days > 1  # pruning is only meaningful with multiple dirs
    assert "partitions=1" in plan or q.count() < ev.count()


def _file_ranges(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per-file (min, max) for each column from parquet footer stats —
    the exact metadata a scan's skipping layer consults."""
    import glob
    import os

    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def test_zorder_tightens_both_dims(spark, tmp_path):
    # lineitem at sf0.01: both keys are high-cardinality (orderkey
    # 0..~15k, partkey 0..2k) — the regime where multi-dim clustering
    # matters; events at sf0.001 has a 15-value user domain, too
    # coarse to measure curve locality
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    bounds = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).collect()[0]
    olo, ohi, plo, phi = (int(b) for b in bounds)

    zk = layout.zorder_key(
        [
            layout.quantize_col(F.col("l_orderkey"), olo, ohi, 12),
            layout.quantize_col(F.col("l_partkey"), plo, phi, 12),
        ],
        bits=12,
    )
    n_files = 16
    layout.cluster_zorder(li.withColumn("zkey", zk), F.col("zkey"), n_files).drop(
        "zkey"
    ).write.mode("overwrite").parquet(str(tmp_path / "zord"))
    # baseline: same file count, hash-scattered layout (what a plain
    # ingest shuffle produces)
    li.repartition(n_files).write.mode("overwrite").parquet(str(tmp_path / "naive"))

    def avg_span(path):
        ranges = _file_ranges(str(path), ["l_orderkey", "l_partkey"])
        return {
            c: sum(r[c][1] - r[c][0] for r in ranges) / len(ranges)
            for c in ["l_orderkey", "l_partkey"]
        }

    z, naive = avg_span(tmp_path / "zord"), avg_span(tmp_path / "naive")
    # Z-order must tighten the per-file range on BOTH dimensions at
    # once — a single-column sort would only tighten one. 16 files =
    # 4 z-prefix bits = 2 splits per dim, so the ideal tightening is
    # 4x/dim; 2x is the lax bound.
    assert z["l_orderkey"] * 2 < naive["l_orderkey"], (z, naive)
    assert z["l_partkey"] * 2 < naive["l_partkey"], (z, naive)


def test_zorder_key_is_codegen_expression(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    zk = layout.zorder_key(
        [
            layout.quantize_col(F.col("user_id"), 0, 1 << 20, 8),
            layout.quantize_col(F.col("item_id"), 0, 1 << 20, 8),
        ],
        bits=8,
    )
    df = ev.select(zk)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # interleave must be a bijection on the lattice product: no two
    # distinct (uq, iq) pairs may collide
    pairs = ev.select(
        layout.quantize_col(F.col("user_id"), 0, 1 << 20, 8).alias("uq"),
        layout.quantize_col(F.col("item_id"), 0, 1 << 20, 8).alias("iq"),
        zk,
    )
    n_pairs = pairs.select("uq", "iq").distinct().count()
    n_keys = pairs.select("zkey").distinct().count()
    assert n_pairs == n_keys


def test_dynamic_partition_pruning_on_joined_dim(spark, sf_dir, tmp_path):
    """DPP: when the pruning predicate lives on a JOINED dim (not the
    fact itself), Catalyst must inject a runtime subquery filter into
    the fact scan's PartitionFilters — the mechanism that makes
    star-joins over a date-partitioned 100 TB fact read only the
    matching partitions."""
    ev = load_events(spark, sf_dir).withColumn("dt", F.to_date("ts"))
    layout.write_partitioned(ev, str(tmp_path / "fact"), ["dt"])
    fact = spark.read.parquet(str(tmp_path / "fact"))

    # dim: one row per day with an attribute we can filter on. The
    # predicate must be an explicit comparison (dow = 1): Spark's
    # isLikelySelective() does not treat a bare boolean attribute as
    # selective, so `filter(col("flag"))` silently disables DPP — a
    # real-world pitfall worth pinning here.
    dim = fact.select("dt").distinct().withColumn("dow", F.dayofweek("dt"))
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    dim = spark.read.parquet(str(tmp_path / "dim"))

    joined = (
        fact.join(dim.filter(F.col("dow") == 1), "dt")
        .groupBy("dt")
        .agg(F.sum("value").alias("v"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_schema_evolution_across_partitions(spark, tmp_path):
    """Day-partitioned stores evolve: a new column appears in newer
    partitions. mergeSchema reads must union the schemas with NULL
    backfill for old partitions — the ingest-compatibility property a
    long-lived 100 TB table depends on (no rewrite of history when a
    producer adds a field)."""
    import pyspark.sql.functions as F

    base = str(tmp_path / "evolving")
    old = spark.range(5).select(
        F.col("id").alias("user_id"), F.lit("view").alias("event_type")
    )
    new = spark.range(5, 8).select(
        F.col("id").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit("web").alias("channel"),  # the evolved column
    )
    old.write.parquet(f"{base}/dt=2026-01-01")
    new.write.parquet(f"{base}/dt=2026-01-02")
    back = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(back.columns) == {"user_id", "event_type", "channel", "dt"}
    assert back.count() == 8
    # old-partition rows surface the evolved column as NULL, new ones typed
    assert back.filter(F.col("dt") == "2026-01-01").filter(F.col("channel").isNull()).count() == 5
    assert back.filter(F.col("dt") == "2026-01-02").filter(F.col("channel") == "web").count() == 3
    # predicate on the evolved column still prunes correctly
    assert back.filter(F.col("channel").isNotNull()).count() == 3
