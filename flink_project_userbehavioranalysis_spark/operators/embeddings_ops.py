"""Embedding-column operators for training-data pipelines: per-label
centroids (distributed vector mean) and int8 quantization.

No reference analog (SURVEY §2.10 extension pillar) — these are the
vector-side utilities a pretraining/embedding pipeline needs next to
ANN search: cluster/class centroids for diagnostics and IVF-style
seeding, and symmetric int8 quantization to cut a 100 TB embedding
store 4× before serving.

100 TB posture: both are pure expression-level dataflows.
- Centroids shuffle (label, dim) pairs with partial aggregation — the
  map-side combine collapses each partition to ≤ labels×dims partial
  sums, so the exchange carries aggregates, not vectors. No driver
  collect, no numpy, no UDF.
- Quantization is a per-row map (zero shuffle): scale/clamp/round via
  array expressions inside whole-stage codegen. The emitted checksum
  columns are exact integers so the DuckDB oracle hash is stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_project_userbehavioranalysis_spark.io import load_table

# ------------------------------------------------------- label centroids


def _centroids_by(keyed: DataFrame, key: str) -> DataFrame:
    """Element-wise mean of ``embedding`` per ``key`` column + member
    count. Dataflow: posexplode to (key, dim, value) → ONE
    partial-aggregated shuffle on (key, dim) → re-assemble the vector
    with a deterministic array_sort(collect_list(struct(dim, s))) per
    key.

    Exact-integer checksum pattern (same as ``quantize_embeddings``,
    closing the r5-advice float-rounding gap for good): each float32
    component quantizes ONCE to nano-units (round(v·10⁹) as BIGINT —
    ties are measure-zero over real float data), and everything
    downstream is exact 64-bit integer arithmetic, which is associative
    — Spark's two-phase partial aggregation and the oracle's single
    pass produce bit-identical sums by construction, with no rounding
    boundary anywhere. ``centroid_q`` carries the exact per-dim sums
    (the MERGEABLE aggregate state — the form 100 TB shard rollups
    combine); ``centroid`` derives the mean from those integers with
    one IEEE double divide of identical operands per dim (max |sum| ~
    10¹⁴ ≪ 2⁵³, so the long→double conversion is exact), deterministic
    across engines."""
    per_dim = (
        keyed.select(key, F.posexplode("embedding").alias("dim", "v"))
        .groupBy(key, "dim")
        .agg(
            F.sum(
                F.round(F.col("v").cast("double") * F.lit(1e9)).cast("long")
            ).alias("s"),
            F.count("*").alias("n"),
        )
    )
    return (
        per_dim.groupBy(key)
        .agg(
            F.max("n").alias("n_vecs"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "s"))), lambda st: st["s"]
            ).alias("centroid_q"),
        )
        .select(
            key,
            "n_vecs",
            "centroid_q",
            F.transform(
                "centroid_q", lambda x: x / (F.col("n_vecs") * F.lit(1e9))
            ).alias("centroid"),
        )
    )


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label + member count.

    Output: label, n_vecs, centroid_q (array<bigint> — exact per-dim
    nano-unit sums, the mergeable state), centroid (array<double> mean
    derived from the exact integers).
    """
    return _centroids_by(load_table(spark, sf_dir, "embeddings"), "label")


EMBEDDING_CENTROIDS_SQL = """
WITH ex AS (
    SELECT label,
           generate_subscripts(embedding, 1) - 1 AS dim,
           unnest(embedding) AS v
    FROM embeddings
), per_dim AS (
    -- nano-unit integer quantization + exact BIGINT sum: associative,
    -- order-independent, no rounding boundary (see _centroids_by)
    SELECT label, dim,
           CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT)) AS BIGINT) AS s,
           count(*) AS n
    FROM ex GROUP BY 1, 2
), agg AS (
    SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
           list(s ORDER BY dim) AS centroid_q
    FROM per_dim GROUP BY 1
)
SELECT label, n_vecs, centroid_q,
       list_transform(centroid_q,
                      x -> CAST(x AS DOUBLE) / (n_vecs * 1000000000.0)) AS centroid
FROM agg
"""


# ------------------------------------------------------ int8 quantization


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = 127 / max|x|,
    q_i = clamp(round(x_i * scale), -127, 127).

    Emitted as exact-integer checksums (sum_q, n_sat = components at
    the ±127 clamp) plus the 9 dp scale, rather than the int8 array
    itself — integer outputs make the oracle compare bit-exact while
    still pinning every quantized component through the sum.

    The max component quantizes to exactly ±127 by construction
    (x = max|x| ⇒ x·scale = 127.0 exactly in double), so the
    round-half behavior of Spark (HALF_UP) and DuckDB (ties away from
    zero) only meets a tie on a measure-zero set of float inputs.

    Per-row map, zero shuffle, whole-stage codegen end to end. The
    scale and quantized array are STAGED through explicit projections:
    referencing the scalar ``scale`` expression inside an array lambda
    would inline it per element (Catalyst does not CSE into lambda
    bodies), turning the O(d) row into O(d²) recomputation of the max
    — staged columns are evaluated once per row.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    staged = (
        emb.select(
            "vec_id",
            "embedding",
            F.array_max(F.transform("embedding", lambda x: F.abs(x))).alias("maxabs"),
        )
        .filter(F.col("maxabs") > 0)
        .select("vec_id", "embedding", (F.lit(127.0) / F.col("maxabs")).alias("scale"))
        .select(
            "vec_id",
            "scale",
            F.transform(
                "embedding",
                lambda x: F.least(
                    F.greatest(F.round(x * F.col("scale")), F.lit(-127.0)), F.lit(127.0)
                ).cast("long"),
            ).alias("q"),
        )
    )
    return staged.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("sum_q"),
        F.size(F.filter("q", lambda x: F.abs(x) == 127)).alias("n_sat"),
    )


QUANTIZE_EMBEDDINGS_SQL = """
WITH s AS (
    -- the float32 components MUST be promoted to DOUBLE before the
    -- division: DuckDB otherwise resolves DECIMAL/FLOAT in float32
    -- precision, which diverges from Spark's double math in the 7th
    -- significant digit
    SELECT vec_id, embedding,
           CAST(127.0 AS DOUBLE)
             / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
    FROM embeddings
    WHERE list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
), q AS (
    SELECT vec_id, scale,
           list_transform(embedding,
                          x -> CAST(least(greatest(round(x * scale), -127.0), 127.0) AS BIGINT)) AS qv
    FROM s
)
SELECT vec_id, round(scale, 9) AS scale,
       CAST(list_sum(qv) AS BIGINT) AS sum_q,
       CAST(len(list_filter(qv, x -> abs(x) = 127)) AS INTEGER) AS n_sat
FROM q
"""


# ------------------------------------------------- doc-joined centroids


def lang_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language centroids of the document embeddings — the
    documents↔embeddings join edge: attribute each vector to its
    document's language (vec_id = doc_id where both exist), then the
    same partial-aggregated vector mean as ``embedding_centroids``.

    Scale shape: ONE equi-shuffle join on the id (both sides narrow —
    (id, lang) vs (id, vector); Catalyst broadcasts the dim side when
    it fits, shuffles otherwise) followed by the (lang, dim)
    partial-aggregated mean. No vector ever reaches the driver.

    Output: lang, n_vecs, centroid_q (array<bigint> exact nano-unit
    sums), centroid (array<double> mean derived from the integers).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    keyed = emb.join(docs, emb.vec_id == docs.doc_id).select("lang", "embedding")
    return _centroids_by(keyed, "lang")


LANG_CENTROIDS_SQL = """
WITH keyed AS (
    SELECT d.lang AS lang, e.embedding AS embedding
    FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
), ex AS (
    SELECT lang,
           generate_subscripts(embedding, 1) - 1 AS dim,
           unnest(embedding) AS v
    FROM keyed
), per_dim AS (
    SELECT lang, dim,
           CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT)) AS BIGINT) AS s,
           count(*) AS n
    FROM ex GROUP BY 1, 2
), agg AS (
    SELECT lang, CAST(max(n) AS BIGINT) AS n_vecs,
           list(s ORDER BY dim) AS centroid_q
    FROM per_dim GROUP BY 1
)
SELECT lang, n_vecs, centroid_q,
       list_transform(centroid_q,
                      x -> CAST(x AS DOUBLE) / (n_vecs * 1000000000.0)) AS centroid
FROM agg
"""
