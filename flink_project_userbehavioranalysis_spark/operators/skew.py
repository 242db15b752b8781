"""Skew-handling operators — explicit salting (SURVEY §2.2 P9, §2.4 A4).

The reference hand-rolls salting because Flink's keyed aggregation has
no map-side combine: AppMarketing.scala prefixes keys with a random
int, aggregates, strips the salt, and re-aggregates [U]. Spark's
partial aggregation plus AQE skew-join splitting makes that pattern
unnecessary for the common case (COVERAGE.md marks P9/A4 "n/a by
design") — but "unnecessary by default" is not "inexpressible", and at
100 TB there are two places explicit salting still earns its keep:

1. **Pathological single-key aggregation** where even partial
   aggregation leaves one reducer with a mega-partition of partials
   (e.g. high-cardinality distinct-like state per key, not plain
   counts). ``salted_count_by_channel`` shows the two-stage shape:
   stage 1 aggregates on (key, salt) spreading each hot key over
   ``buckets`` reducers, stage 2 merges the per-salt partials.
2. **Skewed shuffle joins** where one join key carries a large share
   of the fact rows and the dim side is small enough to replicate but
   (unlike broadcast) must stay a shuffle join — e.g. when the dim is
   modest but executor memory is budgeted. ``revenue_by_priority_salted``
   replicates each dim row ``buckets`` times (one per salt value) and
   gives every fact row a deterministic salt, so a hot order key's rows
   land on ``buckets`` different reducers instead of one.

Both produce results provably identical to their unsalted twins: the
driver checks them against the *same* DuckDB oracles (salting is a
physical rewrite, not a semantic one). Salts are deterministic hashes
of row identity — never ``rand()`` — so retried tasks re-derive the
same salt and results stay reproducible under speculative execution.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_project_userbehavioranalysis_spark.functions import money
from flink_project_userbehavioranalysis_spark.io import load_events, load_table
from flink_project_userbehavioranalysis_spark.operators.market import CHANNELS


def salted_count_by_channel(
    spark: SparkSession, sf_dir: str, buckets: int = 16
) -> DataFrame:
    """A4/P9 — two-stage salted windowed count by (channel, behavior).

    Semantically identical to ``market.count_by_channel_behavior`` (the
    driver runs it against the same oracle); physically it splits each
    group across ``buckets`` reducers in stage 1 and merges the partial
    counts in stage 2. The salt is a hash of ``event_id`` (stable row
    identity), never ``rand()``.
    """
    events = load_events(spark, sf_dir)
    salt = F.pmod(F.xxhash64("event_id"), F.lit(buckets)).alias("salt")
    stage1 = (
        events.filter(F.col("event_type") != "error")
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            (F.col("user_id") % CHANNELS).alias("chn"),
            F.col("event_type").alias("behavior"),
            salt,
        )
        .agg(F.count("*").alias("partial_cnt"))
    )
    return (
        stage1.groupBy("w", "chn", "behavior")
        .agg(F.sum("partial_cnt").alias("cnt"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            F.col("w.end").cast("long").alias("window_end"),
            F.col("chn").alias("channel"),
            "behavior",
            "cnt",
        )
    )


def revenue_by_priority_salted(
    spark: SparkSession, sf_dir: str, buckets: int = 8
) -> DataFrame:
    """P9 join salting — lineitem ⋈ orders with a replicated dim side.

    Every lineitem row gets ``salt = hash(l_orderkey, l_linenumber) %
    buckets``; every orders row is exploded into ``buckets`` copies
    (one per salt value); the equi-join key becomes (orderkey, salt).
    A hot ``l_orderkey`` therefore spreads over ``buckets`` reducers.
    The ``shuffle_hash`` hint pins a shuffled join — broadcasting the
    dim would bypass the skew entirely and make the demo vacuous (when
    the dim genuinely fits in memory, ``F.broadcast`` is the better
    tool; see order_pay.py).

    Money math is DECIMAL end-to-end (functions.MONEY) so the merged
    sum is bit-identical to the oracle regardless of salt-partial
    ordering.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")

    fact = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(buckets))
    )
    dim = orders.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    disc_price = money("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - money("l_discount")
    )
    return (
        fact.join(
            dim.hint("shuffle_hash"),
            on=(fact.l_orderkey == dim.o_orderkey) & (fact.salt == dim.salt),
            how="inner",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(disc_price).alias("revenue_dec"),
        )
        .select(
            "o_orderpriority",
            "n_lines",
            F.col("revenue_dec").cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------- oracle SQL

REVENUE_BY_PRIORITY_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""
