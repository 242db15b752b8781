"""S4 — synthetic marketing-event generator on the rate source.

Reference: AppMarketingByChannel.scala :: SimulatedEventSource
(RichSourceFunction emitting random (userId, behavior, channel, now)
[~L30-55, U]). Spark-native: ``format("rate")`` supplies (timestamp,
value) rows at a controlled rate; deterministic column expressions map
the monotonic ``value`` onto the reference's behavior/channel domains
— no Python in the row path, and unlike the reference's Random the
stream is replayable (same value → same synthetic row), which makes
the generator usable in tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

BEHAVIORS = ["CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL"]
CHANNELS = ["AppStore", "HuaweiStore", "weibo", "wechat", "tieba"]


def marketing_stream(
    spark: SparkSession, rows_per_second: int = 100, n_users: int = 1000
) -> DataFrame:
    """Streaming DataFrame: (ts, user_id, behavior, channel)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    behavior = F.array(*[F.lit(b) for b in BEHAVIORS])[
        (F.col("value") % len(BEHAVIORS)).cast("int")
    ]
    channel = F.array(*[F.lit(c) for c in CHANNELS])[
        ((F.col("value") / len(BEHAVIORS)).cast("long") % len(CHANNELS)).cast("int")
    ]
    return rate.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % n_users).alias("user_id"),
        behavior.alias("behavior"),
        channel.alias("channel"),
    )
