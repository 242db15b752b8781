"""Source connectors (SURVEY §2.1 S1-S6).

S1 parquet scan lives in ``io.py``; streaming file replay in
``streaming/replay.py``. This package adds the remaining source
surface: schema'd CSV (S2), Kafka consumer/producer builders (S3/S6 —
constructible; need the spark-sql-kafka connector jar on the
classpath, absent in this container), and the rate-based synthetic
marketing generator (S4).
"""

from flink_project_userbehavioranalysis_spark.sources.csv_source import (  # noqa: F401
    events_from_csv_lines,
    read_events_csv,
    write_events_csv,
)
from flink_project_userbehavioranalysis_spark.sources.generator import (  # noqa: F401
    marketing_stream,
)
from flink_project_userbehavioranalysis_spark.sources.kafka import (  # noqa: F401
    kafka_events_stream,
    kafka_writer,
)
