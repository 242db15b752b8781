"""Multimodal/UDF-surface operators: oracle-match for the hash-exact
ones, shape + determinism for the stubbed decode path."""

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.operators import multimodal as MM
from tests.oracle import assert_matches_oracle


def test_binary_features(spark, sf_dir):
    df = MM.binary_features(spark, sf_dir)
    assert_matches_oracle(df, MM.BINARY_FEATURES_SQL, sf_dir)


def test_geomean_pandas_udf(spark, sf_dir):
    """§2.9 GROUPED_AGG pandas_udf equals the SQL formulation after
    deterministic rounding."""
    df = MM.geomean_by_type(spark, sf_dir)
    assert_matches_oracle(df, MM.GEOMEAN_BY_TYPE_SQL, sf_dir)


def test_decode_stub_shape_and_determinism(spark, sf_dir):
    a = MM.decode_meta_table(spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert a.count() == n_docs
    assert a.columns == ["doc_id", "width", "height", "mean_luma"]
    # fake decode is deterministic: two runs identical
    b = MM.decode_meta_table(spark, sf_dir)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    # dimensions in the fake's documented range
    bad = a.filter(
        (F.col("width") < 64) | (F.col("width") > 255)
        | (F.col("height") < 64) | (F.col("height") > 255)
    ).count()
    assert bad == 0


def test_frame_sample_fanout(spark, sf_dir):
    df = MM.frame_sample(spark, sf_dir, n_frames=4)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert df.count() == n_docs * 4
    idx = {r["frame_idx"] for r in df.select("frame_idx").distinct().collect()}
    assert idx == {0, 1, 2, 3}


def test_decode_real_is_explicit_stub():
    import pytest

    with pytest.raises(NotImplementedError):
        MM.decode_real(b"bytes", "image/jpeg")
