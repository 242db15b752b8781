"""Semantic invariants of the corpus-quality decision layer (the
oracle match itself is auto-covered by test_operators_oracle)."""

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.operators import corpus_quality as CQ

SF_MID = "/root/testdata/sf0.01"


def test_gopher_gates_consistent_and_discriminating(spark):
    df = CQ.gopher_quality_filter(spark, SF_MID)
    gates = ["g_count", "g_wordlen", "g_rep", "g_distinct", "g_stop"]
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum("keep").alias("kept"),
        # keep must equal the AND of the emitted gate bitmap, row-wise
        F.sum(
            (
                F.col("keep")
                != (
                    F.col("g_count")
                    * F.col("g_wordlen")
                    * F.col("g_rep")
                    * F.col("g_distinct")
                    * F.col("g_stop")
                )
            ).cast("int")
        ).alias("inconsistent"),
        *[F.sum(g).alias(g) for g in gates],
    ).collect()[0]
    assert agg["inconsistent"] == 0
    # the filter must actually split the corpus, and every rule must
    # both fire and pass somewhere (thresholds chosen against the
    # synthetic corpus distributions; a testdata regen that degenerates
    # a rule should fail loudly here)
    assert 0 < agg["kept"] < agg["n"]
    for g in gates:
        assert 0 < agg[g] <= agg["n"], g


def test_gopher_single_shuffle_plan(spark):
    # one explode + ONE partial-aggregated shuffle: the (doc_id, token)
    # tf aggregation reuses its clustering for the per-doc rollup, so
    # exactly one Exchange appears in the whole plan
    plan = CQ.gopher_quality_filter(spark, SF_MID)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # tf shuffle (+ AQE read), no join
    assert "Join" not in plan


def test_gopher_projection_equals_groupby_form(spark):
    """The map-only formulation and the explode→groupBy formulation
    must emit bit-identical rows (they share one oracle)."""
    from flink_project_userbehavioranalysis_spark.io import load_table

    a = CQ.gopher_quality_filter(spark, SF_MID)
    b = CQ.gopher_quality_projection(load_table(spark, SF_MID, "documents"))
    assert sorted(a.columns) == sorted(b.columns)
    ra = sorted(tuple(r) for r in a.select(*sorted(a.columns)).collect())
    rb = sorted(tuple(r) for r in b.select(*sorted(b.columns)).collect())
    assert ra == rb


def test_gopher_projection_is_map_only(spark):
    from flink_project_userbehavioranalysis_spark.io import load_table

    df = CQ.gopher_quality_projection(load_table(spark, SF_MID, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_corpus_drift(spark, sf_dir):
    """Drift monitor: oracle-match; volume columns partition the corpus
    (old + new doc counts == non-null-text total); novel-token count is
    bounded by the batch vocabulary size."""
    import pyspark.sql.functions as FF

    from tests.oracle import assert_matches_oracle

    df = CQ.corpus_drift(spark, sf_dir)
    assert_matches_oracle(df, CQ.corpus_drift_oracle_sql(), sf_dir)
    tot = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(FF.col("text").isNotNull())
        .count()
    )
    agg = df.agg(FF.sum(FF.col("n_old") + FF.col("n_new"))).collect()[0][0]
    assert agg == tot


def test_term_blocklist_filter(spark, sf_dir):
    """Blocklist gate: oracle-match; keep <=> n_blocked == 0; both
    policies non-vacuous (some kept, some flagged); an empty blocklist
    keeps everything."""
    import pyspark.sql.functions as FF

    from tests.oracle import assert_matches_oracle

    df = CQ.term_blocklist_filter(spark, sf_dir)
    assert_matches_oracle(df, CQ.term_blocklist_oracle_sql(), sf_dir)
    assert df.filter(FF.col("keep") != (FF.col("n_blocked") == 0)).count() == 0
    kept = df.filter("keep").count()
    assert 0 < kept < df.count()
    all_kept = CQ.term_blocklist_filter(spark, sf_dir, terms=("zzz-not-a-word",))
    assert all_kept.filter("NOT keep").count() == 0
