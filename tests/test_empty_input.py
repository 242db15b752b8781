"""Empty-input robustness: every batch operator family must run (and
return zero rows) on structurally-valid but empty tables.

At 100 TB this is the "new partition / fresh day / filtered-to-nothing
tenant" path — an operator that throws on empty input takes down a
whole pipeline run. Empty frames exercise real edge code: pandas
iterators that never yield, array aggregations over nothing, window
functions on empty partitions, joins with an empty build side.
"""

import pytest

from flink_project_userbehavioranalysis_spark.io import TABLES, load_table
from flink_project_userbehavioranalysis_spark.operators import (
    behavior as BX,
    corpus_quality as CQ,
    custom_joins as CJ,
    embeddings_ops as EMB,
    graph as GR,
    hot_items as H,
    llm_text as TXT,
    login as L,
    maintenance as MT,
    market as M,
    multimodal as MM,
    network_flow as NF,
    order_pay as OP,
    relational as R,
    search as SRCH,
    similarity as SIM,
    skew as SK,
    timeseries as TS,
    tpch as TP,
)


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    """Schema-identical, zero-row copy of every testdata table."""
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(0).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


OPERATORS = [
    H.hot_items,
    H.hot_items_direct,
    H.hot_items_report,
    NF.pv_hourly,
    NF.uv_hourly,
    NF.uv_approx_hourly,
    NF.uv_daily_sketch_rollup,
    NF.hot_pages_topn,
    NF.item_freq_sketch,
    M.count_by_channel_behavior,
    M.marketing_total,
    M.ad_clicks_by_geo,
    M.blacklist,
    L.consec_fail,
    L.consec_fail_triple,
    OP.order_timeout,
    OP.order_pay_matched,
    OP.interval_join,
    OP.tx_reconcile,
    TXT.dedup_exact_docs,
    TXT.dedup_exact_events,
    TXT.token_counts,
    TXT.doc_quality_stats,
    TXT.lang_stats,
    TXT.tfidf_top_term,
    TXT.doc_fingerprint,
    TXT.lang_id_rules,
    TXT.lang_id_naive_bayes,
    TXT.clean_corpus_pipeline,
    TXT.stratified_sample,
    TXT.doc_entropy,
    SIM.knn_topk,
    SIM.ann_lsh_topk,
    SIM.ivf_topk,
    SIM.cosine_dup_pairs,
    SIM.cosine_dup_pairs_lsh,
    SIM.near_dup_clusters,
    SIM.ngram_jaccard_pairs,
    SIM.minhash_near_dup,
    SIM.simhash64,
    SIM.simhash_near_dup,
    R.tpch_q1ish,
    R.user_set_ops,
    R.user_sessions,
    R.regex_extract_props,
    R.date_roundtrip,
    R.pv_rollup,
    R.behavior_pivot,
    R.value_percentiles,
    R.value_percentiles_approx,
    MM.binary_features,
    MM.geomean_by_type,
    MM.decode_meta_table,
    MM.frame_sample,
    SK.salted_count_by_channel,
    SK.revenue_by_priority_salted,
    CJ.asof_last_click,
    CJ.range_join_tiers,
    CQ.repetition_stats,
    CQ.contamination_check,
    CQ.pack_sequences,
    CQ.prep_corpus,
    TXT.pii_scrub,
    TXT.vocab_coverage,
    EMB.embedding_centroids,
    EMB.quantize_embeddings,
    EMB.lang_centroids,
    EMB.embedding_pca,
    CQ.gopher_quality_filter,
    R.tpch_q3ish,
    R.tpch_q18ish,
    R.tpch_q13ish,
    GR.item_pagerank,
    GR.item_next_topk,
    MT.mv_pv_hourly_maintain,
    MT.compact_roundtrip,
    TXT.corpus_shuffle_order,
    TXT.bigram_lm_score,
    TP.tpch_q4ish,
    TP.tpch_q7ish,
    TP.tpch_q8ish,
    TP.tpch_q10ish,
    TP.tpch_q12ish,
    TP.tpch_q15ish,
    TP.tpch_q21ish,
    TP.tpch_q22ish,
    # r7 additions
    TP.tpch_q9ish,
    TP.tpch_q2ish,
    TP.tpch_q11ish,
    TP.tpch_q16ish,
    TP.tpch_q20ish,
    TXT.quality_weighted_sample,
    R.user_tier_scd2,
    R.events_with_tier_asof,
    SIM.cluster_canonical,
    MT.erase_users_roundtrip,
    NF.uv_trailing_sketch,
    BX.user_trailing_features,
    BX.negative_sample_pairs,
    # r8 additions
    M.count_by_channel_report,
    MT.user_tier_scd2_maintain,
    MT.cdc_apply,
    MT.jsonl_roundtrip,
    GR.item_triangles,
    TXT.eval_holdout_sample,
    TXT.dup_spans,
    TXT.dup_span_scrub,
    TXT.dup_span_incremental,
    NF.active_users_trailing,
    CQ.corpus_drift,
    SIM.near_dup_clusters_incremental,
    # r9: audio/video/resize multimodal surfaces
    MM.audio_features,
    MM.video_frames,
    MM.thumbnail,
    # r9: JPEG codec surfaces + mergeable quantile summaries
    MM.jpeg_meta,
    MM.jpeg_roundtrip,
    NF.value_hist_daily,
    NF.value_percentiles_hist,
    NF.value_percentiles_ddsketch,
    MM.decode_meta_mixed3,
    # r12: the search pillar (previously uncovered here) — including
    # the maintained-index probes, whose empty-split-side hazard the
    # r11 advisory flagged (now guarded by declared-schema reads)
    SRCH.fts_topk,
    SRCH.fts_topk_indexed,
    SRCH.fts_topk_maintained,
    SRCH.fts_topk_any,
    SRCH.fts_prefix_topk,
    SRCH.fts_fuzzy_topk,
    SRCH.hybrid_topk,
    SRCH.hybrid_topk_indexed,
    SRCH.phrase_search,
    SRCH.search_snippets,
    SRCH.term_associations,
    SRCH.bm25_topk,
    SRCH.edit_dup_pairs,
    SRCH.term_stats_maintain,
    # r12: persisted-ANN probes over an empty corpus (empty model
    # tables + empty cell-partitioned lists read under the declared
    # schema)
    SIM.ivf_topk_indexed,
    SIM.pq_topk_indexed,
    SIM.ivf_probe_topk,
    SIM.ivf_probe_topk_maintained,
    SIM.ann_overlay_drift,
    SIM.pq_topk,
    SIM.semantic_dedup,
    # r12b: index-lifecycle compaction verbs + retrain audit (emits
    # zero rows on an empty corpus by contract), time-series tier
    # (empty hourly fold => empty grid spine => empty fills), TextRank
    SRCH.fts_topk_compacted,
    SRCH.fts_topk_diverse,
    SIM.ivf_probe_topk_compacted,
    SIM.ann_retrain_roundtrip,
    TS.ts_ohlc_hourly,
    TS.ts_gapfill_locf,
    TS.ts_gapfill_interp,
    TS.ts_seasonal_naive,
    GR.keyphrase_textrank,
]


@pytest.mark.parametrize("op", OPERATORS, ids=lambda f: f.__name__)
def test_operator_handles_empty_input(spark, empty_dir, op):
    assert op(spark, empty_dir).count() == 0


def test_global_agg_returns_single_zero_row_on_empty(spark, empty_dir):
    # a GLOBAL aggregate legitimately emits one row on empty input
    # (count 0, sum NULL) — same as the SQL oracle
    rows = R.tpch_q6ish(spark, empty_dir).collect()
    assert len(rows) == 1 and rows[0]["n_lines"] == 0
    # wave-2 global aggregates: one row, NULL value (same as SQL)
    for op, col in (
        (TP.tpch_q14ish, "promo_revenue_pct"),
        (TP.tpch_q17ish, "avg_yearly"),
        (TP.tpch_q19ish, "revenue"),
    ):
        rows = op(spark, empty_dir).collect()
        assert len(rows) == 1 and rows[0][col] is None
