"""Scale smoke — measured evidence that the plans survive a scale-up.

Synthesizes a FACTOR× copy of the three scalable tables (events ×3F,
documents ×F, embeddings ×F) in /tmp with shifted keys/timestamps and
slightly perturbed vectors (so dedup clusters, windows, users, and
ANN buckets all genuinely grow), then times a representative operator
set on both sf0.1 and the synthesized dir in one warm session and
prints per-query wall times + the scale ratio. Every scale-side plan
is asserted cartesian-free.

Usage:  python tools/scale_smoke.py [factor]     # default 10
Writes: one JSON line (machine) after a human table; SCALE.md records
        a captured run.

Excluded by design: `knn_topk` (the declared bounded-corpus brute
baseline — quadratic scoring memory is the exact thing the ANN paths
exist to avoid) and `minhash_near_dup`/`ngram_jaccard_pairs` (the
synthetic corpus's 31-word vocabulary makes every 3-shingle a hub at
50k+ docs; real Zipfian corpora cap stop-shingles, documented in the
operator).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F

import __spark_entry__ as entry_mod
from flink_project_userbehavioranalysis_spark import get_spark
from flink_project_userbehavioranalysis_spark.io import TABLES, cache_events, load_table

BASE = "/root/testdata/sf0.1"

QUERIES = [
    "hot_items_topn",
    "hot_items_topn_direct",
    "pv_hourly",
    "uv_hourly",
    "count_by_channel_behavior",
    "order_timeout",
    "tx_reconcile",
    "user_sessions",
    "session_paths_topk",
    "dwell_gaps",
    "ad_attribution",
    "rfm_segments",
    "co_purchase_pairs",
    "pv_anomaly",
    "dedup_exact_events",
    "clean_corpus",
    "token_counts",
    "tfidf_top_term",
    "doc_entropy",
    "stratified_sample",
    "simhash64",
    "ann_lsh_topk",
    "cosine_dup_pairs_lsh",
    "pii_scrub",
    "vocab_coverage",
    "embedding_centroids",
    "quantize_embeddings",
    # r6 additions: the iterative/capped/lifecycle operators
    "kmeans_lloyd",
    "bpe_train",
    "bpe_encode",
    "co_purchase_pairs_capped",
    # r6 additions: graph + quality-decision + PCA + relational breadth
    "item_pagerank",
    "item_next_topk",
    "gopher_quality_filter",
    "embedding_pca",
    # r7 additions: trailing features, sampling, sketch fan-out
    "user_trailing_features",
    "quality_weighted_sample",
    "negative_sample_pairs",
    "uv_trailing_sketch",
    # r7 additions: exact-substring span dedup family
    "dup_spans",
    "dup_span_scrub",
    "dup_span_incremental",
    # r8 additions: CDC compaction, oriented triangles, fixed-K holdout,
    # BMP decode
    "cdc_apply",
    "item_triangles",
    "eval_holdout_sample",
    "decode_meta",
    # r9 additions: blocklist gate, exact retention, mixed BMP/PNG codec
    "term_blocklist",
    "retention_rolling",
    "frame_sample",
    # r9 additions: lossy JPEG encode+decode roundtrip (map-only);
    # mergeable quantile grid (events absorbed map-side into the
    # bounded histogram — the summary-vs-raw scaling story)
    "jpeg_roundtrip",
    "value_percentiles_hist",
    # r10 additions: color 4:2:0 JPEG roundtrip + the four-encoding
    # dispatch (both map-only Arrow passes) and the DDSketch log-gamma
    # summary (same summary-grain scaling story as the fixed grid)
    "jpeg_color_roundtrip",
    "decode_meta_mixed4",
    "value_percentiles_ddsketch",
    # late-r10 additions: search pillar (postings probe / positional
    # votes / PassJoin pigeonhole segments / dictionary merge) and the
    # compressed A/V codecs (all map-only Arrow passes)
    "fts_topk",
    "phrase_search",
    "edit_dup_pairs",
    "term_stats_maintain",
    "audio_features_mulaw",
    "audio_features_alaw",
    "adpcm_roundtrip",
    "video_frames_mjpeg",
    # r12b additions: time-series tier (OHLC = bounded bars per
    # (type, hour) — output grows with the TIME RANGE, not rows: the
    # k-hour copy shift widens the range by 3·factor hours on a 720 h
    # base, so ×10 ⇒ ~1.04× output; the two gap-fills run on the grid
    # after ONE raw-scan fold — the dense-grid boundedness claim as a
    # measured ratio) and TextRank (corpus touched once, iterations
    # vocabulary-sized — flat output, near-flat time)
    "ts_ohlc_hourly",
    "ts_gapfill_locf",
    "ts_gapfill_interp",
    "ts_seasonal_naive",
    "keyphrase_textrank",
]
# tpch_q3ish/q6ish are NOT in the smoke: synthesize() scales events/
# documents/embeddings only, so a lineitem query would report a flat
# ratio that reads as scaling evidence without being one.
# ingest_accept_batch / near_dup_clusters_incremental are NOT in the
# main QUERIES sweep for the same reason as minhash_near_dup/
# ngram_jaccard_pairs (module docstring): both embed the shingle
# near-dup stage, and the synthetic 31-word vocabulary turns every
# 3-shingle into a hub at 50k+ docs — a corpus artifact, not a plan
# property. Their component probes (dedup/dup_span_incremental,
# banded LSH) are smoked individually; the composition adds only
# already-smoked stages. The admission pipeline's OWN scaling claim —
# probe cost ∝ batch when the CORPUS grows — is measured by the
# dedicated ingest_probe_scaling section below, on a corpus-growth
# fixture built to avoid the hub artifact (scrambled word order, so
# grown corpus docs share almost no shingles with the batch).


def synthesize(spark, factor: int) -> str:
    out = f"/tmp/ubx-scale-f{factor}"
    if os.path.isdir(out) and os.path.exists(f"{out}/.done"):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in TABLES:
        if t not in ("events", "documents", "embeddings"):
            shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")

    from pyspark.sql.types import LongType

    ks = F.explode(F.sequence(F.lit(0), F.lit(3 * factor - 1))).alias("k")
    ev = load_table(spark, BASE, "events")
    # shift each copy by k hours so the window count grows too; the
    # shift expression adapts to BIGINT-nanos vs native-timestamp ts
    shifted_ts = (
        (F.col("ts") + F.col("k") * F.lit(3600 * 10**9))
        if isinstance(ev.schema["ts"].dataType, LongType)
        else F.expr("timestampadd(HOUR, k, ts)")
    )
    (
        ev.select("*", ks)
        .select(
            (F.col("event_id") + F.col("k") * F.lit(10**10)).alias("event_id"),
            shifted_ts.alias("ts"),
            (F.col("user_id") + F.col("k") * F.lit(10**6)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    ks_d = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k")
    docs = load_table(spark, BASE, "documents")
    (
        docs.select("*", ks_d)
        .select(
            (F.col("doc_id") + F.col("k") * F.lit(10**7)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    emb = load_table(spark, BASE, "embeddings")
    (
        emb.select("*", ks_d)
        .select(
            (F.col("vec_id") + F.col("k") * F.lit(10**7)).alias("vec_id"),
            # perturb each copy so vectors are distinct (no degenerate
            # cosine-1 twins) while staying in the same neighborhoods
            F.transform(
                "embedding", lambda x: x + (F.col("k") % 16).cast("float") * F.lit(0.003)
            ).alias("embedding"),
            "label",
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    open(f"{out}/.done", "w").write("ok")
    return out


def median_time(fn, runs=3):
    fn()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


#: Admission-probe experiment split: batch = the LAST 500 docs of
#: sf0.1 (fixed), corpus = the 4500 below it (grown ×factor). The
#: registry default (split 250) models a big backfill batch against a
#: young corpus; the scaling claim is about the steady state — small
#: daily batch, large corpus — so the experiment uses that shape.
INGEST_PROBE_SPLIT = 4500


def synthesize_corpus_growth(spark, factor: int, split: int) -> str:
    """Corpus-growth fixture for the admission-probe claim: the BATCH
    (doc_id >= split) is copied once, unchanged; the CORPUS half
    (doc_id < split) gets ``factor - 1`` extra copies at negative id
    shifts (still < split, so they all land corpus-side) whose every
    token is suffixed with the copy number — a copy-private
    VOCABULARY. That keeps the grown rows structurally identical
    (same lengths, same per-doc shingle/gram counts — the indexes
    genuinely grow ×factor) while sharing no tokens with the batch:
    no fingerprint collisions (the corpus stays exact-dup-free, which
    the admission pipeline itself guarantees in production), no
    shingle/gram matches, and — critically — no RANDOM trigram
    collisions from the synthetic corpus's 31-word vocabulary (the
    hub artifact the module docstring documents; a word-order
    scramble alone reintroduces it at 100x, because random trigrams
    over 31 words collide constantly). Real corpus growth is
    mostly-unrelated documents; this models exactly that."""
    out = f"/tmp/ubx-ingest-scale-f{factor}-s{split}"
    if os.path.isdir(out) and os.path.exists(f"{out}/.done"):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    docs = load_table(spark, BASE, "documents")
    corpus = docs.filter(F.col("doc_id") < split)
    ks = F.explode(F.sequence(F.lit(1), F.lit(factor - 1))).alias("k")
    suffixed = F.array_join(
        F.transform(
            F.split("text", " "),
            lambda w: F.concat_ws("_", w, F.col("k").cast("string")),
        ),
        " ",
    )
    copies = corpus.select("*", ks).select(
        (F.col("doc_id") - F.col("k") * F.lit(10**6)).alias("doc_id"),
        F.when(F.col("text").isNotNull(), suffixed).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    docs.unionByName(copies).repartition(16).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    open(f"{out}/.done", "w").write("ok")
    return out


def ingest_probe_scaling(spark, factor: int) -> dict:
    """Measure the admission pipeline's signature claim: with the
    batch FIXED (500 docs) and the corpus grown ×factor (4500 →
    45,000), the persisted-index form (ingest_accept_batch_indexed —
    the production shape; the nightly index build is untimed, exactly
    as in production) should stay near-flat, while the derive-in-query
    form (ingest_accept_batch) grows with the corpus it re-derives.
    Prints both ratios and returns them for the JSON line."""
    from flink_project_userbehavioranalysis_spark.operators import ingest as I

    split = INGEST_PROBE_SPLIT
    grown = synthesize_corpus_growth(spark, factor, split)
    out: dict = {}
    for name, fn in (
        ("ingest_accept_batch_indexed", I.ingest_accept_batch_indexed),
        ("ingest_accept_batch", I.ingest_accept_batch),
    ):
        times = {}
        for tag, d in (("base", BASE), (f"x{factor}", grown)):
            if name.endswith("_indexed"):
                # nightly build, untimed (memoized across runs)
                I.build_ingest_indexes(spark, d, split_id=split)

            def run(dd=d):
                I._MANIFEST_CACHE.clear()  # full probe per run
                fn(spark, dd, split_id=split).collect()

            times[tag] = median_time(run, runs=3)
        ratio = times[f"x{factor}"] / times["base"]
        out[name] = {
            "base_sec": round(times["base"], 3),
            "scale_sec": round(times[f"x{factor}"], 3),
            "time_ratio": round(ratio, 2),
        }
        print(
            f"{name:<28}{times['base']*1000:>10.1f}"
            f"{times[f'x{factor}']*1000:>10.1f}{ratio:>8.2f}"
            f"{'(corpus x' + str(factor) + ', batch fixed)':>28}"
        )
    return out


def synthesize_embeddings_growth(spark, factor: int) -> str:
    """Embeddings-only corpus-growth fixture for the ANN probe claim:
    the base 20k vectors stay at their ids (the fixed query set lives
    among them), plus ``factor - 1`` perturbed copies at high id
    shifts — the index side genuinely grows ×factor while the query
    set never changes. Other tables copied untouched so load_table
    keeps working."""
    out = f"/tmp/ubx-ann-scale-f{factor}"
    if os.path.isdir(out) and os.path.exists(f"{out}/.done"):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    emb = load_table(spark, BASE, "embeddings")
    ks = F.explode(F.sequence(F.lit(1), F.lit(factor - 1))).alias("k")
    copies = emb.select("*", ks).select(
        (F.col("vec_id") + F.col("k") * F.lit(10**7)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: x + (F.col("k") % 16).cast("float") * F.lit(0.003),
        ).alias("embedding"),
        "label",
    )
    # range-cluster on vec_id (the realistic id-ordered ingest layout)
    # so the fixed query batch's vec_id<100 scan prunes to one file via
    # parquet row-group stats instead of decoding the whole grown table
    emb.unionByName(copies).repartitionByRange(32, "vec_id").sortWithinPartitions(
        "vec_id"
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    open(f"{out}/.done", "w").write("ok")
    return out


#: Fixed ANN probe query batch (vec_id < 10 — ids present at every
#: factor). Small by design: the corpus-independence property needs
#: n_cells ≥ batch·n_probe (once every probed list is distinct, probe
#: I/O = batch·n_probe·cell_size, constant under corpus growth with
#: the cells∝corpus discipline) — 10 queries × 16 probes = 160 lists,
#: below the 320 cells of the ×10 point.
ANN_PROBE_QUERIES = 10


def ann_probe_scaling(spark, factors: list[int]) -> dict:
    """Measure the persisted-ANN-index claim across corpus sizes: with
    the QUERY BATCH FIXED and cells ∝ corpus (the IVF discipline —
    constant expected cell size), the production probe
    (`ivf_probe_topk`: driver-side probed cells ⇒ partition-pruned
    IVF-Flat list scan; nightly `build_ann_index` untimed, exactly as
    in production) reads batch·n_probe·cell_size rows REGARDLESS of
    corpus size once n_cells ≥ batch·n_probe — the ×10→×100 leg should
    be near-FLAT — while the derive-in-query form (`ivf_topk`)
    re-encodes the whole corpus per run and grows with it throughout.
    FULL invocation per timed run (the ingest_probe_scaling contract):
    re-collecting one prebuilt DataFrame reuses its shuffle files,
    which would silently exclude the corpus encode from the
    derive-in-query side — exactly the cost this experiment exposes."""
    from flink_project_userbehavioranalysis_spark.operators import similarity as S

    dirs = [("x1", BASE, 32)] + [
        (f"x{f}", synthesize_embeddings_growth(spark, f), min(32 * f, 4096))
        for f in factors
    ]
    out: dict = {}

    def probe_fn(spark_, d, n_cells, n_queries):
        return S.ivf_probe_topk(spark_, d, n_queries=n_queries, n_cells=n_cells)

    for name, fn in (("ivf_probe_topk", probe_fn), ("ivf_topk", S.ivf_topk)):
        times = {}
        for tag, d, nc in dirs:
            if name == "ivf_probe_topk":
                S.build_ann_index(spark, d, n_cells=nc)  # nightly, untimed
            plan = (
                fn(spark, d, n_cells=nc, n_queries=ANN_PROBE_QUERIES)
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "CartesianProduct" not in plan, name
            times[tag] = median_time(
                lambda f=fn, dd=d, n=nc: f(
                    spark, dd, n_cells=n, n_queries=ANN_PROBE_QUERIES
                ).collect(),
                runs=3,
            )
        out[name] = {tag: round(t, 3) for tag, t in times.items()}
        row = "".join(f"{t*1000:>12.1f}" for t in times.values())
        print(f"{name:<28}{row}   (batch={ANN_PROBE_QUERIES} fixed, cells ∝ corpus)")
    return out


#: Fixed ingest-batch size for the overlay-commit experiment (vec_id
#: < 4000 — ids present at every factor, so the committed batch is
#: IDENTICAL while the corpus behind the frozen models grows).
ANN_COMMIT_BATCH = 4000


def ann_commit_scaling(spark, factors: list[int]) -> dict:
    """Measure the maintained-ANN claim (r12): the OVERLAY COMMIT —
    encode a FIXED ingest batch against the frozen models and write it
    cell-partitioned — costs ∝ batch regardless of corpus size, while
    the rebuild alternative re-encodes the whole corpus and grows with
    it. Model training (the nightly job) is untimed for both, exactly
    as in production; the contrast is commit-vs-rebuild at the same
    frozen model."""
    from flink_project_userbehavioranalysis_spark.operators import similarity as S

    dirs = [("x1", BASE)] + [
        (f"x{f}", synthesize_embeddings_growth(spark, f)) for f in factors
    ]
    out: dict = {}
    for tag, d in dirs:
        emb = load_table(spark, d, "embeddings").select("vec_id", "embedding")
        sample = S._sample_matrix_frame(emb.filter(F.col("vec_id") % 5 != 0))
        cents = S._ivf_centroids(sample, 32)
        books = S._pq_codebooks(sample, 32, 16)
        batch = emb.filter(F.col("vec_id") < ANN_COMMIT_BATCH)

        def commit(b=batch, c=cents, bk=books, t=tag):
            S._encode_with_models(b, c, bk).write.mode("overwrite").partitionBy(
                "cell"
            ).parquet(f"/tmp/ubx-ann-commit-{t}")

        def rebuild(e=emb, c=cents, bk=books, t=tag):
            S._encode_with_models(e, c, bk).write.mode("overwrite").partitionBy(
                "cell"
            ).parquet(f"/tmp/ubx-ann-rebuild-{t}")

        out[tag] = {
            "commit_s": round(median_time(commit, runs=2), 3),
            "rebuild_s": round(median_time(rebuild, runs=2), 3),
        }
        print(
            f"ann overlay commit {tag:<6} commit={out[tag]['commit_s']:>8.2f}s"
            f"  rebuild={out[tag]['rebuild_s']:>8.2f}s"
            f"  (batch={ANN_COMMIT_BATCH} fixed)"
        )
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "ann-commit":
        # maintained-ANN overlay-commit experiment (r12):
        #   python tools/scale_smoke.py ann-commit [factor ...]  (default 10 100)
        factors = [int(a) for a in sys.argv[2:]] or [10, 100]
        spark = get_spark(
            app_name="ann-commit-scale", master="local[32]",
            shuffle_partitions=64, streaming=False,
        )
        spark.sparkContext.setLogLevel("ERROR")
        commit = ann_commit_scaling(spark, factors)
        print(json.dumps({"factors": factors, "ann_commit": commit}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ann":
        # standalone ANN probe experiment:
        #   python tools/scale_smoke.py ann [factor ...]   (default 10 100)
        factors = [int(a) for a in sys.argv[2:]] or [10, 100]
        spark = get_spark(
            app_name="ann-scale", master="local[32]", shuffle_partitions=64,
            streaming=False,
        )
        spark.sparkContext.setLogLevel("ERROR")
        hdr = "".join(f"{'x' + str(f) + ' ms':>12}" for f in [1] + factors)
        print(f"{'op':<28}{hdr}")
        probe = ann_probe_scaling(spark, factors)
        print(json.dumps({"factors": factors, "ann_probe": probe}))
        return
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(
        app_name="scale-smoke", master="local[32]", shuffle_partitions=64, streaming=False
    )
    spark.sparkContext.setLogLevel("ERROR")
    scale_dir = synthesize(spark, factor)
    cache_events(spark, BASE)
    cache_events(spark, scale_dir)
    qs = entry_mod.queries()
    print(f"{'query':<28}{'sf0.1 ms':>10}{f'x{factor} ms':>10}{'ratio':>8}{'rows x':>8}")
    results = {}
    for name in QUERIES:
        fn = qs[name]
        base_df, scale_df = fn(spark, BASE), fn(spark, scale_dir)
        plan = scale_df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        t_base = median_time(lambda: base_df.collect())
        t_scale = median_time(lambda: scale_df.collect())
        r_base, r_scale = base_df.count(), scale_df.count()
        ratio = t_scale / t_base if t_base else float("nan")
        rows_x = r_scale / r_base if r_base else float("nan")
        results[name] = {
            "base_sec": round(t_base, 3),
            "scale_sec": round(t_scale, 3),
            "time_ratio": round(ratio, 2),
            "rows_ratio": round(rows_x, 1),
        }
        print(f"{name:<28}{t_base*1000:>10.1f}{t_scale*1000:>10.1f}{ratio:>8.2f}{rows_x:>8.1f}")

    # ANN recall gate at sf0.1 (r5): the band/probe defaults must hold
    # at 20k vectors, not just the sf0.01 pytest corpus — recall ≥0.85
    # vs the exact top-5 for both scale paths.
    exact = {(r[0], r[1]) for r in qs["knn_topk"](spark, BASE).collect()}
    recalls = {}
    # pq_topk's SDC shortlist loses ~1% to the IVF candidate ceiling
    # (0.8515 measured at sf0.1 with shortlist=16) → its own 0.82 gate
    gates = {"ann_lsh_topk": 0.85, "ivf_topk": 0.85, "pq_topk": 0.82}
    for name, gate in gates.items():
        got = {(r[0], r[1]) for r in qs[name](spark, BASE).collect()}
        recalls[name] = round(len(got & exact) / len(exact), 4)
        assert recalls[name] >= gate, f"{name} recall {recalls[name]} < {gate} at sf0.1"
    # maintained-index probe (r12): frozen BASE-trained models over
    # base ∪ overlay lists — recall for its bounded query batch must
    # hold at sf0.1 too (0.8 gate: the model never saw the overlay)
    got_m = {
        (r[0], r[1])
        for r in qs["ivf_probe_topk_maintained"](spark, BASE).collect()
    }
    exact_b = {t for t in exact if t[0] < 100}
    recalls["ivf_probe_topk_maintained"] = round(
        len(got_m & exact_b) / len(exact_b), 4
    )
    assert recalls["ivf_probe_topk_maintained"] >= 0.8, recalls
    print(f"ANN recall @ sf0.1: {recalls}")

    ingest_probe = ingest_probe_scaling(spark, factor)

    print(
        json.dumps(
            {
                "factor": factor,
                "results": results,
                "ann_recall_sf01": recalls,
                "ingest_probe": ingest_probe,
            }
        )
    )


if __name__ == "__main__":
    main()
