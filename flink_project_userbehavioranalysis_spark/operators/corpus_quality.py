"""Corpus-level quality/safety operators for LLM training-data
pipelines: repetition metrics, benchmark-contamination detection, and
greedy sequence packing.

No reference analog (SURVEY §2.10 extension pillar) — these are the
filters every large-scale pretraining pipeline runs between dedup and
tokenization:
- repetition_stats: the Gopher-style "fraction of content in the most
  repeated token / bigram" signals used to drop boilerplate and
  degenerate generations;
- contamination_check: word-shingle overlap of every training doc
  against a held-out benchmark slice — eval-set decontamination;
- pack_sequences: greedy first-overflow packing of docs into
  fixed-token-budget training sequences, preserving within-source
  document order.

100 TB posture: repetition + contamination are pure expression-level
explode/agg/join dataflows (codegen'd, partial-aggregated, equi-join
only — the benchmark shingle set is broadcast because a held-out eval
slice is small BY CONSTRUCTION, unlike a general join side).
Packing is inherently sequential PER SOURCE but embarrassingly
parallel ACROSS sources, so it runs as applyInPandas keyed by source —
state is two scalars per group, and a 100 TB corpus has millions of
source shards to spread over executors.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_project_userbehavioranalysis_spark.io import load_table

# --------------------------------------------------------- repetition stats


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals, all exact integers (ratios are for
    the caller: keeping numerators/denominators integer makes the
    oracle hash exact and thresholds auditable):

    n_tokens, n_distinct_tokens, top_token_cnt (occurrences of the
    most frequent token), n_bigrams, top_bigram_cnt. A doc where
    top_token_cnt/n_tokens is high is "the the the ..." boilerplate;
    high top_bigram_cnt/n_bigrams catches two-token loops the unigram
    signal misses.

    Dataflow: explode→count per (doc, token|bigram), max per doc —
    two partial-aggregated shuffles, joined on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    uni = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.count("*").alias("n_distinct_tokens"),
            F.max("tf").alias("top_token_cnt"),
        )
    )
    # bigrams: positions 0..size-2 (guard: sequence() descends when
    # stop < start, so 1-token docs must short-circuit to an empty
    # array). The token array is staged as a column — an outer split()
    # inside the lambda body would be inlined and re-split per position.
    tcol = F.col("toks")
    bigram_arr = F.when(
        F.size(tcol) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(tcol) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(tcol, i + 1), F.element_at(tcol, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode(bigram_arr).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("bf"))
        .groupBy("doc_id")
        .agg(F.sum("bf").alias("n_bigrams"), F.max("bf").alias("top_bigram_cnt"))
    )
    return uni.join(bi, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "top_token_cnt",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("top_bigram_cnt", F.lit(0)).alias("top_bigram_cnt"),
    )


REPETITION_STATS_SQL = """
WITH tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY 1, 2
), uni AS (
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct_tokens, max(tf) AS top_token_cnt
    FROM tf GROUP BY 1
), bf AS (
    SELECT doc_id, bigram, count(*) AS bf
    FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    )
    GROUP BY 1, 2
), bi AS (
    SELECT doc_id, CAST(sum(bf) AS BIGINT) AS n_bigrams, max(bf) AS top_bigram_cnt
    FROM bf GROUP BY 1
)
SELECT uni.doc_id, uni.n_tokens, uni.n_distinct_tokens, uni.top_token_cnt,
       COALESCE(bi.n_bigrams, 0) AS n_bigrams,
       COALESCE(bi.top_bigram_cnt, 0) AS top_bigram_cnt
FROM uni LEFT JOIN bi ON uni.doc_id = bi.doc_id
"""


# ----------------------------------------------------- contamination check


def contamination_check(
    spark: SparkSession, sf_dir: str, k: int = 8, bench_mod: int = 10
) -> DataFrame:
    """Eval-set decontamination: for every training doc, the number of
    distinct word ``k``-grams it shares with the held-out benchmark
    slice (docs where doc_id % bench_mod == 0). Rows appear only for
    contaminated docs (n_overlap ≥ 1) — the set a pipeline would drop
    or flag before training.

    The benchmark shingle set is explicitly broadcast: a held-out eval
    slice is bounded by construction (benchmarks are human-curated),
    so this is the legitimate broadcast case — the TRAINING side
    streams through map-side, no shuffle of the 100 TB corpus at all
    until the tiny contaminated remainder aggregates.
    """
    docs = load_table(spark, sf_dir, "documents")
    # token array staged as a column: an outer split() referenced inside
    # the lambda body would be inlined and re-split per shingle position
    tcol = F.col("toks")
    shingle_arr = F.when(
        F.size(tcol) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(tcol) - k),
            lambda i: F.concat_ws(" ", F.slice(tcol, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    shingles = docs.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id", F.explode(F.array_distinct(shingle_arr)).alias("shingle")
    )
    bench = (
        shingles.filter(F.col("doc_id") % bench_mod == 0).select("shingle").distinct()
    )
    train = shingles.filter(F.col("doc_id") % bench_mod != 0)
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )


def contamination_check_oracle_sql(k: int = 8, bench_mod: int = 10) -> str:
    return f"""
WITH raw AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(l) - {k - 2}),
                                 i -> array_to_string(l[i:i+{k - 1}], ' '))) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    WHERE len(l) >= {k}
), sh AS (
    SELECT DISTINCT doc_id, shingle FROM raw
), bench AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id % {bench_mod} = 0
), train AS (
    SELECT doc_id, shingle FROM sh WHERE doc_id % {bench_mod} <> 0
)
SELECT doc_id, count(*) AS n_overlap
FROM train JOIN bench USING (shingle)
GROUP BY 1
"""


# -------------------------------------------------------- sequence packing


def pack_sequences(spark: SparkSession, sf_dir: str, budget: int = 256) -> DataFrame:
    """Greedy sequence packing: within each source (in doc_id order),
    docs accumulate into a sequence until the next doc would overflow
    ``budget`` tokens, which starts the next sequence. seq_id restarts
    at 0 per source. A doc longer than the budget occupies a sequence
    alone (greedy semantics; real pipelines chunk those upstream).

    This is a sequential scan per source — not window-expressible
    (the running total RESETS on overflow, so it is not a prefix sum)
    — hence applyInPandas keyed by source: two scalars of state per
    group, parallel across the corpus's many sources. The oracle
    replays the same recurrence as a recursive CTE.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return _pack_by_source(docs, budget)


def _pack_by_source(docs: DataFrame, budget: int) -> DataFrame:
    """The packing recurrence over any (source, doc_id, n_tokens) frame
    — shared by ``pack_sequences`` (whole corpus) and ``prep_corpus``
    (cleaned subset) so both provably run identical semantics."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq, fill = 0, 0
        for t in pdf["n_tokens"]:
            if fill > 0 and fill + t > budget:
                seq, fill = seq + 1, 0
            fill += t
            seq_ids.append(seq)
        pdf["seq_id"] = seq_ids
        return pdf[["source", "doc_id", "n_tokens", "seq_id"]]

    return docs.groupBy("source").applyInPandas(
        pack, "source string, doc_id long, n_tokens int, seq_id long"
    )


def pack_sequences_oracle_sql(budget: int = 256) -> str:
    return f"""
WITH RECURSIVE d AS (
    SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
), packed AS (
    SELECT source, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS seq_id, n_tokens AS fill
    FROM d WHERE rn = 1
    UNION ALL
    SELECT d.source, d.doc_id, d.n_tokens, d.rn,
           CASE WHEN p.fill + d.n_tokens > {budget} THEN p.seq_id + 1
                ELSE p.seq_id END,
           CASE WHEN p.fill + d.n_tokens > {budget} THEN d.n_tokens
                ELSE p.fill + d.n_tokens END
    FROM d JOIN packed p ON d.source = p.source AND d.rn = p.rn + 1
)
SELECT source, doc_id, n_tokens, seq_id FROM packed
"""


# ----------------------------------------------------- end-to-end corpus prep


def prep_corpus(spark: SparkSession, sf_dir: str, budget: int = 256) -> DataFrame:
    """The WHOLE training-data prep as one dataflow: exact dedup →
    quality/language gates (``llm_text.clean_corpus_pipeline``) → greedy
    token-budget packing of the surviving docs → per-sequence manifest.
    The output is the artifact a pretraining pipeline actually ships: one
    row per packed training sequence with its source, token fill, and
    member count.

    Composition stays declarative end to end — Catalyst sees a single
    plan: scan → dedup exchange → gates → narrow id-join to recover
    source → applyInPandas packing keyed by source → per-(source, seq)
    partial-aggregated summary. At 100 TB nothing materializes between
    stages and the only Python is the per-source two-scalar packing
    state.

    Output: source, seq_id, n_docs, seq_tokens, first_doc.
    """
    from flink_project_userbehavioranalysis_spark.operators.llm_text import (
        clean_corpus_pipeline,
    )

    cleaned = clean_corpus_pipeline(spark, sf_dir).select("doc_id", "n_tokens")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    todo = cleaned.join(src, "doc_id").select("source", "doc_id", "n_tokens")
    packed = _pack_by_source(todo, budget)
    return packed.groupBy("source", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


def prep_corpus_oracle_sql(
    budget: int = 256,
    min_tokens: int = 5,
    max_token_len: int = 25,
    min_distinct_ratio_pct: int = 20,
) -> str:
    return f"""
WITH RECURSIVE survivors AS (
    SELECT md5(text) AS text_md5, min(doc_id) AS doc_id
    FROM documents GROUP BY 1
), deduped AS (
    SELECT s.doc_id, d.text
    FROM survivors s JOIN documents d ON d.doc_id = s.doc_id
), gated AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           list_max(list_transform(string_split(text, ' '), t -> length(t))) AS max_token_len,
           CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                WHEN regexp_matches(text, '[àâçéèêëîïôùûü]') THEN 'fr'
                WHEN regexp_matches(text, '[áéíñóúü¿¡]') THEN 'es'
                WHEN regexp_matches(text, '[äößü]') THEN 'de'
                WHEN len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) > 0 THEN 'en'
                ELSE 'und' END AS pred_lang
    FROM deduped
), cleaned AS (
    SELECT doc_id, n_tokens FROM gated
    WHERE n_tokens >= {min_tokens}
      AND max_token_len <= {max_token_len}
      AND n_distinct_tokens * 100 >= n_tokens * {min_distinct_ratio_pct}
      AND pred_lang = 'en'
), d AS (
    SELECT dd.source, c.doc_id, c.n_tokens,
           row_number() OVER (PARTITION BY dd.source ORDER BY c.doc_id) AS rn
    FROM cleaned c JOIN documents dd ON dd.doc_id = c.doc_id
), packed AS (
    SELECT source, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS seq_id, n_tokens AS fill
    FROM d WHERE rn = 1
    UNION ALL
    SELECT d.source, d.doc_id, d.n_tokens, d.rn,
           CASE WHEN p.fill + d.n_tokens > {budget} THEN p.seq_id + 1
                ELSE p.seq_id END,
           CASE WHEN p.fill + d.n_tokens > {budget} THEN d.n_tokens
                ELSE p.fill + d.n_tokens END
    FROM d JOIN packed p ON d.source = p.source AND d.rn = p.rn + 1
)
SELECT source, seq_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       min(doc_id) AS first_doc
FROM packed GROUP BY 1, 2
"""


# ------------------------------------------------- Gopher quality filter

# Stopword probe list for the Gopher-style "natural language" gate.
# The published rule requires >= 2 distinct common stopwords per doc;
# the probe list is tiny by design (it is a presence test, not a
# lexicon) and inlined as a literal IN-list on both engines.
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in")


def gopher_quality_filter(
    spark: SparkSession,
    sf_dir: str,
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mwl_x10: int = 40,
    max_mwl_x10: int = 100,
    rep_max_pct: int = 20,
    min_distinct_pct: int = 40,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-rules document quality DECISION layer (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", appendix A1.1 heuristics):
    where ``doc_quality_stats``/``repetition_stats`` emit raw signals,
    this applies the published keep/drop gates and reports a per-rule
    verdict bitmap so a pipeline can audit WHY a doc was dropped:

    - g_count:    min_tokens <= n_tokens <= max_tokens;
    - g_wordlen:  mean word length in [min_mwl_x10, max_mwl_x10]/10
                  (integer cross-multiply: 10*sum_word_chars vs
                  bound*n_tokens — no float division anywhere);
    - g_rep:      most-frequent token covers <= rep_max_pct% of the doc
                  (Gopher's top-token repetition gate);
    - g_distinct: distinct/total token ratio >= min_distinct_pct%
                  (degenerate-generation gate);
    - g_stop:     >= min_stopwords DISTINCT probe stopwords present
                  (the "is this natural language" gate);
    - keep:       AND of all gates.

    Everything derives from ONE token-frequency relation:
    n_tokens = sum(tf), sum_word_chars = sum(tf*len(token)),
    n_distinct = count(*), top_token_cnt = max(tf), n_stop = count of
    probe hits — so the whole filter is one explode + two narrow
    partial-aggregated shuffles ((doc_id, token) tf, then the per-doc
    rollup); no join, no second pass over the text. All outputs and
    gates are exact integers (hash-stable).

    100 TB posture: the explode carries (doc_id, token) with map-side
    combine collapsing to per-doc distinct tokens before the exchange;
    the decision layer is pure post-aggregation projection. Thresholds
    are integer-scaled so the same comparison is bit-identical on any
    engine or partial-agg order.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    stats = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(F.col("tf") * F.length("token")).alias("sum_word_chars"),
        F.count("*").alias("n_distinct_tokens"),
        F.max("tf").alias("top_token_cnt"),
        F.sum(
            F.when(F.col("token").isin(*GOPHER_STOPWORDS), F.lit(1)).otherwise(0)
        ).alias("n_stopwords_present"),
    )
    n, swc = F.col("n_tokens"), F.col("sum_word_chars")
    gates = {
        "g_count": (n >= min_tokens) & (n <= max_tokens),
        "g_wordlen": (swc * 10 >= n * min_mwl_x10) & (swc * 10 <= n * max_mwl_x10),
        "g_rep": F.col("top_token_cnt") * 100 <= n * rep_max_pct,
        "g_distinct": F.col("n_distinct_tokens") * 100 >= n * min_distinct_pct,
        "g_stop": F.col("n_stopwords_present") >= min_stopwords,
    }
    out = stats.select(
        "doc_id",
        "n_tokens",
        "sum_word_chars",
        "n_distinct_tokens",
        "top_token_cnt",
        "n_stopwords_present",
        *[g.cast("int").alias(name) for name, g in gates.items()],
    )
    # keep is built from the emitted int columns so the audit bitmap
    # and the decision can never disagree
    keep = None
    for name in gates:
        cond = F.col(name) == 1
        keep = cond if keep is None else keep & cond
    return out.withColumn("keep", keep.cast("int"))


def gopher_quality_filter_oracle_sql(
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mwl_x10: int = 40,
    max_mwl_x10: int = 100,
    rep_max_pct: int = 20,
    min_distinct_pct: int = 40,
    min_stopwords: int = 2,
) -> str:
    stop = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
WITH tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE text IS NOT NULL)
    GROUP BY 1, 2
), s AS (
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(tf * len(token)) AS BIGINT) AS sum_word_chars,
           count(*) AS n_distinct_tokens,
           max(tf) AS top_token_cnt,
           CAST(sum(CASE WHEN token IN ({stop}) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stopwords_present
    FROM tf GROUP BY 1
), g AS (
    SELECT *,
        CAST(n_tokens >= {min_tokens} AND n_tokens <= {max_tokens} AS INT) AS g_count,
        CAST(sum_word_chars * 10 >= n_tokens * {min_mwl_x10}
             AND sum_word_chars * 10 <= n_tokens * {max_mwl_x10} AS INT) AS g_wordlen,
        CAST(top_token_cnt * 100 <= n_tokens * {rep_max_pct} AS INT) AS g_rep,
        CAST(n_distinct_tokens * 100 >= n_tokens * {min_distinct_pct} AS INT) AS g_distinct,
        CAST(n_stopwords_present >= {min_stopwords} AS INT) AS g_stop
    FROM s
)
SELECT doc_id, n_tokens, sum_word_chars, n_distinct_tokens, top_token_cnt,
       n_stopwords_present, g_count, g_wordlen, g_rep, g_distinct, g_stop,
       CAST(g_count = 1 AND g_wordlen = 1 AND g_rep = 1 AND g_distinct = 1
            AND g_stop = 1 AS INT) AS keep
FROM g
"""


def gopher_quality_projection(
    docs: DataFrame,
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mwl_x10: int = 40,
    max_mwl_x10: int = 100,
    rep_max_pct: int = 20,
    min_distinct_pct: int = 40,
    min_stopwords: int = 2,
) -> DataFrame:
    """MAP-ONLY formulation of ``gopher_quality_filter`` — identical
    output contract, zero shuffle: every signal comes from array
    higher-order functions over the per-row token array instead of the
    explode→groupBy rollup. This is the form a STATELESS streaming
    quality gate runs at ingest (each document arrives whole, so no
    cross-row state exists by construction), and the row-local batch
    fast path for short/medium documents.

    top_token_cnt uses the sorted-run trick: array_sort the tokens,
    then one aggregate() pass tracking (prev, run, best) — O(d log d)
    per row vs the explode form's shuffle. Trade-off vs the groupBy
    formulation: per-row cost grows with document length, so for
    million-token documents at 100 TB prefer ``gopher_quality_filter``
    (explode + partial agg); for feed-speed short docs this one runs
    at scan rate.

    Both formulations emit bit-identical integers (same oracle SQL) —
    asserted in tests/test_corpus_quality.py.
    """
    staged = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    run_state = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def run_step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    stats = staged.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.aggregate(
            F.transform("toks", F.length), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_word_chars"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_tokens"),
        F.aggregate(
            F.array_sort("toks"), run_state, run_step, lambda acc: acc["best"]
        )
        .cast("long")
        .alias("top_token_cnt"),
        F.size(
            F.array_intersect(
                F.array_distinct("toks"), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
            )
        )
        .cast("long")
        .alias("n_stopwords_present"),
    )
    n, swc = F.col("n_tokens"), F.col("sum_word_chars")
    gates = {
        "g_count": (n >= min_tokens) & (n <= max_tokens),
        "g_wordlen": (swc * 10 >= n * min_mwl_x10) & (swc * 10 <= n * max_mwl_x10),
        "g_rep": F.col("top_token_cnt") * 100 <= n * rep_max_pct,
        "g_distinct": F.col("n_distinct_tokens") * 100 >= n * min_distinct_pct,
        "g_stop": F.col("n_stopwords_present") >= min_stopwords,
    }
    out = stats.select(
        "doc_id",
        "n_tokens",
        "sum_word_chars",
        "n_distinct_tokens",
        "top_token_cnt",
        "n_stopwords_present",
        *[g.cast("int").alias(name) for name, g in gates.items()],
    )
    keep = None
    for name in gates:
        cond = F.col(name) == 1
        keep = cond if keep is None else keep & cond
    return out.withColumn("keep", keep.cast("int"))


# --------------------------------------------------------- snapshot drift


def corpus_drift(spark: SparkSession, sf_dir: str, split_id: int = 250) -> DataFrame:
    """Snapshot drift monitor — the per-ingest health check a corpus
    pipeline runs before accepting a new crawl batch: per language,
    compare the incoming slice (doc_id ≥ ``split_id``) against the
    accepted corpus on exact-integer signals (doc counts, token
    volumes, total text bytes) plus the count of NOVEL tokens (in the
    batch's vocabulary but not the corpus's — the OOV-growth signal
    that catches encoding breakage, language misrouting, and spam
    floods before they poison a training mix). Ratios stay (num,
    denom) integer pairs downstream; nothing floats.

    Scale shape: one staged token explode feeds BOTH the volume
    rollup (partial-aggregated per (half, lang)) and the two distinct
    vocabularies; the novel-token count is a LEFT ANTI join of batch
    vocab against corpus vocab per lang (vocab cardinality, not token
    cardinality — AQE broadcasts the smaller vocab).

    Output: (lang, n_old, n_new, tok_old, tok_new, bytes_old,
    bytes_new, novel_tokens) — exact BIGINTs.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    half = F.when(F.col("doc_id") >= split_id, "new").otherwise("old")
    base = docs.select(
        "lang",
        half.alias("half"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
    )
    vol = (
        base.groupBy("lang")
        .agg(
            F.sum(F.when(F.col("half") == "old", 1).otherwise(0)).alias("n_old"),
            F.sum(F.when(F.col("half") == "new", 1).otherwise(0)).alias("n_new"),
            F.sum(F.when(F.col("half") == "old", F.col("n_tok")).otherwise(0)).alias("tok_old"),
            F.sum(F.when(F.col("half") == "new", F.col("n_tok")).otherwise(0)).alias("tok_new"),
            F.sum(F.when(F.col("half") == "old", F.col("n_bytes")).otherwise(0)).alias("bytes_old"),
            F.sum(F.when(F.col("half") == "new", F.col("n_bytes")).otherwise(0)).alias("bytes_new"),
        )
    )
    toks = docs.select(
        "lang", half.alias("half"), F.explode(F.split("text", " ")).alias("tok")
    )
    vocab_old = toks.filter(F.col("half") == "old").select("lang", "tok").distinct()
    vocab_new = toks.filter(F.col("half") == "new").select("lang", "tok").distinct()
    novel = (
        vocab_new.join(vocab_old, ["lang", "tok"], "left_anti")
        .groupBy("lang")
        .agg(F.count("*").alias("novel_tokens"))
    )
    return (
        vol.join(novel, "lang", "left")
        .select(
            "lang", "n_old", "n_new", "tok_old", "tok_new",
            "bytes_old", "bytes_new",
            F.coalesce("novel_tokens", F.lit(0)).alias("novel_tokens"),
        )
    )


def corpus_drift_oracle_sql(split_id: int = 250) -> str:
    return f"""
WITH d AS (
    SELECT lang,
           CASE WHEN doc_id >= {split_id} THEN 'new' ELSE 'old' END AS half,
           text,
           len(string_split(text, ' ')) AS n_tok,
           octet_length(CAST(text AS BLOB)) AS n_bytes
    FROM documents WHERE text IS NOT NULL
), vol AS (
    SELECT lang,
           CAST(sum(CASE WHEN half = 'old' THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
           CAST(sum(CASE WHEN half = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN half = 'old' THEN n_tok ELSE 0 END) AS BIGINT) AS tok_old,
           CAST(sum(CASE WHEN half = 'new' THEN n_tok ELSE 0 END) AS BIGINT) AS tok_new,
           CAST(sum(CASE WHEN half = 'old' THEN n_bytes ELSE 0 END) AS BIGINT) AS bytes_old,
           CAST(sum(CASE WHEN half = 'new' THEN n_bytes ELSE 0 END) AS BIGINT) AS bytes_new
    FROM d GROUP BY 1
), vo AS (
    SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tok
    FROM d WHERE half = 'old'
), vn AS (
    SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tok
    FROM d WHERE half = 'new'
), novel AS (
    SELECT vn.lang, CAST(count(*) AS BIGINT) AS novel_tokens
    FROM vn LEFT JOIN vo ON vn.lang = vo.lang AND vn.tok = vo.tok
    WHERE vo.tok IS NULL
    GROUP BY 1
)
SELECT vol.lang, n_old, n_new, tok_old, tok_new, bytes_old, bytes_new,
       coalesce(novel.novel_tokens, 0) AS novel_tokens
FROM vol LEFT JOIN novel ON vol.lang = novel.lang
"""


# --------------------------------------------------------- term blocklist

# Deterministic stand-in blocklist (words present in the synthetic
# corpus so the gate is non-vacuous). Production swaps in the real
# list (e.g. the public C4 "badwords" list) — the dataflow is the
# same broadcast join either way.
BLOCKLIST_TERMS = ("slow", "fail", "error")


def term_blocklist_filter(
    spark: SparkSession, sf_dir: str, terms: tuple = BLOCKLIST_TERMS
) -> DataFrame:
    """Term-blocklist document gate — the C4-style first-pass safety
    filter every public corpus pipeline runs (C4 dropped any page
    containing a listed word; refined pipelines keep the doc but
    record counts for a threshold policy). Emits one row per doc with
    the exact blocklisted-token count and the keep decision, so both
    policies (drop-any vs threshold) read off the same output.

    Scale shape: the blocklist is a broadcast in-list by construction
    (wordlists are KBs); matching is a single map-only pass — tokens
    explode per doc and hit the broadcast set, then ONE
    partial-aggregated per-doc count shuffle. No text ever rides the
    shuffle (only doc_id + int).

    Output: (doc_id, n_blocked, keep) — exact ints/boolean.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    hits = (
        tok.withColumn("hit", F.when(F.col("tok").isin(*terms), 1).otherwise(0))
        .groupBy("doc_id")
        .agg(F.sum("hit").cast("long").alias("n_blocked"))
    )
    return hits.select("doc_id", "n_blocked", (F.col("n_blocked") == 0).alias("keep"))


def term_blocklist_oracle_sql(terms: tuple = BLOCKLIST_TERMS) -> str:
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
SELECT doc_id,
       CAST(count(*) FILTER (WHERE tok IN ({inlist})) AS BIGINT) AS n_blocked,
       count(*) FILTER (WHERE tok IN ({inlist})) = 0 AS keep
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL)
GROUP BY 1
"""
