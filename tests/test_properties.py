"""Property-based + boundary-case tests (SURVEY §5.2).

Hand-built micro-fixtures are written as parquet (same raw schema as
the driver's events table: BIGINT-nanos ts) so the real operators run
unmodified against them. Hypothesis drives the invariants the engine
must hold for *any* event stream; the explicit cases pin the window
boundary, Top-N tie-break, and horizon-edge semantics.
"""

import os

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_project_userbehavioranalysis_spark.operators import (
    hot_items as H,
    network_flow as NF,
    order_pay as OP,
)

BASE_NS = 1_699_999_200_000_000_000  # epoch ns, exactly hour-aligned
HOUR_NS = 3_600_000_000_000


def write_events(spark, path: str, rows: list[tuple]) -> str:
    """rows: (event_id, ts_ns, user_id, event_type, item_k or None)."""
    data = [
        {
            "event_id": eid,
            "ts": ts,
            "user_id": uid,
            "event_type": typ,
            "value": 1.0,
            "props": "{}" if k is None else f'{{"k": {k}}}',
        }
        for eid, ts, uid, typ, k in rows
    ]
    df = spark.createDataFrame(
        data,
        schema="event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "events.parquet"))
    return path


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 10_000),  # offset seconds within ~3 h
        st.integers(1, 5),  # user
        st.sampled_from(["view", "click", "purchase", "signup", "error"]),
        st.integers(1, 4),  # item k
    ),
    min_size=1,
    max_size=60,
)


def _materialize(spark, tmp_path, evs):
    rows = [
        (i, BASE_NS + off * 1_000_000_000, uid, typ, k)
        for i, (off, uid, typ, k) in enumerate(evs)
    ]
    return write_events(spark, str(tmp_path), rows)


@pytest.mark.slow  # 37-67 s hypothesis drive (r13 durations); --runslow runs it
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=events_strategy)
def test_pv_conservation_and_uv_bound(spark, tmp_path_factory, evs):
    """Σ per-window PV == total views; per window UV ≤ PV."""
    d = _materialize(spark, tmp_path_factory.mktemp("prop"), evs)
    pv = {r["window_end"]: r["pv"] for r in NF.pv_hourly(spark, d).collect()}
    uv = {r["window_end"]: r["uv"] for r in NF.uv_hourly(spark, d).collect()}
    n_views = sum(1 for _, _, t, _ in evs if t == "view")
    assert sum(pv.values()) == n_views
    assert set(uv) == set(pv)
    for w, u in uv.items():
        assert 1 <= u <= pv[w]


@pytest.mark.slow  # 37-67 s hypothesis drive (r13 durations); --runslow runs it
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=events_strategy)
def test_topn_is_prefix_of_full_ranking(spark, tmp_path_factory, evs):
    """hot_items top-n ⊆ the full ranking, with correct ordering."""
    d = _materialize(spark, tmp_path_factory.mktemp("prop"), evs)
    top = H.hot_items(spark, d, n=2)
    full = H.hot_items(spark, d, n=10**6)
    top_rows = {(r["window_end"], r["item_id"], r["cnt"], r["rn"]) for r in top.collect()}
    full_rows = {(r["window_end"], r["item_id"], r["cnt"], r["rn"]) for r in full.collect()}
    assert top_rows <= full_rows
    assert all(rn <= 2 for _, _, _, rn in top_rows)
    # per window: counts non-increasing with rank
    by_w = {}
    for w, _, cnt, rn in sorted(top_rows, key=lambda t: (t[0], t[3])):
        by_w.setdefault(w, []).append(cnt)
    for counts in by_w.values():
        assert counts == sorted(counts, reverse=True)


@pytest.mark.slow  # 37-67 s hypothesis drive (r13 durations); --runslow runs it
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=events_strategy)
def test_every_signup_matched_xor_timeout(spark, tmp_path_factory, evs):
    """order_timeout ∪ order_pay_matched partitions the signups."""
    d = _materialize(spark, tmp_path_factory.mktemp("prop"), evs)
    signups = sum(1 for _, _, t, _ in evs if t == "signup")
    t = OP.order_timeout(spark, d).count()
    m = OP.order_pay_matched(spark, d).count()
    assert t + m == signups


# ------------------------------------------------------------ boundary cases


def test_window_end_is_exclusive(spark, tmp_path):
    """[start, end) bucketing: a view exactly at the hour boundary
    belongs to the NEXT window."""
    d = write_events(
        spark,
        str(tmp_path),
        [
            (0, BASE_NS, 1, "view", 1),
            (1, BASE_NS + HOUR_NS - 1, 1, "view", 1),  # last ns of hour 0
            (2, BASE_NS + HOUR_NS, 1, "view", 1),  # first ns of hour 1
        ],
    )
    pv = {r["window_end"]: r["pv"] for r in NF.pv_hourly(spark, d).collect()}
    base_s = BASE_NS // 1_000_000_000
    assert pv[base_s + 3600] == 2
    assert pv[base_s + 7200] == 1


def test_topn_tie_breaks_by_item_id(spark, tmp_path):
    """Equal counts rank by item_id ascending — deterministically."""
    d = write_events(
        spark,
        str(tmp_path),
        [
            (0, BASE_NS, 1, "view", 3),
            (1, BASE_NS + 1, 2, "view", 1),
            (2, BASE_NS + 2, 3, "view", 2),
        ],
    )
    rows = H.hot_items(spark, d, n=3).filter(F.col("rn") <= 3).collect()
    first_window = min(r["window_end"] for r in rows)
    ranked = sorted(
        [(r["rn"], r["item_id"]) for r in rows if r["window_end"] == first_window]
    )
    assert ranked == [(1, 1), (2, 2), (3, 3)]


def test_order_horizon_edge_inclusive(spark, tmp_path):
    """A pay exactly at create + horizon still matches (<=), one ns
    later times out."""
    h_ns = 24 * HOUR_NS
    d = write_events(
        spark,
        str(tmp_path),
        [
            (0, BASE_NS, 1, "signup", 1),
            (1, BASE_NS + h_ns, 1, "purchase", 1),  # exactly at deadline
            (2, BASE_NS, 2, "signup", 1),
            (3, BASE_NS + h_ns + 1_000, 2, "purchase", 1),  # 1 µs past
        ],
    )
    matched = {r["user_id"] for r in OP.order_pay_matched(spark, d).collect()}
    timeout = {r["user_id"] for r in OP.order_timeout(spark, d).collect()}
    assert matched == {1}
    assert timeout == {2}


def test_consec_fail_gap_boundary(spark, tmp_path):
    """Two errors exactly gap_s apart trigger (<=); a third event
    between them breaks consecutiveness."""
    from flink_project_userbehavioranalysis_spark.operators import login as L

    gap_ns = L.GAP_SECONDS * 1_000_000_000
    d = write_events(
        spark,
        str(tmp_path),
        [
            (0, BASE_NS, 1, "error", 1),
            (1, BASE_NS + gap_ns, 1, "error", 1),  # exactly at the gap
            (2, BASE_NS, 2, "error", 1),
            (3, BASE_NS + 1_000_000_000, 2, "view", 1),  # breaks the run
            (4, BASE_NS + 2_000_000_000, 2, "error", 1),
        ],
    )
    hits = {r["user_id"] for r in L.consec_fail(spark, d).collect()}
    assert hits == {1}


@given(
    codes=st.lists(
        st.lists(st.integers(min_value=0, max_value=15), min_size=32, max_size=32),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=50, deadline=None)
def test_pq_code_packing_roundtrip(codes):
    """The PQ 4-bit code packing into two BIGINTs is lossless for every
    possible code matrix — including codes that set the sign bit of the
    packed int64 (all-15 columns in subspaces 15 and 31)."""
    import numpy as np

    from flink_project_userbehavioranalysis_spark.operators import similarity as S

    arr = np.array(codes, dtype=np.int64)
    m_sub = arr.shape[1]
    lo, hi = S._pack_codes(arr, m_sub)
    out = S._unpack_codes(lo, hi, m_sub)
    assert (out == arr).all()


@pytest.mark.slow  # 37-67 s hypothesis drive (r13 durations); --runslow runs it
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF),
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_normalize_text_idempotent_and_printable(spark, tmp_path_factory, texts):
    """normalize_text over adversarial unicode: output is always inside
    the printable-ASCII + space class with no doubled spaces or edge
    spaces, and re-normalizing is a no-op (idempotence)."""
    import pyspark.sql.functions as F

    tmp = str(tmp_path_factory.mktemp("normdocs"))
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    from flink_project_userbehavioranalysis_spark.operators import llm_text

    df = llm_text.normalize_text(spark, tmp)
    out = df.collect()
    for r in out:
        nt = r["norm_text"]
        assert all(" " <= c <= "~" for c in nt)
        assert "  " not in nt and nt == nt.strip()
    again = df.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("norm_text")), "[^ -~]", ""), " +", " "
            )
        ).alias("again"),
        "norm_text",
    )
    assert again.filter(F.col("again") != F.col("norm_text")).count() == 0


rfm_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3_500_000),  # offset seconds (~40 days → recency spreads)
        st.integers(1, 8),  # user
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=2,
    max_size=60,
)


@pytest.mark.slow  # 37-67 s hypothesis drive (r13 durations); --runslow runs it
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=rfm_events_strategy)
def test_rfm_matches_python_reference(spark, tmp_path_factory, evs):
    """rfm_segments ≡ an independent pure-Python implementation of the
    discrete histogram-quartile scoring, for arbitrary event streams —
    the driver oracle checks one corpus; this checks the algorithm."""
    from collections import Counter

    from flink_project_userbehavioranalysis_spark.operators import behavior as B

    d = _materialize(
        spark,
        tmp_path_factory.mktemp("rfm"),
        [(off, uid, typ, None) for off, uid, typ in evs],
    )

    # ---- reference: per-user metrics (value==1.0 per event fixture)
    last, freq = {}, Counter()
    for off, uid, typ in evs:
        last[uid] = max(last.get(uid, 0), off)
        if typ == "purchase":
            freq[uid] += 1
    mx = max(last.values())
    users = sorted(last)
    rec = {u: (mx - last[u]) // 86400 for u in users}
    mon = {u: freq[u] for u in users}  # floor(Σ 1.0) == purchase count

    def boundaries(vals):
        n = len(vals)
        cnt = Counter(vals)
        out = []
        for t in ((n + 3) // 4, (n + 1) // 2, (3 * n + 3) // 4):
            cum = 0
            for v in sorted(cnt):
                cum += cnt[v]
                if cum >= t:
                    out.append(v)
                    break
        return out

    def score(v, bs):
        return 1 + sum(1 for b in bs if v > b)

    rb = boundaries([rec[u] for u in users])
    fb = boundaries([freq[u] for u in users])
    mb = boundaries([mon[u] for u in users])
    expected = Counter(
        (5 - score(rec[u], rb), score(freq[u], fb), score(mon[u], mb)) for u in users
    )

    got = {
        (r["r_score"], r["f_score"], r["m_score"]): r["n_users"]
        for r in B.rfm_segments(spark, d).collect()
    }
    assert got == dict(expected)


docs_strategy = st.lists(
    st.lists(st.sampled_from(list("abcdef")), min_size=1, max_size=12),
    min_size=2,
    max_size=12,
)


def _write_docs(spark, tmp_path, word_lists):
    rows = [
        {"doc_id": i, "text": " ".join(ws), "lang": "en", "source": "gen"}
        for i, ws in enumerate(word_lists)
    ]
    spark.createDataFrame(
        rows, schema="doc_id BIGINT, text STRING, lang STRING, source STRING"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


@pytest.mark.slow  # 37-67 s hypothesis drive (r13 durations); --runslow runs it
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=docs_strategy)
def test_dup_span_invariants(spark, tmp_path_factory, docs):
    """ExactSubstr structural invariants on random tiny corpora (w=2):
    spans are within-doc, well-ordered, pairwise disjoint with a
    ≥1-word gap (maximality: adjacent/overlapping runs must have
    merged), each span is ≥w words, and the scrub conserves words
    exactly: n_removed per doc == total span length per doc, and
    every doc appears in the scrub output exactly once."""
    from flink_project_userbehavioranalysis_spark.operators import llm_text

    sf = _write_docs(spark, tmp_path_factory.mktemp("span_prop"), docs)
    w = 2
    n_words = {i: len(ws) for i, ws in enumerate(docs)}
    spans = sorted(
        tuple(r) for r in llm_text.dup_spans(spark, sf, w=w).collect()
    )
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for doc_id, s, e, n_dup in spans:
        assert 0 <= s <= e < n_words[doc_id]
        assert n_dup == e - s + 1 >= w
        by_doc.setdefault(doc_id, []).append((s, e))
    for doc_id, ss in by_doc.items():
        ss.sort()
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert s2 > e1 + 1  # disjoint with >=1-word gap (maximal merge)
    scrub = {r["doc_id"]: r for r in llm_text.dup_span_scrub(spark, sf, w=w).collect()}
    assert set(scrub) == set(n_words)  # every doc exactly once (total)
    for doc_id, r in scrub.items():
        assert r["n_words"] == n_words[doc_id]
        kept = [t for t in r["clean_text"].split(" ") if t != ""]
        assert len(kept) == r["n_words"] - r["n_removed"]
    # the corpus-wide FIRST occurrence rule implies at least one doc
    # keeps any globally-duplicated phrase: total removal can never
    # delete every copy of the corpus (some doc keeps its first span)
    if spans:
        assert any(r["n_removed"] < r["n_words"] for r in scrub.values()) or all(
            n == 0 for n in n_words.values()
        )


cdc_feed_strategy = st.lists(
    st.tuples(
        st.integers(0, 5_000),  # offset seconds
        st.integers(1, 6),  # user (key)
        st.sampled_from(["view", "click", "error"]),  # error = DELETE
    ),
    min_size=1,
    max_size=40,
)


@pytest.mark.slow  # 37-67 s hypothesis drive (r13 durations); --runslow runs it
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(feed=cdc_feed_strategy, split=st.integers(0, 40))
def test_cdc_compact_is_associative(spark, tmp_path_factory, feed, split):
    """The algebraic heart of per-batch CDC compaction: for ANY split
    of the feed (not just day boundaries), merging the two halves'
    compacted states equals one LWW pass over the whole feed —
    tombstones included. This is what makes running the compactor per
    ingest batch safe at 100 TB."""
    import pyspark.sql.functions as FF

    from flink_project_userbehavioranalysis_spark.operators.maintenance import (
        _cdc_compact,
    )

    rows = [
        {
            "user_id": uid,
            "ts_ns": BASE_NS + off * 1_000_000_000,
            "event_id": i,
            "value": float(i),
            "op": "D" if typ == "error" else "U",
        }
        for i, (off, uid, typ) in enumerate(feed)
    ]
    schema = "user_id BIGINT, ts_ns BIGINT, event_id BIGINT, value DOUBLE, op STRING"
    full = spark.createDataFrame(rows, schema)
    k = min(split, len(rows))
    a = spark.createDataFrame(rows[:k] or [], schema)
    b = spark.createDataFrame(rows[k:] or [], schema)
    one_pass = _cdc_compact(full)
    merged = (
        _cdc_compact(a)
        .unionByName(_cdc_compact(b))
        .groupBy("user_id")
        .agg(FF.max("last").alias("last"), FF.sum("n_changes").alias("n_changes"))
    )
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in one_pass.collect())
    assert got == want
