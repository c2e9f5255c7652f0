"""DSIR importance weights (Xie et al. 2023): brute-force value parity,
broadcast-join plan shape, selection ordering."""

import math

import pytest
from pyspark.sql import functions as F

MOD = 1_000_000_007


def _bucket(s, nb, seed=7):
    h = seed + 1
    for ch in s:
        h = (h * 131 + ord(ch)) % MOD
    return ((h * h + h) % MOD) % nb


def _grams(text, nb):
    toks = text.lower().split()
    out = []
    prev = None
    for t in toks:
        out.append(_bucket(t, nb))
        if prev is not None:
            out.append(_bucket(prev + " " + t, nb))
        prev = t
    return out


def _expected(raw_docs, tgt_docs, nb, add_k):
    raw_cnt, tgt_cnt = {}, {}
    for _, txt in raw_docs:
        for b in _grams(txt, nb):
            raw_cnt[b] = raw_cnt.get(b, 0) + 1
    for _, txt in tgt_docs:
        for b in _grams(txt, nb):
            tgt_cnt[b] = tgt_cnt.get(b, 0) + 1
    R, Tt = sum(raw_cnt.values()), sum(tgt_cnt.values())
    out = {}
    for did, txt in raw_docs:
        gs = _grams(txt, nb)
        if not gs:
            continue
        s = 0.0
        for b in gs:
            s += math.log((tgt_cnt.get(b, 0) + add_k) / (Tt + add_k * nb))
            s -= math.log((raw_cnt.get(b, 0) + add_k) / (R + add_k * nb))
        out[did] = (len(gs), math.floor(s * 1e6 + 0.5) / 1e6)
    return out


def test_dsir_values_and_plan(spark):
    from duckdb_spatial_spark.operators.dsir import dsir_log_weights

    raw_docs = [
        (0, "the cat sat on the mat"),
        (1, "quantum entanglement drives the experiment"),
        (2, "the dog sat on the log"),
        (3, "stock market rally extends gains"),
        (4, ""),          # no tokens -> no row
        (5, "Entanglement Experiment Results"),  # lowercased
    ]
    tgt_docs = [
        (100, "quantum experiment measures entanglement"),
        (101, "entanglement of photon pairs in the lab experiment"),
    ]
    nb, add_k = 512, 0.5
    raw = spark.createDataFrame(raw_docs, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.dsir_grams, r.dsir_logw)
        for r in dsir_log_weights(raw, tgt, num_buckets=nb, add_k=add_k).collect()
    }
    want = _expected(raw_docs, tgt_docs, nb, add_k)
    assert set(got) == set(want)  # doc 4 dropped
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)
    # physics docs must outrank prose/finance docs against the physics target
    assert got[1][1] > got[0][1] and got[1][1] > got[3][1]
    assert got[5][1] > got[0][1]

    df = dsir_log_weights(raw, tgt, num_buckets=nb, add_k=add_k)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # model joins broadcast


def test_dsir_top_k(spark):
    from duckdb_spatial_spark.operators.dsir import dsir_top_k

    raw = spark.createDataFrame(
        [(i, "alpha beta " * (i % 3) + "gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame([(0, "alpha beta alpha beta")], "doc_id long, text string")
    top = dsir_top_k(raw, tgt, k=5).collect()
    assert len(top) == 5
    ws = [r.dsir_logw_norm for r in top]
    assert ws == sorted(ws, reverse=True)
    # per-gram normalization: docs with the highest target-gram DENSITY
    # rank first (the raw sum is length-biased by construction)
    assert all(r.doc_id % 3 != 0 for r in top)
    assert all(abs(r.dsir_logw_norm - r.dsir_logw / r.dsir_grams) < 2e-6 for r in top)


def test_dup_span_stats(spark):
    """ExactSubstr window-dup flags: brute-force parity on a corpus with
    a known shared span + a within-doc repeat."""
    from duckdb_spatial_spark.operators.dedup import dup_span_stats

    shared = "the quick brown fox"
    docs = [
        (0, f"{shared} jumps over the lazy dog"),
        (1, f"completely different text here about {shared} again"),
        (2, "unique content with no overlap whatsoever in this document"),
        (3, "rep rep rep rep rep rep rep rep"),  # within-doc repeats
        (4, "shorty"),  # fewer tokens than window -> no row
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in dup_span_stats(df, window=4, seed=5).collect()}

    def wins(t):
        toks = t.split()
        return [" ".join(toks[s:s + 4]) for s in range(len(toks) - 3)]

    from collections import Counter

    corpus = Counter(w for _, t in docs for w in wins(t))
    for did, t in docs:
        ws = wins(t)
        if not ws:
            assert did not in got
            continue
        dup = sum(1 for w in ws if corpus[w] >= 2)
        r = got[did]
        assert r.span_windows == len(ws)
        assert r.dup_windows == dup
        assert r.dup_share == dup / len(ws)
    assert got[2].dup_windows == 0
    assert got[3].dup_windows == got[3].span_windows  # all repeats
    assert got[0].dup_windows >= 1  # the shared fox span


def test_excise_dup_spans(spark):
    """ExactSubstr span removal: brute-force parity — a token dies iff
    any duplicated window covers it; overlapping windows merge; docs
    without duplicated spans come back whitespace-normalized intact."""
    from collections import Counter

    from duckdb_spatial_spark.operators.dedup import excise_dup_spans

    shared = "alpha beta gamma delta"
    docs = [
        (0, f"{shared} one two three four five"),
        (1, f"zero {shared} six seven eight nine"),
        (2, "totally unique sentence with no duplicated window at all"),
        (3, "rep rep rep rep rep rep rep rep rep"),  # self-duplicated
        (4, "tiny"),
        (5, ""),
    ]
    w = 4
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in excise_dup_spans(df, window=w, seed=5).collect()}
    # the hash-prefiltered plan must agree exactly with the text plan
    # (both decide duplication by window-text equality)
    got_hash = {
        r.doc_id: r
        for r in excise_dup_spans(df, window=w, seed=5, method="hash").collect()
    }
    for did in got:
        assert got[did] == got_hash[did], (did, got[did], got_hash[did])

    # brute-force reference
    wins = Counter()
    toks_by_id = {}
    for did, t in docs:
        toks = t.split()
        toks_by_id[did] = toks
        for s in range(max(len(toks) - w + 1, 0)):
            wins[" ".join(toks[s : s + w])] += 1
    for did, toks in toks_by_id.items():
        dead = [False] * len(toks)
        for s in range(max(len(toks) - w + 1, 0)):
            if wins[" ".join(toks[s : s + w])] >= 2:
                for t in range(s, s + w):
                    dead[t] = True
        clean = " ".join(tk for tk, d in zip(toks, dead) if not d)
        r = got[did]
        assert r.clean_text == clean, (did, r.clean_text, clean)
        assert r.n_tokens == len(toks)
        assert r.n_removed == sum(dead)
    assert got[2].n_removed == 0 and got[4].n_removed == 0 and got[5].n_tokens == 0
    assert got[3].clean_text == ""  # fully self-duplicated doc vanishes


def test_excise_auto_skew_fallback(spark):
    """r17 skew fallback: a corpus with one pathologically hot
    boilerplate span routes method="auto" to the hash plan (whose
    corpus-scale stages AQE can split); a uniform corpus stays on the
    text plan. Both methods return identical rows on the hot fixture,
    so the router can only change the plan, never the result."""
    from duckdb_spatial_spark.operators.dedup import (
        _excise_pick_method,
        excise_dup_spans,
    )

    w = 4
    boiler = "subscribe to our newsletter now"  # 5 tokens -> 2 hot windows
    hot_docs = [
        (i, f"unique{i}a unique{i}b {boiler} unique{i}c unique{i}d")
        for i in range(400)
    ]
    hot = spark.createDataFrame(hot_docs, "doc_id long, text string")
    uni_docs = [
        (i, " ".join(f"u{i}t{j}" for j in range(12))) for i in range(400)
    ]
    uni = spark.createDataFrame(uni_docs, "doc_id long, text string")

    # the sketch routes the hot corpus to hash, the uniform one to text
    assert _excise_pick_method(hot.select("doc_id", "text"), "doc_id", "text", w, 5) == "hash"
    assert _excise_pick_method(uni.select("doc_id", "text"), "doc_id", "text", w, 5) == "text"

    # the auto plan IS the hash plan on the hot corpus (fallback engaged):
    # its physical plan carries the hash lane's extra Python crossing
    # (candidate re-derivation) — 3 MapInArrow nodes vs the text plan's 2
    auto_plan = (
        excise_dup_spans(hot, window=w, seed=5, method="auto")
        ._jdf.queryExecution().executedPlan().toString()
    )
    text_plan = (
        excise_dup_spans(hot, window=w, seed=5, method="text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    hash_plan = (
        excise_dup_spans(hot, window=w, seed=5, method="hash")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_py = lambda p: p.count("MapInArrow") + p.count("MapInPandas")  # noqa: E731
    assert n_py(auto_plan) == n_py(hash_plan) != n_py(text_plan)
    assert "Window" in text_plan and "Window" not in auto_plan

    # identical rows from all three methods on the hot fixture
    got_auto = {r.doc_id: r for r in excise_dup_spans(hot, window=w, seed=5, method="auto").collect()}
    got_text = {r.doc_id: r for r in excise_dup_spans(hot, window=w, seed=5, method="text").collect()}
    got_hash = {r.doc_id: r for r in excise_dup_spans(hot, window=w, seed=5, method="hash").collect()}
    assert got_auto == got_text == got_hash
    # the boilerplate tokens died everywhere; per-doc unique filler only
    # dies where a hot window covers it
    assert all("subscribe" not in r.clean_text for r in got_auto.values())
