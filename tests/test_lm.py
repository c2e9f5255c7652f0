"""Bigram-LM perplexity scoring (operators/lm.py).

Hand-checkable corpora small enough to verify the smoothed probabilities
by hand, plus the cross-corpus backoff path the driver row (self-trained)
never exercises.
"""

import math

import pytest

from duckdb_spatial_spark.operators.lm import ngram_lm_perplexity


def _by_id(rows):
    return {r["doc_id"]: r for r in rows}


def test_self_trained_two_docs(spark):
    # corpus: "a b" and "a b" -> pairs per doc: (<s>,a),(a,b)
    # vocab (by w2 count): a:2, b:2 -> both in vocab (V=2)
    # counts: cu(<s>)=2, cu(a)=2 ; cb(<s>,a)=2, cb(a,b)=2 ; k=0.5
    # P(a|<s>) = (2+.5)/(2+.5*3) = 2.5/3.5 ; P(b|a) = 2.5/3.5
    df = spark.createDataFrame([(1, "a b"), (2, "a b")], ["doc_id", "text"])
    out = _by_id(ngram_lm_perplexity(df, vocab_size=10, add_k=0.5).collect())
    lp = round(2 * math.log(2.5 / 3.5), 6)
    assert out[1]["lm_bigrams"] == 2
    assert out[1]["lm_logprob"] == pytest.approx(lp, abs=1e-9)
    assert out[1]["lm_ppl"] == pytest.approx(round(math.exp(-lp / 2), 6), abs=1e-9)
    assert out[1]["lm_logprob"] == out[2]["lm_logprob"]


def test_vocab_cut_maps_tail_to_unk(spark):
    # "z" appears once; vocab_size=1 keeps only the most frequent token
    # ("a", ties broken by token asc) so "z" scores through <unk>
    df = spark.createDataFrame([(1, "a a z")], ["doc_id", "text"])
    out = _by_id(ngram_lm_perplexity(df, vocab_size=1, add_k=0.5).collect())
    # pairs: (<s>,a),(a,a),(a,z->unk); V=1
    # cu: <s>=1, a=2 ; cb: (<s>,a)=1, (a,a)=1, (a,<unk>)=1
    lp = round(
        math.log(1.5 / (1 + 0.5 * 2))
        + math.log(1.5 / (2 + 0.5 * 2))
        + math.log(1.5 / (2 + 0.5 * 2)),
        6,
    )
    assert out[1]["lm_logprob"] == pytest.approx(lp, abs=1e-9)


def test_cross_corpus_backoff_unseen_context(spark):
    # train on "a b"; score "c c": c -> <unk> (not in train vocab), and
    # the context <unk> never occurs in training -> cu misses ->
    # term = ln(k / (k * (V+1))) = -ln(V+1); first term (<s>,<unk>):
    # cu(<s>)=1, cb misses -> ln(.5/(1+.5*3))
    train = spark.createDataFrame([(10, "a b")], ["doc_id", "text"])
    score = spark.createDataFrame([(1, "c c")], ["doc_id", "text"])
    out = _by_id(
        ngram_lm_perplexity(score, vocab_size=10, add_k=0.5, train_df=train).collect()
    )
    lp = round(math.log(0.5 / 2.5) + math.log(1.0 / 3.0), 6)
    assert out[1]["lm_bigrams"] == 2
    assert out[1]["lm_logprob"] == pytest.approx(lp, abs=1e-9)


def test_empty_and_null_docs_drop(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None), (4, "   ")], ["doc_id", "text"]
    )
    ids = {r["doc_id"] for r in ngram_lm_perplexity(df, vocab_size=5).collect()}
    assert ids == {1}


def test_lowercase_flag(spark):
    df = spark.createDataFrame([(1, "A a")], ["doc_id", "text"])
    lc = _by_id(ngram_lm_perplexity(df, vocab_size=5, lowercase=True).collect())
    raw = _by_id(ngram_lm_perplexity(df, vocab_size=5, lowercase=False).collect())
    # lowercased: "a a" -> both pairs hit the same unigram; raw keeps "A"
    # distinct, so the scores differ
    assert lc[1]["lm_logprob"] != raw[1]["lm_logprob"]


def test_add_k_must_be_positive(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        ngram_lm_perplexity(df, add_k=0.0)
