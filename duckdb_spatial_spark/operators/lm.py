"""Distributed n-gram language-model scoring (CCNet-style quality signal).

The CCNet / DataComp-LM pipelines bucket web documents by the perplexity
of a small n-gram LM; the reference engine has no LM operator, but this is
a first-class need of a 100 TB training-data pipeline, so it ships here
alongside the Gopher rules (``pipeline.gopher_repetition``) and BM25
(``textops.bm25_topk``).

Shape (everything stays a single lazy Spark plan — no driver collect):

  1. one Arrow-batched ``mapInPandas`` pass tokenizes each doc into bigram
     rows ``(id, w1, w2)`` with a ``<s>`` start sentinel (ASCII-whitespace
     tokens via ``_ascii.ws_split`` so the SQL oracle can replicate);
  2. the vocab is the top ``vocab_size`` tokens by count (ties broken by
     token) — a ``TakeOrderedAndProject``, never a global sort;
  3. out-of-vocab tokens map to ``<unk>`` via two BROADCAST left joins
     (the vocab is small by construction);
  4. context / bigram counts are map-side-combinable ``groupBy.count``s;
  5. scoring joins the counts back BROADCAST and aggregates
     ``sum(log(p))`` per doc.

At 100 TB the only large shuffles are the two counting aggregations over
the bigram rows, both partial-aggregated map-side; the model tables that
flow into the scoring join are ``O(vocab_size + observed bigrams over the
vocab)`` and broadcast. Train and score corpora may differ (``train_df``):
unseen contexts back off to ``ln(add_k / (add_k * (V + 1)))``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._ascii import ws_split as _ascii_ws_split

_BOS = "<s>"
_UNK = "<unk>"


def _bigram_pairs(df: DataFrame, id_col: str, text_col: str, lowercase: bool) -> DataFrame:
    """One Arrow pass: (id, w1, w2) bigram rows, ``<s>`` prepended.

    Zero-token docs emit no rows (they have no bigram evidence and drop
    out of the scored output — the oracle mirrors this).
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("w1", T.StringType()),
            T.StructField("w2", T.StringType()),
        ]
    )
    ii = df.columns.index(id_col)
    ti = df.columns.index(text_col)

    def gen(batches):
        for pdf in batches:
            ids, w1s, w2s = [], [], []
            for did, text in zip(pdf.iloc[:, ii], pdf.iloc[:, ti]):
                if text is None:
                    continue
                s = str(text).lower() if lowercase else str(text)
                prev = _BOS
                for t in _ascii_ws_split(s):
                    ids.append(did)
                    w1s.append(prev)
                    w2s.append(t)
                    prev = t
            yield pd.DataFrame({id_col: pd.Series(ids), "w1": w1s, "w2": w2s})

    return df.mapInPandas(gen, out_schema)


def ngram_lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
    add_k: float = 0.5,
    train_df: DataFrame | None = None,
    lowercase: bool = False,
    ndigits: int = 6,
) -> DataFrame:
    """Score each document by an add-k-smoothed bigram LM.

    Returns ``(id_col, lm_bigrams, lm_logprob, lm_ppl)`` where
    ``lm_logprob = round(sum ln P(w2|w1), ndigits)`` and
    ``lm_ppl = round(exp(-lm_logprob / lm_bigrams), ndigits)`` — the
    perplexity is derived from the ROUNDED logprob so both engines decide
    from identical values (repo float-parity rule).

    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k * (V + 1))`` with ``V`` the
    realized vocab size (``min(vocab_size, distinct tokens)``) and ``+1``
    for ``<unk>``. The model trains on ``train_df`` when given, else
    self-trains on ``df`` (the CCNet setup scores with a reference-corpus
    model; self-training is the single-corpus quality signal).
    """
    if add_k <= 0:
        raise ValueError("ngram_lm_perplexity: add_k must be > 0")
    k = float(add_k)
    score_pairs = _bigram_pairs(df, id_col, text_col, lowercase)
    if train_df is None:
        train_pairs = score_pairs
    else:
        train_pairs = _bigram_pairs(train_df, id_col, text_col, lowercase)

    vocab = (
        train_pairs.groupBy("w2")
        .agg(F.count("*").alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("w2").asc())
        .limit(int(vocab_size))
        .select(F.col("w2").alias("_tok"))
    )
    # realized vocab size as a lazy 1-row aggregate (broadcast into the
    # scoring join — no eager .count() action on the driver)
    vsize = vocab.agg(F.count("*").alias("_v"))

    def mapped(pairs: DataFrame) -> DataFrame:
        m = pairs.join(
            F.broadcast(vocab.select(F.col("_tok").alias("w1"), F.lit(1).alias("_in1"))),
            "w1",
            "left",
        ).join(
            F.broadcast(vocab.select(F.col("_tok").alias("w2"), F.lit(1).alias("_in2"))),
            "w2",
            "left",
        )
        m1 = F.when((F.col("w1") == _BOS) | F.col("_in1").isNotNull(), F.col("w1")).otherwise(
            F.lit(_UNK)
        )
        m2 = F.when(F.col("_in2").isNotNull(), F.col("w2")).otherwise(F.lit(_UNK))
        return m.select(id_col, m1.alias("m1"), m2.alias("m2"))

    mtrain = mapped(train_pairs)
    cu = mtrain.groupBy("m1").agg(F.count("*").alias("_nc"))
    cb = mtrain.groupBy("m1", "m2").agg(F.count("*").alias("_nb"))

    mscore = mapped(score_pairs)
    term = F.log(
        (F.coalesce(F.col("_nb"), F.lit(0)) + k)
        / (F.coalesce(F.col("_nc"), F.lit(0)) + k * (F.col("_v") + 1))
    )
    agg = (
        mscore.join(F.broadcast(cu), "m1", "left")
        .join(F.broadcast(cb), ["m1", "m2"], "left")
        .crossJoin(F.broadcast(vsize))
        .withColumn("_t", term)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("lm_bigrams"),
            F.round(F.sum("_t"), ndigits).alias("lm_logprob"),
        )
    )
    return agg.withColumn(
        "lm_ppl", F.round(F.exp(-F.col("lm_logprob") / F.col("lm_bigrams")), ndigits)
    )
