"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

The published recipe for picking pretraining data that "looks like" a
target corpus: featurize every document as a bag of hashed n-grams,
fit two bag-of-words models — one on the raw pool, one on the target —
and weight each raw document by its log likelihood ratio

    log w(doc) = sum over grams g of  [ ln p_target(b(g)) - ln p_raw(b(g)) ]

where ``b(g)`` hashes the gram into ``num_buckets`` feature buckets.
Selection then keeps the top-k by ``log_w`` (or Gumbel-resamples, which
is the same score plus per-doc noise the caller can add).

Spark shape (mirrors :mod:`.lm`'s ngram scorer — the proven 100-TB
layout):

  1. ONE Arrow-batched ``mapInPandas`` pass per corpus tokenizes
     (ASCII-whitespace, ``_ascii.ws_split``) and emits hashed gram rows
     ``(id, bucket)`` for unigrams + bigrams — the hash is the repo's
     portable 131-polynomial so a plain-SQL oracle replays it
     value-for-value (``dedup.poly_hash_expr`` semantics, computed
     vectorized in the kernel rather than as a CodegenFallback HOF);
  2. the two bucket-count models are map-side-combinable
     ``groupBy(bucket).count()`` aggregations — the ONLY shuffles that
     scale with corpus size, both partial-aggregated;
  3. per-gram log-ratio terms come from a BROADCAST join of the
     ≤``num_buckets``-row model tables onto the raw gram rows;
  4. ``log_w`` is one final map-side-combinable per-doc sum.

Totals (corpus gram counts) ride along inside the broadcast model rows,
so no driver-side collect anywhere. Smoothing is add-k over the bucket
space: p(b) = (count_b + add_k) / (total + add_k * num_buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._ascii import ws_split as _ascii_ws_split

_MOD = 1_000_000_007


def _poly_bucket(s: str, num_buckets: int, seed: int) -> int:
    # square mix after the 131-poly fold: the linear hash clusters
    # shared-prefix grams (measured 3x bucket bias in the KMV sketch);
    # (h² + h) mod p restores uniformity, stays < 2⁶³, stays
    # SQL-replicable (same mix as operators/sketch.py)
    h = seed + 1
    for ch in s:
        h = (h * 131 + ord(ch)) % _MOD
    return ((h * h + h) % _MOD) % num_buckets


def _batch_gram_buckets(ids_in, texts_in, num_buckets: int, seed: int,
                        lowercase: bool):
    """Vectorized batch-global gram hasher: hash every unigram + bigram
    of every doc in ONE numpy pass (the per-char Horner in
    :func:`_poly_bucket` re-walks each character up to 3×; this walks
    the batch's code points once — the same modular prefix-hash kernel
    as ``dedup._window_hash_spans``).

    Every unigram and bigram is a contiguous substring of the doc's
    whitespace-normalized text ``" ".join(toks)`` (bigrams join with a
    single space by construction), so with r = 131⁻¹ mod p and prefix
    P[i] = cumsum(c_j·r^(j+1))·131^i mod p, each gram's 131-poly hash is
    hash(a, b) = ((seed+1)·131^(b−a) + P[b] − P[a]·131^(b−a)) mod p —
    O(1) per gram, bit-identical to :func:`_poly_bucket`.

    Returns ``(doc_ids, buckets, counts)``: docs with ≥1 token, their
    grams' buckets (int64, concatenated in doc order: all unigrams then
    all bigrams per doc), and per-doc gram counts (= 2·n_toks − 1)."""
    from .dedup import _span_pow_table

    RINV = pow(131, _MOD - 2, _MOD)
    doc_ids, texts, starts_l, ends_l, counts = [], [], [], [], []
    pos = 0
    for did, text in zip(ids_in, texts_in):
        if text is None:
            continue
        s = str(text).lower() if lowercase else str(text)
        toks = _ascii_ws_split(s)
        if not toks:
            continue
        tl = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        off = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum(tl + 1, out=off[1:])
        uni_a = pos + off[:-1]
        a_parts, b_parts = [uni_a], [uni_a + tl]
        if len(toks) > 1:
            # bigram i = toks[i] + " " + toks[i+1]: starts at off[i],
            # ends where token i+1 ends
            a_parts.append(pos + off[:-2])
            b_parts.append(pos + off[1:-1] + tl[1:])
        doc_ids.append(did)
        texts.append(" ".join(toks))
        starts_l.append(np.concatenate(a_parts))
        ends_l.append(np.concatenate(b_parts))
        counts.append(2 * len(toks) - 1)
        pos += off[-1] - 1  # joined length in code points
    if not doc_ids:
        z = np.zeros(0, dtype=np.int64)
        return [], z, z
    cp = np.frombuffer(
        "".join(texts).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    n = len(cp)
    pow131 = _span_pow_table(131, n)
    rpow = _span_pow_table(RINV, n)
    terms = cp * rpow[1:] % _MOD
    P = np.empty(n + 1, dtype=np.int64)
    P[0] = 0
    np.cumsum(terms, out=P[1:])
    P[1:] %= _MOD
    P[1:] = P[1:] * pow131[1:] % _MOD
    A = np.concatenate(starts_l)
    B = np.concatenate(ends_l)
    wl = B - A
    sub = (P[B] - P[A] * pow131[wl]) % _MOD
    h = ((int(seed) + 1) * pow131[wl] + sub) % _MOD
    h = (h * h + h) % _MOD
    return doc_ids, h % num_buckets, np.asarray(counts, dtype=np.int64)


def _gram_rows(
    df: DataFrame, id_col: str, text_col: str, num_buckets: int,
    seed: int, lowercase: bool,
) -> DataFrame:
    """One Arrow pass: (id, bucket) rows for unigrams + bigrams (bigram
    string is ``w1 w2`` with a single joining space). Empty docs emit no
    rows — they carry no evidence and drop from the scored output (the
    oracle mirrors this). Hashing is the vectorized batch-global kernel
    (:func:`_batch_gram_buckets`)."""
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("bucket", T.IntegerType())]
    )
    ii, ti = 0, 1  # the pass runs over select(id, text) below
    id_is_int = isinstance(
        df.schema[id_col].dataType,
        (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    )

    def gen(batches):
        for pdf in batches:
            dids, buckets, counts = _batch_gram_buckets(
                pdf.iloc[:, ii], pdf.iloc[:, ti], num_buckets, seed, lowercase
            )
            if id_is_int:
                ids = np.repeat(np.asarray(dids, dtype=np.int64), counts)
            else:
                ids = np.repeat(np.asarray(dids, dtype=object), counts)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids),
                    "bucket": pd.Series(buckets.astype(np.int32), dtype="int32"),
                }
            )

    from ._util import widen_narrow_input

    return widen_narrow_input(
        df.select(F.col(id_col), F.col(text_col))
    ).mapInPandas(gen, out_schema)


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4099,
    add_k: float = 1.0,
    seed: int = 7,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document DSIR importance log-weight of every ``raw`` doc
    against the ``target`` corpus distribution.

    Returns ``(id_col, dsir_grams, dsir_logw)`` — ``dsir_logw`` rounded
    to 6 decimals (the repo's dual-engine float-parity convention),
    higher = more target-like. Docs with no tokens emit no row.

    Note the raw gram projection feeds two plan branches (its bucket
    counts AND the scoring join), so the tokenizer pass runs twice over
    the raw corpus — the same accepted shape as :func:`.lm.
    ngram_lm_perplexity` (DuckDB's CTE materialization pays it once); at
    100 TB persist the gram projection between the two jobs.
    """
    from pyspark.sql import Window

    raw_grams = _gram_rows(raw, id_col, text_col, num_buckets, seed, lowercase)
    tgt_grams = _gram_rows(target, id_col, text_col, num_buckets, seed, lowercase)

    raw_counts = raw_grams.groupBy("bucket").agg(F.count("*").alias("r_cnt"))
    tgt_counts = tgt_grams.groupBy("bucket").agg(F.count("*").alias("t_cnt"))
    # totals via one global window over the ≤num_buckets-row model table
    # (post-aggregation, tiny): buckets absent from a corpus contribute 0,
    # so sum(cnt) over () IS that corpus's gram total
    w_all = Window.partitionBy(F.lit(1))
    model = F.broadcast(
        raw_counts.join(tgt_counts, "bucket", "full_outer")
        .na.fill(0, ["r_cnt", "t_cnt"])
        .withColumn("r_total", F.sum("r_cnt").over(w_all))
        .withColumn("t_total", F.sum("t_cnt").over(w_all))
    )

    b = float(num_buckets)
    term = (
        F.log((F.col("t_cnt") + F.lit(add_k)) / (F.col("t_total") + F.lit(add_k) * b))
        - F.log((F.col("r_cnt") + F.lit(add_k)) / (F.col("r_total") + F.lit(add_k) * b))
    )
    out = (
        raw_grams.join(model, "bucket", "left")
        .withColumn("_term", term)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("dsir_grams"),
            (F.floor(F.sum("_term") * 1e6 + F.lit(0.5)) / 1e6).alias("dsir_logw"),
        )
    )
    # the raw LLR is length-biased (each smoothed term carries a negative
    # constant when the target corpus is much smaller than the raw pool),
    # so selection ranks on the per-gram mean; derived from the ROUNDED
    # sum so both engines divide identical numerators
    return out.withColumn(
        "dsir_logw_norm",
        F.floor(F.col("dsir_logw") / F.col("dsir_grams") * 1e6 + F.lit(0.5)) / 1e6,
    )


def dsir_top_k(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """The selection step: top-k raw docs by length-normalized DSIR
    log-weight (ties broken by id for determinism) — a
    TakeOrderedAndProject, never a global sort."""
    w = dsir_log_weights(raw, target, id_col=id_col, text_col=text_col, **kwargs)
    return w.orderBy(F.desc("dsir_logw_norm"), F.asc(id_col)).limit(int(k))
