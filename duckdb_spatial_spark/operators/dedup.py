"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star). All hot paths are
built-in Spark functions (codegen'd, shuffle-aware); Python appears only
where a kernel genuinely needs it. Each operator is designed for the
100 TB shape: inverted-index joins instead of cross joins, band-bucketed
LSH instead of all-pairs, map-side combines on every groupBy.

  dedup_exact          hash-groupBy keep-first (one shuffle)
  ngram_jaccard_pairs  shingle inverted index -> pair counts -> exact jaccard
  minhash_lsh_pairs    minhash signatures -> banded buckets -> verified pairs
  simhash              64-bit simhash fingerprint + near-dup pairs by
                       hamming distance on rotated bands
  embedding_neardup    cosine near-duplicate pairs over embedding vectors
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._ascii import _STRIP, _WS
from ._ascii import ws_split as _ascii_ws_split


def _tokens(text_col, lowercase=True):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def _shingles(text_col, n: int):
    """Word n-gram shingles as an array of distinct strings — pure Column.

    Used by the ``*_spec`` oracle lanes: DuckDB replicates lower/split/
    slice in SQL, so parity requires staying on JVM string semantics.
    Production lanes use :func:`_shingles_py` — Spark's higher-order
    functions are CodegenFallback (interpreted per element), and the
    Arrow-batched Python builder measured 8x faster at 5k docs."""
    toks = _tokens(text_col)
    if n <= 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(F.when(F.size(toks) >= n, sh).otherwise(F.array()))


def _shingles_py(text_col, n: int):
    """Arrow-batched shingle builder, semantics-identical to
    :func:`_shingles` for the production (xxhash) lanes."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def build(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            toks = _ascii_ws_split(str(t).lower())
            if n <= 1:
                out.append(list(dict.fromkeys(toks)))
            elif len(toks) < n:
                out.append([])
            else:
                out.append(
                    list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))
                )
        return pd.Series(out)

    return build(F.col(text_col) if isinstance(text_col, str) else text_col)


_POLY_M = 1000000007


def poly131_sigs_batch(texts, n: int, num_hashes: int):
    """Row-local poly131 MinHash signatures, vectorized in numpy —
    bit-identical to ``minhash_signature(df, ..., hash_fn=poly131)``
    (the Column lane the persistent index builds with).

    Used by ``streaming.demo.streaming_minhash_probe``, whose contract is
    that a stream-side signature must reproduce the batch value
    value-for-value. Parity details that matter (all pinned by
    ``tests/test_streaming_minhash_kernel.py``):

    - tokenization is ASCII-``\\s`` (``_ascii.ws_split``), matching Java
      regex ``\\s+`` in the Column lane — NOT Python's Unicode-aware
      ``\\s`` (U+00A0 etc. must stay inside tokens);
    - a doc with ``0 < len(tokens) < n`` yields NO signature in the
      Column lane (``_shingles`` emits an empty array, the explode_outer
      NULL row is dropped) — the kernel returns None for it;
    - ``poly_hash_expr`` folds over ``split(s, '')`` + ``ascii()``:
      Spark's UTF8String split yields whole CODE POINTS (verified against
      the batch lane on an astral-plane doc — NOT UTF-16 code units), so
      the kernel hashes ``utf-32-le`` units (= ``ord``).

    Closed form per shingle s of length L (in code units):
    h_k(s) = ((k+1)*131^L + base(s)) mod p with base seed-independent,
    so one Horner pass over a left-padded (shingles x W) unit matrix
    serves all ``num_hashes`` seeds; per-doc mins via minimum.reduceat.

    Returns a list aligned with ``texts``: each element a
    ``num_hashes``-long list of ints, or None (null text / no shingles).
    """
    M = _POLY_M
    sh_units: list[np.ndarray] = []   # code units per shingle, batch-flat
    starts: list[int] = []            # first shingle index per live doc
    live: list[int] = []              # positions in `texts` with >=1 shingle
    out: list = [None] * len(texts)
    for pos, t in enumerate(texts):
        if t is None:
            continue
        toks = _ascii_ws_split(str(t).lower())
        if n <= 1:
            sh = list(dict.fromkeys(toks))
        elif len(toks) < n:
            sh = []
        else:
            sh = list(dict.fromkeys(
                " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)))
        if not sh:
            continue
        starts.append(len(sh_units))
        live.append(pos)
        sh_units.extend(
            np.frombuffer(s.encode("utf-32-le"), dtype="<u4") for s in sh)
    if not live:
        return out
    lens = np.array([len(u) for u in sh_units], dtype=np.int64)
    W = int(lens.max())
    mat = np.zeros((len(sh_units), W), dtype=np.int64)
    for i, u in enumerate(sh_units):
        if len(u):
            mat[i, W - len(u):] = u
    # left-zero padding is Horner-neutral (leading 0*131^j terms vanish)
    base = np.zeros(len(sh_units), dtype=np.int64)
    for j in range(W):
        base = (base * 131 + mat[:, j]) % M
    pows = np.ones(W + 1, dtype=np.int64)
    for j in range(W):
        pows[j + 1] = (pows[j] * 131) % M
    p_l = pows[lens]
    seeds = np.arange(1, num_hashes + 1, dtype=np.int64)  # (k+1)
    hv = (seeds[:, None] * p_l[None, :] + base[None, :]) % M
    mins = np.minimum.reduceat(hv, np.array(starts, dtype=np.int64), axis=1)
    for col, pos in enumerate(live):
        out[pos] = mins[:, col].tolist()
    return out


def poly_hash_expr(col, seed: int):
    """Portable polynomial hash over codepoints: h = fold((h*131 + c) mod
    1e9+7, init seed+1). Bit-identical in plain SQL (DuckDB ``list_reduce``
    over ``string_split(s,'')``) and Spark Columns, so the ``*_spec``
    driver queries can cross-check the full minhash/simhash pipelines
    value-for-value. ~30 bits of entropy — production paths stay on
    xxhash64; this exists for oracle parity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(seed + 1).cast("long"),
        lambda acc, ch: (acc * 131 + ch) % 1000000007,
    )


def dedup_exact(df: DataFrame, cols, id_col: str = None) -> DataFrame:
    """Keep one row per distinct value of ``cols`` (lowest id wins when
    ``id_col`` given, else arbitrary-but-deterministic first).

    min_by aggregation, NOT a window: at web scale the hottest key (an
    empty doc, boilerplate) holds millions of rows, and a per-key window
    sorts that entire mass in one task — AQE splits skewed joins, not
    windows (repo perf rule). The aggregate combines map-side, so a hot
    key ships one partial row per map task."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    order = F.col(id_col) if id_col else F.monotonically_increasing_id()
    packed = df.select(order.alias("_ord"), F.struct(*df.columns).alias("_row"))
    agg = packed.groupBy(
        *[F.col(f"_row.{c}").alias(c) for c in cols]
    ).agg(F.min_by("_row", "_ord").alias("_r"))
    return agg.select("_r.*")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 500,
) -> DataFrame:
    """All pairs with word-``n``-gram Jaccard >= threshold.

    Inverted-index join: explode distinct shingles, self-join on shingle
    (equi-join, shuffle on shingle hash — no cross join) to discover
    candidate pairs, then compute the EXACT jaccard on each candidate from
    the full shingle sets (array_intersect, JVM-side). Returns
    (id_a, id_b, jaccard) with id_a < id_b.

    ``max_shingle_df`` (default 500): web-scale skew guard — shingles
    appearing in more than this many documents are dropped from CANDIDATE
    GENERATION only. A shingle shared by k docs contributes k^2 candidate
    pairs, so one boilerplate trigram can dominate the shuffle. Because
    jaccard is recomputed from the full sets, the cut never changes a
    reported value; the only effect is that a pair whose ENTIRE overlap is
    boilerplate (every common shingle above the cut) is not discovered.
    Pass ``None`` to disable the cut (exhaustive candidates)."""
    base = df.select(F.col(id_col).alias("_id"), _shingles(text_col, n).alias("_sh"))
    # explode_outer + output-attribute filter: see minhash_signature — a
    # plain explode gets a size()>0 filter inferred and pushed to the scan,
    # re-evaluating the shingle expression interpreted per source row
    inv = base.select("_id", F.explode_outer("_sh").alias("_s")).where(F.col("_s").isNotNull())
    if max_shingle_df is not None:
        hot = (
            inv.groupBy("_s").agg(F.count("*").alias("_df")).filter(F.col("_df") > max_shingle_df)
        )
        inv = inv.join(F.broadcast(hot.select("_s")), "_s", "left_anti")
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sets_a = base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    sets_b = base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    out = (
        cand.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn("common", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.size("_sha") + F.size("_shb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signature(df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 64, hash_fn=None):
    """MinHash signatures: elementwise-min fold over shingles of
    [xxhash64(s, k) for k seeds].

    Single `aggregate` pass with a ``num_hashes``-wide accumulator — the
    shingle array is built ONCE per row (the naive per-seed
    ``array_min(transform(...))`` form makes Catalyst re-expand the whole
    shingle pipeline per seed: ~30x slower measured)."""
    # widen narrow scans through the shared, PLAN-GATED helper: a bare
    # .rdd probe here had the same AQE eager-materialization hazard the
    # r11 ADVICE flagged on _util.widen_narrow_input (double execution
    # when the input already carries a shuffle)
    from ._util import widen_narrow_input

    df = widen_narrow_input(df)
    # production (xxhash) lane: Arrow-batched shingles (8x vs interpreted
    # HOFs); hash_fn set => *_spec oracle lane stays on the Column builder
    # so shingle strings match the DuckDB SQL replica exactly
    builder = _shingles if hash_fn else _shingles_py
    base = df.select(F.col(id_col).alias("_id"), builder(text_col, n).alias("_sh"))
    # explode_outer, NOT explode: a plain explode makes Catalyst's
    # InferFiltersFromGenerate synthesize size(_sh)>0 and push it to the
    # scan, where the whole (interpreted) shingle expression re-evaluates
    # per row on unsplit input — measured 16x slower at 5k docs. The outer
    # variant infers nothing; empty-shingle docs surface as one NULL row
    # dropped by a filter on the generator OUTPUT attribute (which cannot
    # be pushed below the Generate). The flat min-aggregate keeps the rest
    # in whole-stage codegen with map-side partial mins — one shuffle.
    ex = base.select("_id", F.explode_outer("_sh").alias("_s")).where(F.col("_s").isNotNull())
    hf = hash_fn or (lambda col, k: F.xxhash64(col, F.lit(k)))
    hcols = [hf(F.col("_s"), k).alias(f"_h{k}") for k in range(num_hashes)]
    sig = (
        ex.select("_id", *hcols)
        .groupBy("_id")
        .agg(*[F.min(f"_h{k}").alias(f"_h{k}") for k in range(num_hashes)])
        .select("_id", F.array(*[f"_h{k}" for k in range(num_hashes)]).alias("_sig"))
    )
    # _sh is NOT carried: every downstream self-join would re-evaluate (and
    # re-shuffle) the whole shingle pipeline per reference; verification
    # re-derives shingles for candidate ids only
    return sig


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    verify: bool = True,
    hash_fn=None,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, optionally verified
    with exact shingle Jaccard.

    shingle -> minhash -> band -> bucket-join (the standard construction):
    rows/band = num_hashes/bands; collision prob ≈ 1-(1-j^r)^b. Candidates
    come from equi-joins on (band_idx, band_hash) — scales as data * bands,
    never all-pairs."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signature(df, id_col, text_col, n, num_hashes, hash_fn=hash_fn)
    # band hashes only — the shingle arrays must NOT travel through the
    # band join (they blow up the shuffle when buckets are dense)
    banded = sigs.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.concat_ws(",", *[F.element_at(F.col("_sig"), i * r + k + 1).cast("string") for k in range(r)]))
                    for i in range(bands)
                ]
            )
        ).alias("band", "bhash"),
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        return cand
    # exact-Jaccard verification: inputs are re-derived ONLY for rows that
    # appear in some candidate pair (semi-join first — candidates are
    # usually a tiny fraction of the corpus, so this beats carrying the
    # shingle arrays through the band join or caching full signatures)
    ids = cand.select(F.col("id_a").alias("_id")).union(
        cand.select(F.col("id_b").alias("_id"))
    ).distinct()
    sub = df.join(ids, F.col(id_col) == ids["_id"], "left_semi")
    if hash_fn:
        # *_spec oracle lanes: stay on the JVM Column shingle builder so
        # every stage is replicated value-for-value by the SQL oracle
        sh = sub.select(F.col(id_col).alias("_id"), _shingles(text_col, n).alias("_sh"))
        cand = (
            cand.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
            .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        uni = F.size("sh_a") + F.size("sh_b") - inter
        return (
            cand.withColumn("jaccard", inter / uni)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    # production lane: join TEXT (not shingle arrays) onto the pairs and
    # re-derive shingle sets executor-side in one Arrow pass. The old
    # shape shipped array<string> shingles per candidate side — ~3x the
    # text bytes (each word sits in n shingles) plus per-element object
    # churn that GC-spiked dense-clique corpora (r14 verdict: the one
    # lane whose ratio wouldn't reproduce under 2x across sessions).
    # Near-dup candidates repeat texts, so a per-batch memo makes the
    # Python shingle cost ~one pass per distinct doc, not per pair.
    # Set sizes equal list_distinct sizes, and inter/union stays integer
    # until ONE IEEE division — bit-equal to the SQL oracle's value.
    texts = sub.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_tx"))
    cand = (
        cand.join(texts.withColumnRenamed("_id", "id_a").withColumnRenamed("_tx", "_ta"), "id_a")
        .join(texts.withColumnRenamed("_id", "id_b").withColumnRenamed("_tx", "_tb"), "id_b")
    )

    @F.pandas_udf("double")
    def _jac(a: pd.Series, b: pd.Series) -> pd.Series:
        memo: dict = {}

        def sh_set(t):
            s = memo.get(t)
            if s is None:
                toks = _ascii_ws_split(str(t).lower())
                if n <= 1:
                    s = frozenset(toks)
                elif len(toks) < n:
                    s = frozenset()
                else:
                    s = frozenset(
                        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                    )
                memo[t] = s
            return s

        # undefined Jaccard (null text / empty shingle sets) must come
        # back as a REAL null, not NaN: Spark orders NaN above every
        # number, so a NaN surviving Arrow conversion would PASS the
        # `jaccard >= threshold` filter. Track a miss mask and emit an
        # object series with explicit None — never np.nan.
        out = np.empty(len(a), dtype="float64")
        miss = np.zeros(len(a), dtype=bool)
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None or y is None:
                miss[i] = True
                continue
            sa, sb = sh_set(x), sh_set(y)
            # exact-copy pairs dominate real web corpora: equal texts memo
            # to the SAME frozenset object, so `is` skips the intersection
            if sa is sb:
                if sa:
                    out[i] = 1.0
                else:
                    miss[i] = True
                continue
            c = len(sa & sb)
            u = len(sa) + len(sb) - c
            if u:
                out[i] = c / u
            else:
                miss[i] = True
        if miss.any():
            vals = out.astype(object)
            vals[miss] = None
            return pd.Series(vals, dtype=object)
        return pd.Series(out)

    return (
        cand.withColumn("jaccard", _jac("_ta", "_tb"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash", bits: int = 64, hash_fn=None) -> DataFrame:
    """64-bit SimHash: per-token xxhash64, each bit votes +1/-1 weighted by
    term frequency; sign of the vote vector -> fingerprint bits.

    Built-in expression construction: per bit, sum over tokens of
    ±1 -> aggregate. 64 aggregates over an exploded token table with a
    map-side combine; one shuffle on id."""
    # explode_outer: see minhash_signature — plain explode gets a size()>0
    # filter inferred and pushed to the scan, re-evaluating the tokenizer
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode_outer(_tokens(text_col)).alias("_t")
    ).where(F.col("_t").isNotNull())
    h = hash_fn(F.col("_t")) if hash_fn else F.xxhash64("_t")
    bit_sums = toks.groupBy("_id").agg(
        *[
            F.sum(F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        shifted = F.shiftleft(term, b)
        fp = shifted if fp is None else fp.bitwiseXOR(shifted)
    out = bit_sums.select("_id", fp.alias(out_col)).withColumnRenamed("_id", id_col)
    return df.join(out, id_col, "left")


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, bands: int = 4,
    verify_jaccard: float | None = None, n: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into ``bands`` chunks;
    any pair within ``bands-1`` bit flips must agree on >= 1 chunk, so an
    equi-join per chunk finds all candidates (exact when
    max_hamming < bands). Popcount via bit_count.

    ``verify_jaccard=`` adds the same exact-verification pass as
    :func:`minhash_lsh_pairs`: word-``n``-gram shingle Jaccard is computed
    ONLY for ids that appear in a candidate pair (semi-join first), pairs
    below the bar are dropped, and the returned ``jaccard`` column is the
    exact value — the fingerprint then only decides candidate RECALL, so
    the output is oracle-checkable against an all-pairs exact Jaccard."""
    sh = simhash(df.select(id_col, text_col), id_col, text_col)
    width = 64 // bands
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit((1 << width) - 1)).alias(f"c{i}")
            for i in range(bands)
        ]
    )
    e = sh.select(F.col(id_col).alias("_id"), F.col("simhash"), F.posexplode(chunks).alias("band", "chunk"))
    cand = (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    out = cand.withColumn("hamming", ham).filter(ham <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
    if verify_jaccard is None:
        return out
    ids = out.select(F.col("id_a").alias("_id")).union(
        out.select(F.col("id_b").alias("_id"))
    ).distinct()
    sub = df.join(ids, F.col(id_col) == ids["_id"], "left_semi")
    sh = sub.select(F.col(id_col).alias("_id"), _shingles_py(text_col, n).alias("_sh"))
    out = (
        out.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    uni = F.size("sh_a") + F.size("sh_b") - inter
    return (
        out.withColumn("jaccard", inter / uni)
        .filter(F.col("jaccard") >= verify_jaccard)
        .select("id_a", "id_b", "hamming", "jaccard")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    strategy: str = "auto",
    bits: int = 8,
    tables: int | None = None,
    seed: int = 7,
    block_size: int = 4096,
) -> DataFrame:
    """Cosine near-duplicate pairs over an array<float> embedding column.

    Strategies (``auto`` picks by threshold):

    * ``lsh`` (auto default for threshold >= 0.8, the near-duplicate
      regime): random-hyperplane sign signatures (knn.add_lsh_signatures),
      self-equi-join on (table, signature) bucket, exact JVM-side cosine
      verify. Candidate count scales with bucket sizes, never all-pairs —
      no CartesianProduct in the plan. ``tables`` defaults from the
      threshold so a pair AT the threshold is missed with prob < 1e-4.
    * ``blocked`` (auto default for low thresholds, where hyperplane LSH
      cannot bound recall): exact all-pairs, but computed as a block-matrix
      product — vectors are packed into ~``block_size``-row blocks, block
      pairs fan out, and each task scores one block pair with a single
      numpy matmul. O(n^2/2) dot products is inherent to exact all-pairs;
      this lane does them at BLAS rate with one shuffle, instead of a
      row-level join shipping one pair per row through an interpreted
      fold (the round-2/3 scale-killer).
    * ``exact``: the legacy row-level ``a._id < b._id`` join. Opt-in only;
      kept as the semantics baseline for tests.
    """
    from .knn import _cosine_expr

    if strategy == "auto":
        strategy = "lsh" if threshold >= 0.8 else "blocked"

    norm = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))

    if strategy == "exact":
        pairs = (
            norm.alias("a")
            .join(norm.alias("b"), F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                _cosine_expr(F.col("a._v"), F.col("b._v")).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )
        return pairs

    if strategy == "lsh":
        import math

        from .knn import add_lsh_signatures

        dim = len(norm.select("_v").first()[0])
        if tables is None:
            # P[bit agrees] = 1 - theta/pi at the threshold angle; size the
            # table count so P[all tables miss] < 1e-4 for a threshold pair
            p_bit = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
            p_tab = max(1e-9, p_bit**bits)
            tables = min(48, max(4, math.ceil(math.log(1e-4) / math.log1p(-min(p_tab, 1 - 1e-12)))))
        sigged = add_lsh_signatures(norm, "_v", dim, bits, tables, seed, "_sigs")
        # posexplode_outer + null filter: avoid InferFiltersFromGenerate
        # re-evaluating the signature array at the scan (see ann_lsh_topk)
        ex = sigged.select(
            "_id", "_v", F.posexplode_outer("_sigs").alias("tbl", "sig")
        ).where(F.col("sig").isNotNull())
        cand = (
            ex.alias("a")
            .join(ex.alias("b"), ["tbl", "sig"])
            .where(F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.col("a._v").alias("va"),
                F.col("b._v").alias("vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        return (
            cand.withColumn("cosine", _cosine_expr(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )

    if strategy != "blocked":
        raise ValueError(f"unknown strategy {strategy!r}")

    import math

    import numpy as np
    import pandas as pd

    n = norm.count()
    nblocks = max(1, math.ceil(n / block_size))
    wb = norm.withColumn(
        "_blk", F.pmod(F.xxhash64(F.col("_id")), F.lit(nblocks)).cast("int")
    )
    packed = wb.groupBy("_blk").agg(
        F.collect_list(F.struct(F.col("_id"), F.col("_v"))).alias("items")
    )
    bp = (
        packed.alias("a")
        .join(packed.alias("b"), F.col("a._blk") <= F.col("b._blk"))
        .select(
            F.col("a._blk").alias("blk_a"),
            F.col("b._blk").alias("blk_b"),
            F.col("a.items").alias("items_a"),
            F.col("b.items").alias("items_b"),
        )
    )
    # spread block pairs across the cluster before the numpy stage
    bp = bp.repartition(max(nblocks, 32))

    # id_a/id_b keep the input id column's type (string ids are as common as
    # int ids in dedup pipelines); comparisons use numpy object arrays so
    # Python ordering semantics apply to both.
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"

    def score(it):
        for pdf in it:
            for row in pdf.itertuples(index=False):
                # natural dtype: int ids stay int64 (vectorized C compares),
                # string ids become numpy unicode (also vectorized)
                ia = np.asarray([x["_id"] for x in row.items_a])
                ib = np.asarray([x["_id"] for x in row.items_b])
                Ma = np.asarray([x["_v"] for x in row.items_a], dtype=np.float64)
                Mb = np.asarray([x["_v"] for x in row.items_b], dtype=np.float64)
                na = np.sqrt((Ma * Ma).sum(axis=1))
                nb = np.sqrt((Mb * Mb).sum(axis=1))
                S = (Ma @ Mb.T) / np.outer(na, nb)
                mask = S >= threshold
                if row.blk_a == row.blk_b:
                    # same block joined to itself once: keep each unordered
                    # pair once, excluding the diagonal
                    mask &= ia[:, None] < ib[None, :]
                i, j = np.nonzero(mask)
                if len(i) == 0:
                    continue
                aa, bb = ia[i], ib[j]
                lo = aa <= bb  # (np.minimum has no loop for <U dtypes)
                id_a = np.where(lo, aa, bb)
                id_b = np.where(lo, bb, aa)
                yield pd.DataFrame(
                    {"id_a": id_a.tolist(), "id_b": id_b.tolist(), "cosine": S[i, j]}
                )

    return bp.mapInPandas(score, out_schema)


# --------------------------------------------------------------------------
# connected components over near-duplicate pairs
# --------------------------------------------------------------------------

def _sym(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u}). Output edges point big -> small."""
    nbrs = _sym(e)
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least("u", "_mn").alias("m"))
    )
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u over its smaller-or-equal neighbors: connect all of
    them (and u) to the minimum."""
    ee = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = ee.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = ee.join(mins, "u")
    return (
        nbrs.where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .distinct()
    )


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    c_label_col: str = "label",
    c_vec_col: str = "centroid",
    ndigits: int = 5,
    max_cluster_size: int | None = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate removal (Abbas et al. 2023,
    arXiv:2303.09540): cluster assignment confines the pairwise cosine
    search to WITHIN each cluster, so the quadratic term is per-cluster,
    never corpus-wide.

      1. broadcast-assign every vector to its nearest centroid
         (knn.assign_nearest_centroid — one matmul per Arrow batch)
      2. exact pairwise cosine within each cluster (self-join keyed on
         the assigned label; the near-dup decision is made on the
         ROUNDED cosine, repo float-parity rule)
      3. connected components over the >= threshold pairs
         (large-star/small-star), representative = min id

    Returns ``(id, assigned, rep_id, keep)`` — ``keep`` marks each
    component's representative (singletons keep themselves); dropping
    ``keep = false`` rows IS the dedup.

    Scale: the assigned label is the parallel unit — the self-join
    shuffles on it and AQE splits oversized clusters; a cluster too hot
    for exact pairs should be pre-thinned with embedding_neardup_pairs
    (LSH) instead. No cross-cluster pair is ever generated.
    ``max_cluster_size`` enforces that routing: any cluster above it
    fails LOUDLY before the quadratic self-join launches (one cheap
    count aggregate) instead of hanging a stage on n^2 cosines —
    at 100 TB one skewed centroid is otherwise a silent wedge. Pass
    ``None`` to disable after pre-thinning."""
    from .knn import _cosine_batch, assign_nearest_centroid

    a = assign_nearest_centroid(
        df, centroids, id_col=id_col, vec_col=vec_col,
        c_label_col=c_label_col, c_vec_col=c_vec_col, ndigits=ndigits,
    ).select(F.col(id_col).alias("_id"), "assigned")
    v = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    av = a.join(v, "_id")
    if max_cluster_size is not None:
        hot = (
            av.groupBy("assigned")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > int(max_cluster_size))
            .orderBy(F.col("_n").desc())
            .limit(10)
            .collect()
        )
        if hot:
            listing = ", ".join(f"{r.assigned}={r._n}" for r in hot)
            raise ValueError(
                f"semantic_dedup: cluster(s) exceed max_cluster_size="
                f"{max_cluster_size} ({listing}); exact within-cluster "
                f"pairing is quadratic — pre-thin hot clusters with "
                f"embedding_neardup_pairs (LSH) or split the centroid, "
                f"then pass max_cluster_size=None to proceed"
            )
    left = av.select(
        F.col("_id").alias("id_a"), "assigned", F.col("_v").alias("_va")
    )
    right = av.select(
        F.col("_id").alias("id_b"), "assigned", F.col("_v").alias("_vb")
    )
    pairs = (
        left.join(right, "assigned")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("_cos", F.round(_cosine_batch(F.col("_va"), F.col("_vb")), ndigits))
        .where(F.col("_cos") >= float(threshold))
        .select("id_a", "id_b")
    )
    comp = duplicate_clusters(
        pairs, nodes=df.select(F.col(id_col).alias("id")), id_col="id"
    )
    return (
        a.join(
            comp.select(F.col("id").alias("_id"), F.col("cluster_id").alias("rep_id")),
            "_id",
        )
        .select(
            F.col("_id").alias(id_col),
            "assigned",
            "rep_id",
            (F.col("_id") == F.col("rep_id")).alias("keep"),
        )
    )


def duplicate_clusters(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 30,
) -> DataFrame:
    """Transitive closure of a near-duplicate pair list: connected
    components, returned as ``(id, cluster_id)`` with ``cluster_id`` = the
    minimum member id of the component. The standard last stage of a
    dedup pipeline (LSH/SimHash emit *pairs*; deletion needs *clusters*).

    Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): O(log n)
    rounds, each round two shuffles keyed on node id — no adjacency
    ``collect_list`` (a hot node never materializes its whole neighborhood
    in one task) and no driver-side graph state. Lineage is cut per round
    with ``localCheckpoint`` so the plan stays O(1) across iterations.

    ``nodes``: optional DataFrame of all ids (``id_col``); ids appearing in
    no pair come back as singleton clusters of themselves. Without it, only
    ids present in ``pairs`` are returned.
    """
    e = (
        pairs.select(F.col(left_col).alias("u"), F.col(right_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    prev_sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = e.agg(
            F.count("*").alias("n"),
            # order-insensitive set fingerprint; bit_xor never overflows
            # (ANSI mode makes sum(hash) throw on long overflow)
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    mapping = e.select(F.col("u").alias(id_col), F.col("v").alias("cluster_id"))
    base = (
        nodes.select(F.col(id_col)).distinct()
        if nodes is not None
        else _sym(e).select(F.col("u").alias(id_col)).distinct()
    )
    return base.join(mapping, id_col, "left").select(
        F.col(id_col),
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
    )


# ---------------------------------------------------------------------------
# Incremental MinHash index: dedup NEW batches against an existing corpus
# without recomputing the corpus (the "is this crawl already in my 10T
# tokens" shape). The index is two parquet datasets + a params sidecar:
#   path/sigs   (_id, _sig)          full signatures, for jaccard estimates
#   path/bands  (_id, band, bhash)   banded LSH keys, the join surface
# ---------------------------------------------------------------------------

_MINHASH_META = "_minhash_index.json"


def _band_explode(bands: int, r: int):
    return F.posexplode(
        F.array(
            *[
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[F.element_at(F.col("_sig"), i * r + k + 1).cast("string") for k in range(r)],
                    )
                )
                for i in range(bands)
            ]
        )
    ).alias("band", "bhash")


_INDEX_HASHES = {
    "xxhash64": None,  # minhash_signature's default
    "poly131": lambda col, k: poly_hash_expr(col, k),
}


def _index_hash_fn(name: str):
    try:
        return _INDEX_HASHES[name]
    except KeyError:
        raise ValueError(
            f"unknown minhash index hash {name!r} (known: {sorted(_INDEX_HASHES)})"
        ) from None


def minhash_index_build(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    hash: str = "xxhash64",
) -> None:
    """Build (overwrite) a persistent MinHash index over a corpus.

    Signatures are computed ONCE (written, then re-read to derive the
    band keys — no double shingle pass); the band dataset is the only
    thing future queries shuffle against.

    ``hash`` names the signature space and is stored in the sidecar so
    appends and queries can never mix spaces: ``xxhash64`` (production)
    or ``poly131`` (the portable SQL-replicable spec hash — lower
    entropy, exists for cross-engine verification)."""
    import json as _json
    import os as _os

    assert num_hashes % bands == 0
    hf = _index_hash_fn(hash)
    spark = df.sparkSession
    sigs = minhash_signature(df, id_col, text_col, n, num_hashes, hash_fn=hf)
    sigs.write.mode("overwrite").parquet(f"{path}/sigs")
    stored = spark.read.parquet(f"{path}/sigs")
    stored.select("_id", _band_explode(bands, num_hashes // bands)).write.mode(
        "overwrite"
    ).parquet(f"{path}/bands")
    _os.makedirs(path, exist_ok=True)
    with open(_os.path.join(path, _MINHASH_META), "w", encoding="utf-8") as f:
        _json.dump(
            {"n": n, "num_hashes": num_hashes, "bands": bands, "hash": hash}, f
        )


def _minhash_index_meta(path: str) -> dict:
    import json as _json
    import os as _os

    with open(_os.path.join(path, _MINHASH_META), encoding="utf-8") as f:
        return _json.load(f)


def minhash_index_append(
    df: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Add a new batch to an existing index (same params as the build —
    read from the sidecar, so appends can never mix signature spaces).

    The batch's signatures are materialized ONCE into a staging dir and
    both datasets derive from that materialization — re-executing the
    signature plan for the band write would let a non-deterministic
    input (sample(), changing files) produce bands that disagree with
    the stored signatures, silently corrupting the index."""
    import shutil as _shutil
    import uuid as _uuid

    meta = _minhash_index_meta(path)
    spark = df.sparkSession
    stage = f"{path}/_stage_{_uuid.uuid4().hex[:8]}"
    try:
        minhash_signature(
            df, id_col, text_col, meta["n"], meta["num_hashes"],
            hash_fn=_index_hash_fn(meta.get("hash", "xxhash64")),
        ).write.mode("overwrite").parquet(stage)
        staged = spark.read.parquet(stage)
        staged.write.mode("append").parquet(f"{path}/sigs")
        staged.select(
            "_id", _band_explode(meta["bands"], meta["num_hashes"] // meta["bands"])
        ).write.mode("append").parquet(f"{path}/bands")
    finally:
        _shutil.rmtree(stage, ignore_errors=True)


def minhash_index_query(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
) -> DataFrame:
    """Near-dup matches of a NEW batch against the indexed corpus:
    (query_id, index_id, est_jaccard) for candidates whose estimated
    Jaccard (fraction of agreeing minhashes) reaches ``threshold``.

    Scale: the query batch's band keys equi-join the stored band
    dataset (partition pruning/bucketing ready); signatures join back
    only for the candidates. Nothing about the corpus is recomputed."""
    meta = _minhash_index_meta(path)
    spark = df.sparkSession
    nh = meta["num_hashes"]
    qsigs = minhash_signature(
        df, id_col, text_col, meta["n"], nh,
        hash_fn=_index_hash_fn(meta.get("hash", "xxhash64")),
    )
    qb = qsigs.select(
        F.col("_id").alias("query_id"), _band_explode(meta["bands"], nh // meta["bands"])
    )
    ib = spark.read.parquet(f"{path}/bands").select(
        F.col("_id").alias("index_id"), "band", "bhash"
    )
    cand = (
        qb.join(ib, ["band", "bhash"])
        .select("query_id", "index_id")
        .dropDuplicates(["query_id", "index_id"])
    )
    isigs = spark.read.parquet(f"{path}/sigs").select(
        F.col("_id").alias("index_id"), F.col("_sig").alias("_isig")
    )
    # Arrow-batched agreement count: zip_with/filter/size are
    # CodegenFallback (interpreted per signature element); one vectorized
    # numpy compare per candidate pair instead
    nhf = float(nh)

    @F.pandas_udf("double")
    def _agree(qs: pd.Series, ws: pd.Series) -> pd.Series:
        return pd.Series(
            [
                float(np.sum(np.asarray(a) == np.asarray(b))) / nhf
                for a, b in zip(qs, ws)
            ],
            dtype="float64",
        )

    return (
        cand.join(qsigs.select(F.col("_id").alias("query_id"), F.col("_sig").alias("_qsig")), "query_id")
        .join(isigs, "index_id")
        .withColumn("est_jaccard", _agree(F.col("_qsig"), F.col("_isig")))
        .filter(F.col("est_jaccard") >= float(threshold))
        .select("query_id", "index_id", "est_jaccard")
    )


def _span_pow_table(base: int, n: int, M: int = 1000000007) -> np.ndarray:
    # pows[i] = base^i mod M for i in [0, n]; doubling keeps every
    # step a whole-array multiply (values < M, products < 2^63)
    pows = np.ones(n + 1, dtype=np.int64)
    k = 1
    while k <= n:
        step = min(k, n + 1 - k)
        pows[k : k + step] = pows[:step] * (pows[k - 1] * base % M) % M
        k *= 2
    return pows


def _window_hash_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int,
    seed: int,
    with_start: bool = False,
    wide: bool = False,
) -> DataFrame:
    """One Arrow pass emitting a row per ``w``-token window: ``(id, _h)``
    (plus ``_s`` token start index with ``with_start``). The hash is the
    square-mixed 131-poly over the window's joined text — SQL-replicable.

    ``wide=True`` combines TWO independent square-mixed poly hashes
    (moduli 1e9+7 and 998244353) into one ~2⁶⁰-entropy int64 key — NOT
    SQL-replicable, for internal prefiltering only. A single ~2³⁰ hash
    saturates at corpus scale (at 10¹² windows every value is hit ~10³
    times, so a count≥2 prefilter keeps everything); the wide key keeps
    expected false candidates ~n²/2⁶¹.

    Kernel: the batch's joined docs concatenate into ONE code-point
    array (utf-32 decode — ``ord()`` semantics, matching the oracles'
    per-character ``ascii()``), a single vectorized modular prefix-hash
    pass makes every window hash O(1): with r = 131^-1 mod p, the
    prefix P[i] = cumsum(c_j * r^(j+1)) * 131^i mod p satisfies
    hash(a, b) = ((seed+1)*131^(b-a) + P[b] - P[a]*131^(b-a)) mod p.
    Pow tables build by doubling; overlapping windows share the one
    pass (the per-character Horner this replaced re-hashed every token
    ~window times)."""
    fields = [df.schema[id_col]]
    if with_start:
        fields.append(T.StructField("_s", T.LongType()))
    fields.append(T.StructField("_h", T.LongType()))
    out_schema = T.StructType(fields)
    ii = df.columns.index(id_col)
    ti = df.columns.index(text_col)
    M = 1000000007
    RINV = pow(131, M - 2, M)
    M2 = 998244353
    RINV2 = pow(131, M2 - 2, M2)
    id_is_int = isinstance(
        df.schema[id_col].dataType,
        (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    )

    def gen(batches):
        for pdf in batches:
            ids, hs, ss = [], [], []
            dids, texts, starts, ends, lens = [], [], [], [], []
            pos = 0
            for did, text in zip(pdf.iloc[:, ii], pdf.iloc[:, ti]):
                if text is None:
                    continue
                toks = _ascii_ws_split(str(text))
                if len(toks) < w:
                    continue
                tl = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
                # code-point offset of each token inside " ".join(toks)
                off = np.zeros(len(toks) + 1, dtype=np.int64)
                np.cumsum(tl + 1, out=off[1:])
                nwin = len(toks) - w + 1
                a = pos + off[:nwin]           # window starts
                b = pos + off[w : w + nwin] - 1  # ends (strip joiner space)
                dids.append(did)
                texts.append(" ".join(toks))
                starts.append(a)
                ends.append(b)
                lens.append(nwin)
                pos += off[-1] - 1  # joined length in code points
            if not dids:
                empty = {id_col: pd.Series([])}
                if with_start:
                    empty["_s"] = pd.Series([], dtype="int64")
                empty["_h"] = pd.Series([], dtype="int64")
                yield pd.DataFrame(empty)
                continue
            cp = np.frombuffer(
                "".join(texts).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            n = len(cp)
            pow131 = _span_pow_table(131, n)
            rpow = _span_pow_table(RINV, n)
            # P[i] = (Σ_{j<i} c_j r^(j+1)) · 131^i mod M = poly hash of
            # cp[:i]; terms < M so int64 cumsum holds ~9e9 code points
            terms = cp * rpow[1:] % M
            P = np.empty(n + 1, dtype=np.int64)
            P[0] = 0
            np.cumsum(terms, out=P[1:])
            P[1:] %= M
            P[1:] = P[1:] * pow131[1:] % M
            if wide:
                pow131b = _span_pow_table(131, n, M=M2)
                rpowb = _span_pow_table(RINV2, n, M=M2)
                termsb = cp * rpowb[1:] % M2
                P2 = np.empty(n + 1, dtype=np.int64)
                P2[0] = 0
                np.cumsum(termsb, out=P2[1:])
                P2[1:] %= M2
                P2[1:] = P2[1:] * pow131b[1:] % M2
            s0 = int(seed) + 1
            for did, a, b, nw in zip(dids, starts, ends, lens):
                wl = b - a
                sub = (P[b] - P[a] * pow131[wl]) % M
                h = (s0 * pow131[wl] + sub) % M
                h = (h * h + h) % M
                if wide:
                    sub2 = (P2[b] - P2[a] * pow131b[wl]) % M2
                    h2 = (s0 * pow131b[wl] + sub2) % M2
                    h2 = (h2 * h2 + h2) % M2
                    h = h * M2 + h2  # < 2^60, fits int64
                if id_is_int:
                    ids.append(np.full(nw, did, dtype=np.int64))
                else:
                    ids.extend([did] * nw)
                hs.append(h)
                if with_start:
                    ss.append(np.arange(nw, dtype=np.int64))
            out = {
                id_col: pd.Series(np.concatenate(ids)) if id_is_int else pd.Series(ids)
            }
            if with_start:
                out["_s"] = pd.Series(np.concatenate(ss), dtype="int64")
            out["_h"] = pd.Series(np.concatenate(hs), dtype="int64")
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, out_schema)


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    seed: int = 5,
) -> DataFrame:
    """ExactSubstr duplication signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for every document, how
    many of its ``window``-token spans occur ANYWHERE else in the corpus
    (other docs or repeats within the same doc).

    Returns ``(id, span_windows, dup_windows, dup_share)``; docs shorter
    than ``window`` tokens carry no spans and emit no row. The full
    ExactSubstr pipeline *removes* the duplicated byte ranges with a
    suffix array; at cluster scale the standard adaptation is this rolling
    window-hash form — the flags drive either doc-level filtering
    (dup_share threshold) or span excision downstream.

    Scale shape: one Arrow pass emits ``tokens-per-doc`` hash rows
    (square-mixed 131-poly over the window text, SQL-replicable — the
    oracle compares on the SAME hash, so collisions cannot diverge the
    engines); the corpus-wide occurrence count is one map-side-combinable
    ``groupBy(h)``; the count joins back on the hash (AQE splits the
    boilerplate-span skew) and one final per-doc aggregate. The window
    hashing itself is the vectorized batch-global prefix-hash pass
    (:func:`_window_hash_spans`); narrow scan inputs widen to cluster
    parallelism first."""
    from ._util import widen_narrow_input

    spans = _window_hash_spans(
        widen_narrow_input(df.select(F.col(id_col), F.col(text_col))),
        id_col, text_col, int(window), int(seed),
    )
    counts = spans.groupBy("_h").agg(F.count("*").alias("_c"))
    return (
        spans.join(counts, "_h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("span_windows"),
            F.sum(F.when(F.col("_c") >= 2, 1).otherwise(0)).alias("dup_windows"),
        )
        .withColumn(
            "dup_share", F.col("dup_windows").cast("double") / F.col("span_windows")
        )
    )


def _window_text_spans(
    df: DataFrame, id_col: str, text_col: str, w: int
) -> DataFrame:
    """One Arrow pass emitting a row per ``w``-token window: ``(id, _s,
    _wt)`` where ``_wt`` is the window's whitespace-normalized text.

    r17 vectorization (optimization-guide §4.2 "hand whole batches to
    vectorized native code", §4.2 Arrow buffer note): the per-WINDOW
    work is zero Python. Per doc there is ONE C regex pass
    (``_WS.sub(" ", strip)`` — identical to ``" ".join(ws_split(s))``,
    both collapse ASCII-whitespace runs) and ONE utf-8 encode; token
    offsets come from a vectorized byte scan for 0x20 (tokens can never
    contain ASCII space, and UTF-8 continuation bytes are >= 0x80, so
    the scan is exact on any input); all window strings of the batch
    are then built by one numpy gather into a single byte buffer and
    one ``pa.StringArray.from_buffers`` — the per-window Python slice
    loop and the 8x-corpus-size boxing of window strings through
    pandas are both gone (offline A/B: 1.5-1.7x on kernel+conversion,
    scripts/proto_window_text_vec.py). Output rows are byte-identical
    to the loop implementation (proven there incl. non-ASCII)."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("_s", T.LongType()),
            T.StructField("_wt", T.StringType()),
        ]
    )
    ii = df.columns.index(id_col)
    ti = df.columns.index(text_col)
    # flush the vectorized builder every ~8 MB of window payload: the
    # gather index array is 4 B per OUTPUT byte, so unbounded batches
    # would allocate payload*4 of scratch per worker (measured as a
    # 9 s first-rep page-fault spike at a 27 MB/batch payload); 8 MB
    # keeps scratch ~32 MB/worker and under the int32 offset limit
    flush_bytes = 8 << 20

    def gen(batches):
        import pyarrow as pa

        sub = _WS.sub

        def build(ids_arr, row_idx, bufs, starts, ends, nwins):
            big = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            a = np.concatenate(starts)
            b = np.concatenate(ends)
            nw = np.asarray(nwins, dtype=np.int64)
            first = np.zeros(len(nw) + 1, dtype=np.int64)
            np.cumsum(nw, out=first[1:])
            all_ss = np.arange(int(first[-1]), dtype=np.int64) - np.repeat(
                first[:-1], nw
            )
            all_ids = np.repeat(np.asarray(row_idx, dtype=np.int64), nw)
            # emit in sub-int32-offset slices (a single giant doc can push
            # the flush batch's window payload past 2 GiB)
            lo = 0
            n = len(a)
            while lo < n:
                hi = n
                while True:
                    wl = b[lo:hi] - a[lo:hi]
                    voff = np.zeros(hi - lo + 1, dtype=np.int64)
                    np.cumsum(wl, out=voff[1:])
                    if voff[-1] <= 2**31 - 1:
                        break
                    hi = lo + max(1, (hi - lo) // 2)
                # gather: window k's bytes are big[a[k] : a[k] + wl[k]]
                # (int32 index — 4 B of scratch per output byte, bounded
                # by the flush cap)
                idx = np.arange(int(voff[-1]), dtype=np.int32) - np.repeat(
                    (voff[:-1] - a[lo:hi]).astype(np.int32), wl
                )
                wts = pa.StringArray.from_buffers(
                    hi - lo, pa.py_buffer(voff.astype(np.int32)), pa.py_buffer(big[idx])
                )
                ids = ids_arr.take(pa.array(all_ids[lo:hi]))
                yield pa.RecordBatch.from_arrays(
                    [ids, pa.array(all_ss[lo:hi], type=pa.int64()), wts],
                    names=[id_col, "_s", "_wt"],
                )
                lo = hi

        empty = None
        emitted = False
        for rb in batches:
            ids_arr = rb.column(ii)
            if empty is None:
                empty = pa.RecordBatch.from_arrays(
                    [
                        ids_arr.slice(0, 0),
                        pa.array([], type=pa.int64()),
                        pa.array([], type=pa.string()),
                    ],
                    names=[id_col, "_s", "_wt"],
                )
            row_idx, bufs, starts, ends, nwins = [], [], [], [], []
            pos = 0
            for i, text in enumerate(rb.column(ti).to_pylist()):
                if text is None:
                    continue
                joined = sub(" ", text.strip(_STRIP))
                if not joined:
                    continue
                jb = joined.encode("utf-8")
                arr = np.frombuffer(jb, dtype=np.uint8)
                sp = np.flatnonzero(arr == 32)
                ntok = len(sp) + 1
                if ntok < w:
                    continue
                # token i spans [off[i], off[i+1]-1) in jb (off[-1] is a
                # sentinel one past a virtual trailing joiner space)
                off = np.empty(ntok + 1, dtype=np.int64)
                off[0] = 0
                off[1:-1] = sp + 1
                off[-1] = len(jb) + 1
                nwin = ntok - w + 1
                starts.append(pos + off[:nwin])
                ends.append(pos + off[w : w + nwin] - 1)
                nwins.append(nwin)
                row_idx.append(i)
                bufs.append(jb)
                pos += len(jb)
                if pos * (w + 1) >= flush_bytes:
                    yield from build(ids_arr, row_idx, bufs, starts, ends, nwins)
                    emitted = True
                    row_idx, bufs, starts, ends, nwins = [], [], [], [], []
                    pos = 0
            if row_idx:
                yield from build(ids_arr, row_idx, bufs, starts, ends, nwins)
                emitted = True
        if not emitted and empty is not None:
            yield empty

    return df.mapInArrow(gen, out_schema)


def _excise_pick_method(
    base: DataFrame,
    id_col: str,
    text_col: str,
    w: int,
    seed: int,
    sample_mod: int = 64,
    hot_share: float = 0.02,
) -> str:
    """Skew sketch for ``excise_dup_spans(method="auto")``: estimate the
    hottest window group's share of all window occurrences from a
    DETERMINISTIC 1/``sample_mod`` doc sample (``pmod(xxhash64(id))`` —
    never ``rand()``, which breaks under task retry, guide §2.5) hashed
    through the wide ~2⁶⁰ prefilter key (collisions at sample scale are
    negligible and could only overestimate hotness, i.e. pick the safer
    plan). A span that concentrates ``hot_share`` of the corpus into one
    window-count group would straggle the text plan's single WindowExec
    task; the hash plan splits it via AQE joins + map-side combines.
    The share of a corpus-wide hot span is preserved under doc sampling,
    so the estimate is unbiased where it matters."""
    spans = _window_hash_spans(
        base.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0),
        id_col, text_col, w, seed, wide=True,
    )
    row = (
        spans.groupBy("_h")
        .agg(F.count("*").alias("_c"))
        .agg(F.max("_c"), F.sum("_c"))
        .collect()[0]
    )
    mx, tot = row[0], row[1]
    if not tot or not mx:
        return "text"
    return "hash" if mx / tot >= hot_share else "text"


def excise_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    seed: int = 5,
    method: str = "text",
) -> DataFrame:
    """ExactSubstr span REMOVAL (Lee et al. 2022): delete every
    ``window``-token span that occurs more than once anywhere in the
    corpus, keeping the rest of the document. The removal complement of
    :func:`dup_span_stats` (which only flags).

    Returns ``(id, clean_text, n_tokens, n_removed)`` for every input
    row — ``clean_text`` is the whitespace-normalized join of surviving
    tokens (empty string when everything was duplicated or the doc had
    no tokens); a token dies when ANY window covering it is duplicated,
    so overlapping flagged windows merge naturally.

    Unlike the stats lane (where a hash collision only perturbs a
    counter and the oracle shares the hash), the REMOVAL lane deletes
    text — a false duplicate pair is silent data corruption, and a
    ~2³⁰-entropy hash sees ~n²/2e9 birthday pairs (hundreds at 10⁶
    windows, saturation at corpus scale). So duplication here is
    decided by EXACT window-text equality: a wide ~2⁶⁰ double hash
    prefilters candidates (cheap, superset-safe), the candidates'
    window text is re-derived and counted, and only text-verified
    duplicates kill tokens. The SQL oracle groups windows by their
    literal text — no hash in the semantics at all.

    Two exact plans, chosen by ``method``:

    * ``"text"`` (default) — window TEXT rows (one Arrow pass, each
      window one C-level slice) → ``count(*) OVER (PARTITION BY _wt)``
      — ONE exchange on ``_wt`` (equal windows co-locate) and the
      corpus-wide count runs JVM-side in the WindowExec, so the window
      rows never cross back into Python (no self-join either, so the
      window pass runs exactly once — a groupBy+join-back re-executes
      the whole pass on the probe side, and a persist to avoid that
      re-pass measured slower than both: r16 ab_excise_count.py) →
      per-doc flagged starts → final Arrow rebuild against the
      original text. Shuffle volume is ~window-size× the corpus bytes —
      the same asymptotics as the hash lane's span rows, fatter rows,
      two fewer stages. One pathologically hot boilerplate span
      concentrates in one WindowExec group (spillable row buffer);
      in that regime use ``"hash"``, whose corpus-scale stage is an
      AQE-splittable join.
    * ``"hash"`` — a ~2⁶⁰ double-hash prefilter shuffles 16 B/window
      first, then ONLY candidate windows' text is re-derived (a second
      Arrow pass over candidate-bearing docs), text-counted and
      verified. Post-filter stages scale with duplicate volume, not
      corpus size — take this when window-text shuffle bytes are the
      binding constraint (very fat windows / very large corpora) and
      duplicate density is low.
    * ``"auto"`` (r17) — run :func:`_excise_pick_method`'s deterministic
      sample sketch first: a corpus whose hottest window group holds
      ≥2% of all window occurrences (a boilerplate span that would
      straggle the text plan's single WindowExec group) routes to
      ``"hash"``, whose corpus-scale stages AQE can split; everything
      else routes to ``"text"``. Identical output either way — the
      router only picks the plan — at the cost of one sketch job."""
    w = int(window)
    if method not in ("text", "hash", "auto"):
        raise ValueError(f"excise_dup_spans: unknown method {method!r}")
    from ._util import widen_narrow_input

    base = widen_narrow_input(df.select(F.col(id_col), F.col(text_col)))
    if method == "auto":
        # r17 skew fallback (r16 verdict item 3, guide §2.5): one
        # pathologically hot boilerplate span lands in a single
        # WindowExec group under the text plan (spillable but a single
        # straggler task); the hash plan's corpus-scale stages are an
        # AQE-splittable join + map-side-combinable aggregates. Both
        # plans return IDENTICAL rows, so the router only affects the
        # plan. Costs one deterministic-sample sketch job — opt in per
        # corpus; the default stays "text" (no sketch on the hot path).
        method = _excise_pick_method(base, id_col, text_col, w, int(seed))
    if method == "text":
        from pyspark.sql.window import Window

        wtexts = _window_text_spans(base, id_col, text_col, w)
        # corpus-wide occurrence count per literal window text, JVM-side:
        # the Window exchange co-locates equal texts exactly like the old
        # repartition(_wt) did, but the count no longer ships the window
        # rows back into a Python worker (r13 decomposition charged ~0.8 s
        # of the 10x-tier wall to that Arrow transfer; the r16 interleaved
        # A/B in scripts/ab_excise_count.py measured this plan faster in
        # every round, output exceptAll-identical)
        flagged = (
            wtexts.withColumn("_c", F.count("*").over(Window.partitionBy("_wt")))
            .where(F.col("_c") >= 2)
            .groupBy(id_col)
            .agg(F.collect_list("_s").alias("_flags"))
        )
        src = base.join(flagged, id_col, "left")
        return _excise_rebuild(df, src, id_col, w)
    else:
        spans = _window_hash_spans(
            base, id_col, text_col, w, int(seed), with_start=True, wide=True
        )
        counts = spans.groupBy("_h").agg(F.count("*").alias("_c"))
        cand = (
            spans.join(counts, "_h")
            .where(F.col("_c") >= 2)
            .groupBy(id_col)
            .agg(F.collect_list("_s").alias("_cand"))
        )
        csrc = base.join(cand, id_col, "inner")
        wt_schema = T.StructType(
            [
                df.schema[id_col],
                T.StructField("_s", T.LongType()),
                T.StructField("_wt", T.StringType()),
            ]
        )

        def emit_wtexts(batches):
            for pdf in batches:
                ids, ss, wts = [], [], []
                for did, text, cstarts in zip(
                    pdf.iloc[:, 0], pdf.iloc[:, 1], pdf.iloc[:, 2]
                ):
                    toks = _ascii_ws_split(str(text)) if text is not None else []
                    for s in cstarts:
                        s = int(s)
                        ids.append(did)
                        ss.append(s)
                        wts.append(" ".join(toks[s : s + w]))
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(ids),
                        "_s": pd.Series(ss, dtype="int64"),
                        "_wt": pd.Series(wts, dtype="object"),
                    }
                )

        wtexts = csrc.mapInPandas(emit_wtexts, wt_schema)
        # candidate volume is dup-volume-sized: the groupBy+join-back is
        # AQE-skew-splittable and its recompute cost is bounded by the
        # candidate subtree, not the corpus pass
        wcounts = wtexts.groupBy("_wt").agg(F.count("*").alias("_c2"))
        flagged = (
            wtexts.join(wcounts, "_wt")
            .where(F.col("_c2") >= 2)
            .groupBy(id_col)
            .agg(F.collect_list("_s").alias("_flags"))
        )
        src = base.join(flagged, id_col, "left")
        return _excise_rebuild(df, src, id_col, w)


def _excise_rebuild(
    df: DataFrame, src: DataFrame, id_col: str, w: int
) -> DataFrame:
    """Final Arrow pass of :func:`excise_dup_spans`: ``src`` carries
    ``(id, text, _flags)`` (flagged window starts, NULL for clean docs);
    rebuild each doc's surviving-token text.

    r17 vectorization (optimization-guide §4.2, same treatment as
    :func:`_window_text_spans`): per doc there is ONE C regex
    normalization pass + ONE utf-8 encode; token offsets come from the
    vectorized 0x20 byte scan; the kill mask is ONE batch-global
    difference-array cumsum (flagged ranges never cross doc boundaries,
    so coverage returns to zero at each boundary); every clean_text
    string of the batch is then assembled by one numpy gather of the
    surviving token byte ranges and one ``pa.StringArray.from_buffers``
    — no per-doc Python join, no per-row boxing of the rebuilt strings.
    Identity with the old per-doc split+join loop is pinned by the
    brute-force parity tests (tests/test_dsir.py) and the oracle row.
    The ids column passes through zero-copy (rows map 1:1)."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("clean_text", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_removed", T.LongType()),
        ]
    )

    def rebuild(batches):
        import pyarrow as pa

        sub = _WS.sub

        def flag_lists(fl, n):
            """Per-row flag arrays as (values, row_offsets) int64 numpy."""
            if isinstance(fl, (pa.ListArray, pa.LargeListArray)):
                off = np.asarray(fl.offsets, dtype=np.int64)
                vals = np.asarray(fl.values, dtype=np.int64)
                # a sliced ListArray keeps the FULL child values with
                # shifted offsets — normalize to zero-based and trim
                vals = vals[off[0] : off[-1]]
                if off[0] != 0:
                    off = off - off[0]
                # null rows keep zero-length ranges (offsets repeat)
                return vals, off
            # fallback for exotic layouts: box per row
            vals, off = [], np.zeros(n + 1, dtype=np.int64)
            for i, row in enumerate(fl.to_pylist()):
                if row:
                    vals.extend(int(v) for v in row)
                off[i + 1] = len(vals)
            return np.asarray(vals, dtype=np.int64), off

        def row_slices(rb):
            """Split the batch so each slice's text payload stays small:
            the gather scratch is 4 B per clean-text byte (same bound as
            the window builder's flush cap)."""
            txt = rb.column(1)
            width = 8 if pa.types.is_large_string(txt.type) else 4
            obuf = txt.buffers()[1]
            if obuf is None:  # all-null column: no offsets to split on
                yield rb
                return
            off = np.frombuffer(
                obuf, dtype=np.int64 if width == 8 else np.int32,
                count=rb.num_rows + 1 + txt.offset,
            )[txt.offset :]
            cum = off - off[0]
            lo = 0
            while lo < rb.num_rows:
                hi = int(
                    np.searchsorted(cum, cum[lo] + (8 << 20), side="left")
                )
                hi = max(lo + 1, min(hi, rb.num_rows))
                yield rb.slice(lo, hi - lo)
                lo = hi

        def _one(rb):
            nrows = rb.num_rows
            ids_arr = rb.column(0)
            texts = rb.column(1).to_pylist()
            bufs = []
            ntok = np.zeros(nrows, dtype=np.int64)
            tok_off_parts = []
            byte_base = 0
            tok_base = np.zeros(nrows + 1, dtype=np.int64)
            for i, text in enumerate(texts):
                if text is None:
                    joined = ""
                else:
                    joined = sub(" ", text.strip(_STRIP))
                jb = joined.encode("utf-8")
                if jb:
                    arr = np.frombuffer(jb, dtype=np.uint8)
                    sp = np.flatnonzero(arr == 32)
                    nt = len(sp) + 1
                    # token i spans [off[i], off[i+1]) in jb + b" " —
                    # INCLUDING its trailing joiner/sentinel space
                    off = np.empty(nt + 1, dtype=np.int64)
                    off[0] = 0
                    off[1:-1] = sp + 1
                    off[-1] = len(jb) + 1
                    tok_off_parts.append(off + byte_base)
                    bufs.append(jb + b" ")
                    byte_base += len(jb) + 1
                    ntok[i] = nt
                tok_base[i + 1] = tok_base[i] + ntok[i]
            TOK = int(tok_base[-1])
            big = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            # global token spans (each includes its trailing space)
            if tok_off_parts:
                tok_starts = np.concatenate([p[:-1] for p in tok_off_parts])
                tok_ends = np.concatenate([p[1:] for p in tok_off_parts])
            else:
                tok_starts = np.empty(0, dtype=np.int64)
                tok_ends = np.empty(0, dtype=np.int64)

            fvals, foff = flag_lists(rb.column(2), nrows)
            alive = np.ones(TOK, dtype=bool)
            if len(fvals):
                frow_counts = np.diff(foff)
                frow = np.repeat(np.arange(nrows, dtype=np.int64), frow_counts)
                fn = ntok[frow]
                gs = np.minimum(fvals, fn) + tok_base[frow]
                ge = np.minimum(fvals + w, fn) + tok_base[frow]
                diff = np.zeros(TOK + 1, dtype=np.int64)
                np.add.at(diff, gs, 1)
                np.add.at(diff, ge, -1)
                alive = np.cumsum(diff[:TOK]) <= 0
            # kept-token count + clean byte length per doc (segment sums)
            cs_alive = np.zeros(TOK + 1, dtype=np.int64)
            np.cumsum(alive, out=cs_alive[1:])
            kc = cs_alive[tok_base[1:]] - cs_alive[tok_base[:-1]]
            tok_len = tok_ends - tok_starts
            contrib = np.where(alive, tok_len, 0)
            cs_len = np.zeros(TOK + 1, dtype=np.int64)
            np.cumsum(contrib, out=cs_len[1:])
            doc_len = cs_len[tok_base[1:]] - cs_len[tok_base[:-1]]
            doc_len = doc_len - (kc > 0)  # drop each doc's trailing space
            # gather surviving token bytes (doc order == token order)
            ks = tok_starts[alive]
            ke = tok_ends[alive].copy()
            lastk = np.cumsum(kc)
            sel = kc > 0
            ke[lastk[sel] - 1] -= 1  # trim the last kept token's space
            kl = ke - ks
            voff = np.zeros(len(ks) + 1, dtype=np.int64)
            np.cumsum(kl, out=voff[1:])
            # int32 gather index: 4 B scratch per clean-text byte,
            # bounded by row_slices' 8 MB text cap
            idx = np.arange(int(voff[-1]), dtype=np.int32) - np.repeat(
                (voff[:-1] - ks).astype(np.int32), kl
            )
            soff = np.zeros(nrows + 1, dtype=np.int64)
            np.cumsum(doc_len, out=soff[1:])
            cleans = pa.StringArray.from_buffers(
                nrows, pa.py_buffer(soff.astype(np.int32)), pa.py_buffer(big[idx])
            )
            return pa.RecordBatch.from_arrays(
                [
                    ids_arr,
                    cleans,
                    pa.array(ntok, type=pa.int64()),
                    pa.array(ntok - kc, type=pa.int64()),
                ],
                names=[id_col, "clean_text", "n_tokens", "n_removed"],
            )

        for whole in batches:
            if whole.num_rows == 0:
                yield _one(whole)
            else:
                yield from (_one(rb) for rb in row_slices(whole))

    return src.mapInArrow(rebuild, out_schema)
