"""Text analysis operators for training-data pipelines.

All built-in Column expressions (codegen'd) except the winnowing
fingerprint, which is a vectorized pandas UDF. Designed to run as one
projection pass over a 100 TB documents table — no shuffles, no UDF in the
common metrics.

  token_count      whitespace tokenization + a BPE-ish subword estimate
  quality_score    length / punctuation / stopword / repetition heuristics
  lang_id          stopword-profile n-gram heuristic (en/de/fr/es/it/pt)
  fingerprint      xxhash64 content fingerprint + winnowing rolling-hash
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._ascii import ws_split as _ascii_ws_split

_STOPWORDS = {
    "en": "the of and to in a is that it was for on are with as be at by this have from or had not but what all were when we there can an your which their".split(),
    "de": "der die das und zu in den von ist des sich mit dem dass er es ein ich auf so eine auch als an nach wie im für".split(),
    "fr": "le la les de des et un une du en est que qui dans pour sur au avec ne se ce pas par il elle vous nous".split(),
    "es": "el la los las de del y un una en es que se no por con para su al lo como más pero sus le ya o".split(),
    "it": "il la i le di e un una in è che non per con si da come dei sono della questo ma anche più".split(),
    "pt": "o a os as de do da e um uma em é que não se por com para seu ao os como mais mas foi são".split(),
}


def _trimmed(c) -> "F.Column":
    """ASCII-\\s-trimmed text (F.trim only strips spaces)."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def token_count(text_col) -> "F.Column":
    """Whitespace token count — pure codegen Column (split + size; the
    F.filter HOF this used to carry is CodegenFallback, interpreted per
    element — repo perf rule)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = _trimmed(c)
    # split of a trimmed non-empty string on \s+ yields no empty tokens;
    # the empty string is the one case where split returns [""]
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def _token_regex(words) -> str:
    """Whole-token alternation: matches any of ``words`` exactly where a
    \\s+ tokenizer would produce it as a full token (string edges or ASCII
    whitespace on both sides, via zero-width lookarounds so adjacent
    matches like 'of the' both count). Entries containing whitespace can
    never equal a single token — dropped, preserving set-membership
    semantics."""
    import re as _re

    alts = "|".join(
        _re.escape(w) for w in words if w and not _WS_ANY.search(w)
    )
    if not alts:
        return r"(?!)"  # never matches (all entries contained whitespace)
    return r"(?:^|(?<=\s))(?:" + alts + r")(?=\s|$)"


import re as _re_mod

_WS_ANY = _re_mod.compile(r"[ \t\n\r\f\x0b]")


def _token_hits(lowered, words) -> "F.Column":
    """Count of tokens ∈ ``words`` — ONE codegen'd regexp pass over the
    string instead of tokenize + per-element array_contains (the
    CodegenFallback HOF shape this family used to share)."""
    return F.size(F.regexp_extract_all(lowered, F.lit(_token_regex(words)), 0))


_SUBWORD_SPLIT = _re_mod.compile(
    r"\s+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=\d)|(?<=\d)(?=[A-Za-z])|[^A-Za-z0-9]+"
)


@F.pandas_udf(T.IntegerType())
def _subword_count_udf(s: pd.Series) -> pd.Series:
    out = []
    for t in s:
        if t is None:
            out.append(None)
            continue
        out.append(
            sum(-(-len(w) // 6) for w in _SUBWORD_SPLIT.split(str(t)) if w)
        )
    return pd.Series(out, dtype="object")


def subword_count(text_col) -> "F.Column":
    """BPE-ish subword estimate: split on whitespace AND on common subword
    boundaries (non-alnum, case changes, digit runs); long words count as
    ceil(len/6) subwords (empirical BPE density). Arrow-batched pandas UDF
    — the F.aggregate HOF this used to carry is CodegenFallback,
    interpreted per array element (repo perf rule)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _subword_count_udf(c)


def text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One projection adding the standard quality-signal columns.

    All codegen Columns: token counts via split+size, stopword hits via a
    single whole-token regexp_extract_all (no CodegenFallback HOFs in the
    plan — this family used to tokenize with F.filter per metric)."""
    c = F.col(text_col)
    low = F.lower(c)
    n_tok = token_count(c)
    n_chars = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
    spaces = F.length(F.regexp_replace(c, r"[^\s]", ""))
    n_stop = _token_hits(low, _STOPWORDS["en"])
    lt = _trimmed(low)
    uniq = F.when(lt == "", F.lit(0)).otherwise(
        F.size(F.array_distinct(F.split(lt, r"\s+")))
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("avg_word_len", F.when(n_tok > 0, (n_chars - spaces) / n_tok))
        .withColumn("alpha_ratio", F.when(n_chars > 0, alpha / n_chars))
        .withColumn("digit_ratio", F.when(n_chars > 0, digits / n_chars))
        .withColumn("punct_ratio", F.when(n_chars > 0, punct / n_chars))
        .withColumn("stopword_ratio", F.when(n_tok > 0, n_stop / n_tok))
        .withColumn("unique_ratio", F.when(n_tok > 0, uniq / n_tok))
    )


def quality_score(df: DataFrame, text_col: str = "text", out_col: str = "quality") -> DataFrame:
    """Composite [0,1] quality heuristic (Gopher/C4-style filters folded
    into one score): penalize too-short/too-long docs, low alpha ratio,
    low stopword ratio, heavy repetition."""
    m = text_metrics(df, text_col)
    len_score = F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * F.when(
        F.col("n_tokens") > 100_000, 0.5
    ).otherwise(1.0)
    alpha_score = F.least(F.coalesce(F.col("alpha_ratio"), F.lit(0.0)) / 0.7, F.lit(1.0))
    stop_score = F.least(F.coalesce(F.col("stopword_ratio"), F.lit(0.0)) / 0.2, F.lit(1.0))
    rep_score = F.coalesce(F.col("unique_ratio"), F.lit(0.0))
    score = F.round(
        (len_score * 0.25 + alpha_score * 0.25 + stop_score * 0.25 + rep_score * 0.25), 6
    )
    return m.withColumn(out_col, score)


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Language ID by stopword-profile hit rate — one whole-token
    regexp_extract_all per language (codegen'd; the tokenize +
    array_contains HOF chain this carried was CodegenFallback), argmax
    via greatest(); no UDF, no shuffle."""
    low = F.lower(F.col(text_col))
    n = F.greatest(token_count(F.col(text_col)), F.lit(1))
    scores = {}
    for lang, words in _STOPWORDS.items():
        scores[lang] = (_token_hits(low, words) / n).alias(f"_sc_{lang}")
    out = df
    for lang in scores:
        out = out.withColumn(f"_sc_{lang}", scores[lang])
    best = F.greatest(*[F.col(f"_sc_{lang}") for lang in _STOPWORDS])
    pred = F.lit("und")
    for lang in _STOPWORDS:
        pred = F.when((F.col(f"_sc_{lang}") == best) & (best > 0.02), F.lit(lang)).otherwise(pred)
    out = out.withColumn(out_col, pred)
    return out.drop(*[f"_sc_{lang}" for lang in _STOPWORDS])


def wordlist_filter(
    df: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    max_ratio: float = 0.1,
) -> DataFrame:
    """Blocklist-based content filter (the C4 badwords pass).

    Adds ``block_count`` (blocklisted-token occurrences), ``block_ratio``
    (rounded to 6 — the keep decision is made from the ROUNDED value on
    both engines, repo float-parity rule) and ``keep_doc``. Tokens are
    lowercased whitespace words; the blocklist is compared lowercased.

    Scale shape: a pure Column projection like ``text_metrics`` — no
    shuffle, no UDF, no CodegenFallback HOF: blocklist hits are ONE
    codegen'd whole-token regexp_extract_all pass (the old tokenize +
    per-token array_contains chain was interpreted per element). The
    blocklist compiles into the regex alternation (bounded — for
    10k+-term lists, switch to a broadcast join on exploded tokens).
    """
    words = sorted({w.lower() for w in blocklist if w})
    if not words:
        raise ValueError("wordlist_filter: empty blocklist")
    c = F.col(text_col)
    n_block = _token_hits(F.lower(c), words)
    ratio = F.round(n_block / F.greatest(token_count(c), F.lit(1)), 6)
    return (
        df.withColumn("block_count", n_block)
        .withColumn("block_ratio", ratio)
        .withColumn("keep_doc", F.col("block_ratio") <= F.lit(float(max_ratio)))
    )


# Unicode script ranges as EXPLICIT BMP codepoint classes — spelled out
# rather than \p{Script=...} because Java and RE2 name script properties
# differently (repo cross-engine regex rule), while literal ranges mean
# the same thing in both engines. Astral-plane CJK (ext. B+) is outside
# the BMP and not counted; documented scope.
_SCRIPT_RANGES = {
    "latin": "[A-Za-z\\u00C0-\\u024F]",
    "cyrillic": "[\\u0400-\\u04FF\\u0500-\\u052F]",
    "greek": "[\\u0370-\\u03FF]",
    "arabic": "[\\u0600-\\u06FF\\u0750-\\u077F]",
    "hebrew": "[\\u0590-\\u05FF]",
    "devanagari": "[\\u0900-\\u097F]",
    "cjk": "[\\u4E00-\\u9FFF\\u3400-\\u4DBF]",
    "hiragana_katakana": "[\\u3040-\\u30FF]",
    "hangul": "[\\uAC00-\\uD7AF\\u1100-\\u11FF]",
}


def script_profile(
    df: DataFrame, text_col: str = "text", dominant_col: str = "script"
) -> DataFrame:
    """Writing-system detection for corpus routing (the filter that runs
    BEFORE language ID in multilingual pipelines: scripts partition
    cleanly where languages need models). Adds one ``<name>_ratio``
    column per script in ``_SCRIPT_RANGES`` (count of codepoints in the
    script's BMP ranges / total codepoints, rounded to 6) and a
    ``script`` column: the arg-max script when its ratio clears 0.30,
    else 'other' (ties break alphabetically, decided on the ROUNDED
    ratios — dual-engine float rule).

    Scale shape: one pure-Column projection, one codegen'd
    ``regexp_count`` per script, no Python, no shuffle — the same
    JVM-side pattern as token_count/lang_id/bm25."""
    c = F.col(text_col)
    n = F.greatest(F.length(c), F.lit(1))
    out = df
    names = sorted(_SCRIPT_RANGES)
    for name in names:
        out = out.withColumn(
            f"{name}_ratio",
            F.round(
                F.regexp_count(F.coalesce(c, F.lit("")), F.lit(_SCRIPT_RANGES[name])) / n, 6
            ),
        )
    best = F.greatest(*[F.col(f"{s}_ratio") for s in names])
    pred = F.lit("other")
    # reverse order so earlier (alphabetical) names win exact ties
    for name in reversed(names):
        pred = F.when(
            (F.col(f"{name}_ratio") == best) & (best >= 0.30), F.lit(name)
        ).otherwise(pred)
    return out.withColumn(dominant_col, pred)


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Exact content fingerprint: xxhash64 of whitespace-normalized,
    lowercased text — the dedup_exact key at web scale."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.xxhash64(norm))


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 9, window: int = 20
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    rolling k-gram hashes, min per window -> sparse fingerprint set.
    Returns (id, fingerprint) exploded rows; join on fingerprint to find
    partial overlaps (plagiarism-style near-dup)."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("fingerprint", T.LongType()),
        ]
    )
    kk, ww = int(k), int(window)

    def winnow(batches):
        B = np.uint64(1000003)
        # B^(k-1-t) weights for the closed-form k-term Horner sum; uint64
        # wraparound IS the modulus, so build the powers under wraparound too
        with np.errstate(over="ignore"):
            pows = np.ones(kk, dtype=np.uint64)
            for i in range(1, kk):
                pows[i] = pows[i - 1] * B
            weights = pows[::-1].copy()  # weights[t] = B^(k-1-t)
        for pdf in batches:
            ids_out, fps_out = [], []
            for did, text in zip(pdf["_id"], pdf["_t"]):
                if text is None:
                    continue
                data = np.frombuffer(
                    " ".join(_ascii_ws_split(str(text).lower())).encode("utf-8", "ignore"), dtype=np.uint8
                ).astype(np.uint64)
                n = len(data)
                if n < kk:
                    continue
                # polynomial hash of every k-gram as the closed-form sum
                # h[j] = Σ_t data[j+t]·B^(k-1-t): k fully-vectorized
                # multiply-adds instead of a per-byte Python recurrence;
                # identical values mod 2^64 (wraparound commutes)
                m = n - kk + 1
                h = np.zeros(m, dtype=np.uint64)
                with np.errstate(over="ignore"):
                    for t in range(kk):
                        h += data[t : t + m] * weights[t]
                m = len(h)
                if m <= ww:
                    # .astype, not int(): a uint64 min >= 2^63 must wrap to
                    # the signed fingerprint, not overflow the int64 Series
                    sel = {int(h.min().astype(np.int64))}
                else:
                    view = np.lib.stride_tricks.sliding_window_view(h, ww)
                    sel = set(view.min(axis=1).astype(np.int64).tolist())
                ids_out.extend([did] * len(sel))
                fps_out.extend(sel)
            yield pd.DataFrame({"id": pd.Series(ids_out, dtype="int64"), "fingerprint": pd.Series(fps_out, dtype="int64")})

    return df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")).mapInPandas(
        winnow, out_schema
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    ndigits: int = 4,
) -> DataFrame:
    """Okapi BM25 keyword scoring, top-k documents for a query string.

    The lexical-search complement to the ANN/cosine lanes: terms are
    lowercase whitespace tokens; idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
    Returns (id, score, rank), score rounded to ``ndigits``.

    Scale shape (one shuffle total, and it carries ONE row): the
    per-document projection (_dl, tf per query term) is PURE codegen —
    one whole-token ``regexp_count`` Column per query term inside a
    single wide projection (the query-term set is small and fixed; the
    same JVM-side move that took token_count/lang_id off Python) — no
    explode, no (doc, term) exchange, no Python in the scan.
    ``regexp_count`` measured fastest of three kernels at the 50k-doc
    tier (0.29 s vs 0.36 s extract_all+split, 0.38 s Arrow-batched C
    string ops): it walks the regex without materializing a match
    array, so the projection adds ~0.05 s over the bare text scan.
    Corpus stats (N, avgdl, per-term df) are ONE global aggregate
    broadcast back into a pure-Column scoring projection, then
    TakeOrderedAndProject top-k. The narrow tf projection is persisted
    (MEMORY_AND_DISK) so the stats and scoring branches share one text
    scan — DuckDB materializes the same CTE once.
    """
    terms = [t for t in dict.fromkeys(_ascii_ws_split(query.lower())) if t]
    if not terms:
        raise ValueError("bm25_topk: empty query")
    nt = len(terms)

    from pyspark import StorageLevel

    # null text scores as the empty document (dl=0, tf=0), matching the
    # oracle's coalesce — and Java \s is the same ASCII class the old
    # pandas pattern spelled out ([ \t\n\x0B\f\r])
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.regexp_count(low, F.lit(r"\S+")).cast("long").alias("_dl"),
            *[
                F.regexp_count(low, F.lit(_token_regex([t])))
                .cast("long")
                .alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ],
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # corpus stats: ONE map-side-combined global aggregate (df per term =
    # docs with tf>0), broadcast into the scoring projection
    aggs = [
        F.count("*").cast("double").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    ] + [
        F.sum((F.col(f"_tf{i}") > 0).cast("long")).cast("double").alias(f"_df{i}")
        for i in range(nt)
    ]
    stats = base.agg(*aggs)
    total = F.lit(0.0)
    for i in range(nt):
        tf = F.col(f"_tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        )
        total = total + F.when(
            tf > 0,
            idf * (tf * (k1 + 1.0)
                   / (tf + k1 * ((1.0 - b) + b * F.col("_dl") / F.col("_avgdl")))),
        ).otherwise(F.lit(0.0))
    hit = (
        F.greatest(*[F.col(f"_tf{i}") for i in range(nt)]) > 0
        if nt > 1 else F.col("_tf0") > 0
    )
    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(hit)
        .select("_id", F.round(total, ndigits).alias("score"))
    )
    from pyspark.sql import Window

    # orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k,
    # then a k-row merge on the driver) — no single-task global sort; the
    # rank window then runs over at most k rows
    top = scored.orderBy(F.col("score").desc(), F.col("_id").asc()).limit(int(k))
    w = Window.orderBy(F.col("score").desc(), F.col("_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("_id").alias(id_col), "score", "rank"
    )


def text_normalize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    form: str = "NFC",
    strip_control: bool = True,
    squish_whitespace: bool = True,
) -> DataFrame:
    """Unicode normalization + cleanup for ingestion pipelines:
    canonical composition (NFC by default - 'e' + U+0301 becomes the
    single codepoint), C0 control characters stripped (tab/newline/CR
    kept), horizontal whitespace runs squished to one space and the
    string trimmed. Each step is defined by an ASCII-exact regex or the
    Unicode standard itself, so a plain-SQL oracle (DuckDB
    nfc_normalize + regexp_replace) reproduces the output
    byte-for-byte. Arrow-batched pandas UDF, zero shuffles."""
    import re as _re
    import unicodedata

    ctrl = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    ws = _re.compile(r"[ \t]+")

    @F.pandas_udf(T.StringType())
    def norm(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            t = unicodedata.normalize(form, str(t))
            if strip_control:
                t = ctrl.sub("", t)
            if squish_whitespace:
                t = ws.sub(" ", t).strip(" ")
            out.append(t)
        return pd.Series(out)

    return df.withColumn(out_col, norm(F.col(text_col)))


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-wide lowercase word n-gram frequencies (vocabulary
    building, boilerplate discovery): (gram, count, doc_freq) for grams
    appearing at least ``min_count`` times in total.

    Scale: ONE Arrow-batched pass tokenizes each doc and emits
    (gram, first-occurrence-in-doc) rows; ONE shuffle keys on the gram
    with MAP-SIDE-COMBINED count + doc_freq partials, so a boilerplate
    gram occurring 100M times ships one partial row per map task, not
    100M rows."""
    nn = int(n)
    out_schema = T.StructType(
        [T.StructField("gram", T.StringType()), T.StructField("first", T.BooleanType())]
    )

    def emit(batches):
        for pdf in batches:
            grams, firsts = [], []
            for t in pdf["_t"]:
                if t is None:
                    continue
                w = _ascii_ws_split(str(t).lower())
                gs = w if nn <= 1 else (
                    [" ".join(w[i : i + nn]) for i in range(len(w) - nn + 1)]
                    if len(w) >= nn
                    else []
                )
                seen = set()
                for g in gs:
                    grams.append(g)
                    firsts.append(g not in seen)
                    seen.add(g)
            yield pd.DataFrame({"gram": grams, "first": firsts})

    occ = df.select(F.col(text_col).alias("_t")).mapInPandas(emit, out_schema)
    return (
        occ.groupBy("gram")
        .agg(
            F.count("*").alias("count"),
            F.sum(F.when(F.col("first"), 1).otherwise(0)).alias("doc_freq"),
        )
        .filter(F.col("count") >= int(min_count))
    )


def url_canonicalize(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Canonical URL form for web-scale dedup (the URL-level pass that
    precedes content dedup in CommonCrawl-style pipelines). Exact spec —
    deliberately regular so a SQL oracle can replicate it verbatim:

      1. trim ASCII whitespace
      2. only http/https URLs are canonicalized; anything else passes
         through trimmed
      3. scheme and host lowercase; leading ``www.`` stripped; default
         port stripped (``:80`` for http, ``:443`` for https)
      4. fragment dropped
      5. path: trailing slashes removed (so ``/a/`` == ``/a``, and a
         bare host equals host + ``/``)
      6. query: parameters split on ``&``; empties and ``utm_*`` tracking
         params dropped; the rest sorted lexicographically and rejoined

    Arrow-batched plain string ops (no urllib — its quirks are not
    SQL-replicable)."""

    @F.pandas_udf(T.StringType())
    def canon(s: pd.Series) -> pd.Series:
        out = []
        for u in s:
            if u is None:
                out.append(None)
                continue
            u = str(u).strip(" \t\n\r\f\x0b")
            low = u.lower()
            if low.startswith("http://"):
                scheme, rest = "http", u[7:]
            elif low.startswith("https://"):
                scheme, rest = "https", u[8:]
            else:
                out.append(u)
                continue
            cut = len(rest)
            for ch in "/?#":
                p = rest.find(ch)
                if p != -1:
                    cut = min(cut, p)
            host, tail = rest[:cut].lower(), rest[cut:]
            if host.startswith("www."):
                host = host[4:]
            if scheme == "http" and host.endswith(":80"):
                host = host[:-3]
            elif scheme == "https" and host.endswith(":443"):
                host = host[:-4]
            tail = tail.split("#", 1)[0]
            if "?" in tail:
                path, query = tail.split("?", 1)
            else:
                path, query = tail, ""
            path = path.rstrip("/")
            params = sorted(
                t for t in query.split("&") if t and not t.startswith("utm_")
            )
            q = "&".join(params)
            out.append(scheme + "://" + host + path + ("?" + q if q else ""))
        return pd.Series(out)

    return df.withColumn(out_col, canon(F.col(url_col)))


def bpe_encode(
    df: DataFrame,
    merges,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = False,
    end_of_word: str = "</w>",
) -> DataFrame:
    """Apply a byte-pair-encoding merge table (the standard subword
    tokenization of LLM training data; Sennrich et al. 2016, the GPT-2
    greedy variant): words are ASCII-whitespace tokens, each starts as its
    character sequence + ``end_of_word``, then the lowest-rank applicable
    merge is applied repeatedly. ``merges`` is an ordered list of
    ``(left, right)`` pairs — earlier = higher priority, exactly a
    ``merges.txt``. Returns an array<string> token column.

    Scale shape: the merge table broadcasts (it is vocab-sized); encoding
    is one Arrow-batched projection, no shuffle. Per-word results are
    memoized per batch (Zipf makes the hit rate high)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(ranks)
    eow = end_of_word

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(s: pd.Series) -> pd.Series:
        R = bc.value
        cache: dict = {}

        def enc_word(w: str):
            hit = cache.get(w)
            if hit is not None:
                return hit
            parts = list(w)
            if not parts:
                return []
            parts[-1] = parts[-1] + eow
            while len(parts) > 1:
                best, best_i = None, -1
                for i in range(len(parts) - 1):
                    r = R.get((parts[i], parts[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, best_i = r, i
                if best is None:
                    break
                parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
            cache[w] = parts
            return parts

        out = []
        for text in s:
            if text is None:
                out.append(None)
                continue
            t = str(text).lower() if lowercase else str(text)
            toks: list = []
            for w in _ascii_ws_split(t):
                toks.extend(enc_word(w))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    lowercase: bool = False,
    end_of_word: str = "</w>",
    max_vocab_words: int = 5_000_000,
) -> list:
    """LEARN a byte-pair-encoding merge table from a corpus (tokenizer
    training; Sennrich et al. 2016 — the algorithm subword-nmt ships).
    Returns an ordered list of ``(left, right)`` merges, consumable by
    :func:`bpe_encode` directly (a ``merges.txt``).

    Spark-first shape: BPE learns from WORD FREQUENCIES, not the raw
    corpus, so the distributed part is ONE map-side-combined wordcount
    shuffle; the frequency table (vocabulary-sized — Zipf makes it tiny
    next to the corpus, guarded by ``max_vocab_words``) collects to the
    driver where the classic merge loop runs: count adjacent symbol
    pairs weighted by word frequency, merge the most frequent pair
    (ties break lexicographically so the result is deterministic and
    engine-neutral), repeat. Each merge touches only words containing
    the pair (an inverted index, the standard optimization), so
    training 10k merges over a million-word vocab stays driver-cheap
    while the corpus scan stays distributed."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    toks = F.explode(F.split(_trimmed(c), r"\s+")).alias("w")
    freqs = (
        df.select(toks)
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    rows = freqs.limit(int(max_vocab_words) + 1).collect()
    if len(rows) > max_vocab_words:
        raise ValueError(
            f"bpe_learn: corpus has more than max_vocab_words="
            f"{max_vocab_words} distinct words; raise the cap (the freq "
            "table is driver-collected) or pre-truncate the vocabulary"
        )
    # word -> symbol tuple; deterministic iteration order (sorted words)
    words: dict = {}
    for r in sorted(rows, key=lambda r: r["w"]):
        seq = tuple(r["w"])
        if not seq:
            continue
        seq = seq[:-1] + (seq[-1] + end_of_word,)
        words[seq] = words.get(seq, 0) + int(r["n"])
    # pair counts + inverted index pair -> words containing it
    from collections import defaultdict

    pair_n: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for seq, n in words.items():
        for i in range(len(seq) - 1):
            pair_n[(seq[i], seq[i + 1])] += n
            pair_words[(seq[i], seq[i + 1])].add(seq)
    merges = []
    for _ in range(int(num_merges)):
        if not pair_n:
            break
        # max count, ties to the lexicographically smallest pair
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_n[best] < 1:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for seq in list(pair_words[best]):
            n = words.pop(seq, None)
            if n is None:
                continue
            # remove old pair contributions
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_n[p] -= n
                if pair_n[p] <= 0:
                    pair_n.pop(p, None)
                pw = pair_words.get(p)
                if pw is not None:
                    pw.discard(seq)
                    if not pw:
                        pair_words.pop(p, None)
            # apply the merge left-to-right
            out = []
            i = 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new = tuple(out)
            words[new] = words.get(new, 0) + n
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_n[p] += n
                pair_words[p].add(new)
    return merges


def bpe_token_count(
    df: DataFrame,
    merges,
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    **kw,
) -> DataFrame:
    """Token-budget accounting: exact BPE token count per document."""
    tmp = "_bpe_seq_"
    out = bpe_encode(df, merges, text_col=text_col, out_col=tmp, **kw)
    return out.withColumn(out_col, F.size(F.col(tmp))).drop(tmp)


def text_entropy(
    df: "DataFrame", id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """Character- and token-level Shannon entropy per document (nats) —
    the low-entropy signal quality pipelines use to flag boilerplate /
    repeated-template pages (the compression-ratio heuristic's exact
    cousin, but engine-neutral so a plain-SQL oracle can recompute it).

    entropy = -sum over distinct units of p * ln(p), p = count/total;
    units are Unicode codepoints (char_entropy) and ASCII-whitespace
    tokens (token_entropy). Empty/NULL text scores 0 with zero counts.

    One Arrow pass, zero shuffles (Counter work is C-level dict ops);
    both entropies rounded to 6 decimals (dual-engine float rule — the
    summation order over distinct units differs between engines)."""
    import math as _math

    from collections import Counter as _Counter

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_chars_e", T.LongType()),
            T.StructField("char_entropy", T.DoubleType()),
            T.StructField("n_tokens_e", T.LongType()),
            T.StructField("token_entropy", T.DoubleType()),
        ]
    )
    ii = df.columns.index(id_col)
    ti = df.columns.index(text_col)

    def _h(counts: dict, total: int) -> float:
        if total == 0:
            return 0.0
        s = 0.0
        for c in counts.values():
            p = c / total
            s -= p * _math.log(p)
        return _math.floor(s * 1e6 + 0.5) / 1e6

    def gen(batches):
        for pdf in batches:
            ids, ncs, ces, nts, tes = [], [], [], [], []
            for did, text in zip(pdf.iloc[:, ii], pdf.iloc[:, ti]):
                s = "" if text is None else str(text)
                chars = _Counter(s)
                toks = _Counter(_ascii_ws_split(s))
                n_c = len(s)
                n_t = sum(toks.values())
                ids.append(did)
                ncs.append(n_c)
                ces.append(_h(chars, n_c))
                nts.append(n_t)
                tes.append(_h(toks, n_t))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids),
                    "n_chars_e": pd.Series(ncs, dtype="int64"),
                    "char_entropy": pd.Series(ces, dtype="float64"),
                    "n_tokens_e": pd.Series(nts, dtype="int64"),
                    "token_entropy": pd.Series(tes, dtype="float64"),
                }
            )

    return df.mapInPandas(gen, out_schema)
