"""Parity pin for the streaming MinHash signature kernel.

``operators.dedup.poly131_sigs_batch`` (the numpy row-local kernel
behind ``streaming_minhash_probe``) must reproduce the batch
``minhash_signature(..., hash_fn=poly131)`` Column lane bit-for-bit —
otherwise stream signatures silently diverge from the persistent index
and near-dup / decontamination matches drop. The r14 advisory named two
divergences (Unicode-\\s tokenization, short-doc handling); this test
pins both plus the astral-plane code-point hashing edge.
"""

import random

from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.dedup import (
    _INDEX_HASHES,
    minhash_signature,
    poly131_sigs_batch,
)

# hand-picked adversarial docs: NBSP / thin-space / ideographic-space
# inside would-be token gaps (Java \s+ does NOT split there), short docs
# (< n tokens -> no signature), ASCII controls that ARE \s, case folds,
# repeated shingles, and an astral-plane char (UTF-16 surrogate pair)
ADVERSARIAL = [
    "alpha beta gamma delta epsilon",
    "alpha beta gamma delta epsilon",          # NBSP glues tokens
    "a b c　d e f g",                       # thin + ideographic space
    "one two",                                        # 0 < tokens < n
    "single",                                         # 1 token
    "",                                               # no tokens
    "   \t \r\n  ",                                   # ASCII ws only
    "MiXeD CaSe TOKENS here YES",
    "dup dup dup dup dup dup",                        # repeated shingle
    "tab\tsep\nnewline\x0bvt\ffeed\rcr end pad pad",
    "astral \U0001d11e clef music notes here",        # surrogate pair
    "ß strasse STRASSE İ istanbul casefold",
    None,
]


def _batch_sigs(spark, texts, n, num_hashes):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signature(
        df, "doc_id", "text", n=n, num_hashes=num_hashes,
        hash_fn=_INDEX_HASHES["poly131"],
    ).collect()
    return {r["_id"]: list(r["_sig"]) for r in sigs}


def _check(spark, texts, n, num_hashes):
    got = poly131_sigs_batch(texts, n, num_hashes)
    want = _batch_sigs(spark, texts, n, num_hashes)
    for i, t in enumerate(texts):
        if i in want:
            assert got[i] == want[i], (n, num_hashes, t)
        else:
            # batch lane dropped the doc (null / no shingles) -> kernel None
            assert got[i] is None, (n, num_hashes, t)


def test_adversarial_corpus_parity(spark):
    _check(spark, ADVERSARIAL, n=3, num_hashes=8)


def test_unigram_and_wide_signature_parity(spark):
    _check(spark, ADVERSARIAL, n=1, num_hashes=16)
    _check(spark, ADVERSARIAL[:6], n=2, num_hashes=64)


def test_fuzz_parity(spark):
    rng = random.Random(1511)
    # BMP-heavy alphabet with every divergence class represented
    alphabet = (
        "ab z09._-?!\t\n\r\x0b\f "
        "  　éİß中\U0001f600"
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(80)
    ]
    _check(spark, texts, n=3, num_hashes=8)


def test_streaming_probe_matches_nbsp_doc(spark, tmp_path):
    """End-to-end advisory scenario: a doc whose only whitespace quirk is
    an interior NBSP must still match its exact copy through the stream."""
    from duckdb_spatial_spark.operators.dedup import minhash_index_build
    from duckdb_spatial_spark.streaming import streaming_minhash_probe

    doc = "alpha beta gamma delta epsilon zeta eta theta"
    base = spark.createDataFrame(
        [(1, doc), (2, "other words entirely unrelated to the first doc")],
        "doc_id long, text string")
    idx = str(tmp_path / "mh_nbsp")
    minhash_index_build(base, idx, num_hashes=8, bands=4, hash="poly131")
    probe = spark.createDataFrame([(100, doc)], "doc_id long, text string")
    qsrc = str(tmp_path / "probe_nbsp")
    probe.write.parquet(qsrc)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(qsrc)
    out = streaming_minhash_probe(stream, idx, threshold=0.99)
    q = (out.writeStream.format("memory").queryName("mhprobe_nbsp")
         .outputMode("complete").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    rows = spark.table("mhprobe_nbsp").collect()
    assert len(rows) == 1 and rows[0].query_id == 100
    assert [m.index_id for m in rows[0].matches] == [1]
    assert rows[0].matches[0].est_jaccard == 1.0
