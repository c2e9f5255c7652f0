"""BPE merge LEARNING (operators/textops.bpe_learn — Sennrich et al.
2016, the subword-nmt algorithm): distributed wordcount + driver-side
merge loop. Truth anchor: the paper's own corpus (low x5, lower x2,
newest x6, widest x3) with the merge sequence hand-derived from the
algorithm's algebra under the deterministic lexicographic tie-break
(the end-of-word marker fuses onto the last character, as in
subword-nmt's learn_bpe and this repo's bpe_encode)."""

from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.textops import bpe_learn, bpe_encode


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
EXPECTED_8 = [
    ("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w"),
    ("ew", "est</w>"), ("n", "ewest</w>"), ("lo", "w</w>"),
    ("d", "est</w>"),
]


def _corpus(spark):
    rows = [(i, " ".join([w] * n)) for i, (w, n) in enumerate(SENNRICH)]
    return spark.createDataFrame(rows, "id long, text string")


def test_sennrich_corpus_merge_sequence(spark):
    merges = bpe_learn(_corpus(spark), num_merges=8)
    assert merges == EXPECTED_8
    # asking for more merges than pairs exist terminates gracefully
    all_merges = bpe_learn(_corpus(spark), num_merges=10_000)
    assert all_merges[:8] == EXPECTED_8 and len(all_merges) < 50


def test_learned_merges_feed_bpe_encode(spark):
    merges = bpe_learn(_corpus(spark), num_merges=8)
    df = spark.createDataFrame([(1, "newest lowest")], "id long, text string")
    out = bpe_encode(df, merges).collect()[0]["bpe_tokens"]
    # newest -> single learned token; lowest -> lo w est</w> (no (lo,w)
    # merge within the first 8)
    assert out == ["newest</w>", "lo", "w", "est</w>"]


def test_corpus_scale_and_determinism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = bpe_learn(docs, num_merges=50, lowercase=True)
    m2 = bpe_learn(docs.repartition(7), num_merges=50, lowercase=True)
    assert m1 == m2 and len(m1) == 50  # partitioning-independent
    # every merge pair actually concatenates into a longer symbol
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in m1)
    enc = bpe_encode(docs.limit(20), m1, lowercase=True)
    assert enc.select(F.sum(F.size("bpe_tokens"))).first()[0] > 0


def test_script_profile_operator(spark):
    from duckdb_spatial_spark.operators.textops import script_profile

    df = spark.createDataFrame(
        [(0, "hello plain english text"),
         (1, "широкая электрификация"),
         (2, "天地玄黄 宇宙洪荒"),
         (3, None),
         (4, "12345 !!! ---")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in script_profile(df).collect()}
    assert rows[0]["script"] == "latin" and rows[0]["latin_ratio"] > 0.8
    assert rows[1]["script"] == "cyrillic"
    assert rows[2]["script"] == "cjk"
    assert rows[3]["script"] == "other"  # NULL text
    assert rows[4]["script"] == "other"  # digits/punct only
