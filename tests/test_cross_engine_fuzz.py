"""Cross-engine fuzz: the regex/unicode text operators claim their SQL
oracles reproduce them byte-for-byte. Feed both engines the same
adversarial random strings (PII-ish fragments, control chars, combining
accents, whitespace runs) in ONE batch and compare."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

FRAGMENTS = [
    "a@b.co", "x@y", "@", ".", "..", "1.2.3.4", "999.999.999.999", "1.2.3.4.5",
    "+12 345-6789", "+1", "-", "(555)", "café", "café", "é́",
    "\x07", "\x1f", "\x7f", "\t", "\n", "  ", "word", "user.name+tag@ex.ample.org",
    "10.0.0.", ".0.0.1", "a-b-c", "123-45-6789", "+  ", "é́",
]


def _random_text(rng, n_frags):
    return "".join(rng.choice(FRAGMENTS + [" ", ""]) for _ in range(n_frags))


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(20260814)
    return [(i, _random_text(rng, rng.randint(0, 25))) for i in range(300)]


def test_pii_scrub_matches_duckdb_on_fuzz(spark, corpus):
    from duckdb_spatial_spark.operators.pipeline import pii_scrub

    df = spark.createDataFrame(corpus, "i long, text string")
    got = {
        r["i"]: (r["clean_text"], r["n_redactions"]) for r in pii_scrub(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", corpus)
    want = {
        i: (c, n)
        for i, c, n in con.execute(
            r"""
            SELECT i,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                       '\+[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g'),
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                      + len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
                      + len(regexp_extract_all(text, '\+[0-9][0-9 ()-]{6,}[0-9]')) AS INT)
            FROM t
            """
        ).fetchall()
    }
    mismatches = [(i, got[i], want[i]) for i in want if got[i] != want[i]]
    assert not mismatches, mismatches[:5]


def test_text_normalize_matches_duckdb_on_fuzz(spark, corpus):
    from duckdb_spatial_spark.operators.textops import text_normalize

    df = spark.createDataFrame(corpus, "i long, text string")
    got = {r["i"]: r["norm_text"] for r in text_normalize(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", corpus)
    want = dict(
        con.execute(
            r"""
            SELECT i, trim(regexp_replace(regexp_replace(nfc_normalize(text),
                       '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                       '[ \t]+', ' ', 'g'), ' ')
            FROM t
            """
        ).fetchall()
    )
    mismatches = [(i, repr(got[i]), repr(want[i])) for i in want if got[i] != want[i]]
    assert not mismatches, mismatches[:5]


TEXT_FRAGMENTS = [
    "a b", "a b a b", "c", "word word word", "x\xa0y", "line one",
    "\t", " ", "\x0b", "tab\there", ". . .", "dup dup dup dup dup",
    "the quick fox", "é é é", "",
]


def _random_doc(rng):
    return "\n".join(
        rng.choice(TEXT_FRAGMENTS) for _ in range(rng.randint(0, 8))
    )


@pytest.fixture(scope="module")
def doc_corpus():
    rng = random.Random(99)
    return [(i, _random_doc(rng)) for i in range(200)]


def _oracle_rows(sql, corpus):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", corpus)
    return con.execute(sql.replace("FROM documents", "FROM t")).fetchall()


def test_gopher_matches_duckdb_on_fuzz(spark, doc_corpus):
    import __spark_entry__ as E

    from duckdb_spatial_spark.operators.pipeline import gopher_repetition

    df = spark.createDataFrame(doc_corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["dup_line_frac"], r["dup_line_char_frac"],
            r["top_2gram_char_frac"], r["top_3gram_char_frac"],
            r["dup_5gram_char_frac"], r["gopher_pass"],
        )
        for r in gopher_repetition(df).collect()
    }
    want = {r[0]: tuple(r[1:]) for r in _oracle_rows(E.oracle_sql()["gopher_quality"], doc_corpus)}
    mismatches = [(i, got[i], want[i]) for i in want if got[i] != want[i]]
    assert not mismatches, mismatches[:5]


def test_dedup_lines_matches_duckdb_on_fuzz(spark, doc_corpus):
    import __spark_entry__ as E

    from duckdb_spatial_spark.operators.pipeline import dedup_lines

    df = spark.createDataFrame(doc_corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in dedup_lines(df).collect()
    }
    want = {r[0]: tuple(r[1:]) for r in _oracle_rows(E.oracle_sql()["dedup_lines"], doc_corpus)}
    mismatches = [(i, got[i], want[i]) for i in want if got[i] != want[i]]
    assert not mismatches, mismatches[:3]
