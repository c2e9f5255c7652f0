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


def test_url_canonicalize_matches_duckdb_on_fuzz(spark):
    """Fuzz the URL canonicalizer against an INDEPENDENT DuckDB SQL
    implementation of the same documented spec (trim / scheme+host
    lowering / www + default-port strip / fragment + utm_* drop /
    trailing-slash removal / param sort)."""
    from duckdb_spatial_spark.operators.textops import url_canonicalize

    rng = random.Random(77)
    schemes = ["http://", "HTTP://", "https://", "HtTpS://", "ftp://", ""]
    hosts = ["Example.COM", "www.Site.org", "WWW.X.NET", "a.b.c.io", "h0st"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a/b/", "/a//", "/p.q"]
    queries = ["", "?", "?a=1", "?b=2&a=1", "?utm_source=x&a=1", "?z=9&y=8&utm_c=1&"]
    frags = ["", "#f", "#a/b?c"]
    pads = ["", " ", "\t", "  \n"]
    urls = []
    for _ in range(300):
        urls.append(
            rng.choice(pads) + rng.choice(schemes) + rng.choice(hosts)
            + rng.choice(ports) + rng.choice(paths) + rng.choice(queries)
            + rng.choice(frags) + rng.choice(pads)
        )
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, url string")
    got = {r.id: r.canonical_url for r in url_canonicalize(df, "url").collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE u (id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", list(enumerate(urls)))
    sql = r"""
    WITH t AS (
      SELECT id, trim(url, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) AS s
      FROM u
    ), p AS (
      SELECT id, s,
        CASE WHEN lower(s) LIKE 'https://%' THEN 'https'
             WHEN lower(s) LIKE 'http://%' THEN 'http' END AS scheme,
        CASE WHEN lower(s) LIKE 'https://%' THEN s[9:]
             WHEN lower(s) LIKE 'http://%' THEN s[8:] END AS rest
      FROM t
    ), q AS (
      SELECT id, s, scheme,
        lower(regexp_extract(rest, '^([^/?#]*)', 1)) AS hostport,
        rest[len(regexp_extract(rest, '^([^/?#]*)', 1)) + 1:] AS tail
      FROM p
    ), r AS (
      SELECT id, s, scheme,
        CASE WHEN scheme = 'http'
             THEN regexp_replace(regexp_replace(hostport, '^www\.', ''), ':80$', '')
             ELSE regexp_replace(regexp_replace(hostport, '^www\.', ''), ':443$', '')
        END AS host,
        regexp_extract(tail, '^([^#]*)', 1) AS tailnf
      FROM q
    ), w AS (
      SELECT id, s, scheme, host,
        rtrim(regexp_extract(tailnf, '^([^?]*)', 1), '/') AS path,
        CASE WHEN tailnf LIKE '%?%'
             THEN tailnf[len(regexp_extract(tailnf, '^([^?]*)', 1)) + 2:]
             ELSE '' END AS query
      FROM r
    )
    SELECT id, CASE WHEN scheme IS NULL THEN s ELSE
      scheme || '://' || host || path ||
      CASE WHEN array_to_string(list_sort(list_filter(string_split(query, '&'),
                x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') <> ''
           THEN '?' || array_to_string(list_sort(list_filter(string_split(query, '&'),
                x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&')
           ELSE '' END
    END AS c FROM w
    """
    want = dict(con.execute(sql).fetchall())
    mismatches = [(i, urls[i], got[i], want[i]) for i in got if got[i] != want[i]]
    assert not mismatches, mismatches[:5]
