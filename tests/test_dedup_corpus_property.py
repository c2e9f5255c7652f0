"""Pins the corpus property the minhash_lsh_pairs / simhash value oracles
rely on (ADVICE r13): banding recall is COMPLETE on the shipped testdata —
every pair at exact 3-gram Jaccard >= 0.5 is a near-exact duplicate that
minhash 8x4 banding and simhash hamming<=7 pigeonhole banding both
surface. If the testdata ever changes in a way that breaks this (a
qualifying pair with a banding miss), this test fails loudly BY NAME
instead of the driver recording an opaque oracle mismatch."""

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="testdata missing")
@pytest.mark.parametrize("name", ["minhash_lsh_pairs", "simhash"])
def test_lsh_oracle_recall_is_complete_on_corpus(spark, name):
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")
    oracle = sorted(con.execute(E.oracle_sql()[name]).fetchall())
    got = sorted(tuple(r) for r in E.queries()[name](spark, SF_DIR).collect())
    assert len(got) == len(oracle), (
        f"{name}: banding surfaced {len(got)} pairs but the all-pairs "
        f"exact-Jaccard oracle has {len(oracle)} — the corpus recall "
        "property behind the driver oracle no longer holds")
    for g, o in zip(got, oracle):
        assert g[:2] == o[:2]
        assert abs(g[2] - o[2]) < 1e-9
