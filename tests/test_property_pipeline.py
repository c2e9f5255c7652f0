"""Property-based tests for the pipeline operators' pure kernels
(no SparkSession — fast hypothesis loops, mirroring the reference's
randomized fuzz strategy)."""

import duckdb
from hypothesis import given, settings, strategies as st

from duckdb_spatial_spark.operators.pipeline import (
    GOPHER_THRESHOLDS,
    _repetition_metrics,
)

texts = st.text(
    alphabet=st.sampled_from("ab \n."), min_size=0, max_size=200
)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_repetition_metrics_invariants(t):
    n_lines, dlf, dlcf, top2, top3, dup5, ok = _repetition_metrics(t)
    for v in (dlf, dlcf, top2, top3, dup5):
        assert 0.0 <= v <= 1.0
    lines = [ln for ln in (x.strip() for x in t.split("\n")) if ln]
    assert n_lines == len(lines)
    if len(set(lines)) == len(lines):
        assert dlf == 0.0 and dlcf == 0.0
    # pass is exactly the thresholded conjunction of the reported values
    expect = (
        dlf <= GOPHER_THRESHOLDS["dup_line_frac"]
        and dlcf <= GOPHER_THRESHOLDS["dup_line_char_frac"]
        and top2 <= GOPHER_THRESHOLDS["top_2gram_char_frac"]
        and top3 <= GOPHER_THRESHOLDS["top_3gram_char_frac"]
        and dup5 <= GOPHER_THRESHOLDS["dup_5gram_char_frac"]
    )
    assert ok == expect


def test_minstd_formula_matches_duckdb():
    """The python/Spark MINSTD uniform and the oracle SQL are the same
    formula — replay both over a contiguous id range and compare."""
    A, M = 48271, 2147483647

    def u(i, salt=7):
        x = (i + salt) % M
        return ((x * A % M) * A % M) / M

    got = duckdb.sql(
        f"""
        SELECT i, (((((i + 7) % {M}) + {M}) % {M}) * {A} % {M}) * {A} % {M} / {M}.0
        FROM range(0, 5000) t(i)
        """
    ).fetchall()
    for i, v in got:
        assert v == u(i)
    # and it is uniform-ish: mean near 0.5, no value repeated
    vals = [v for _, v in got]
    assert abs(sum(vals) / len(vals) - 0.5) < 0.02
    assert len(set(vals)) == len(vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 500), min_size=1, max_size=40), st.integers(1, 300))
def test_greedy_packing_reference_model(sizes, budget):
    """Replay the pack_sequences greedy rule as a pure function and check
    its invariants: bins are contiguous, every bin except oversized
    singletons fits the budget, and bin indices are dense from 0."""
    bins = []
    cur, acc, first = 0, 0, True
    for sz in sizes:
        if first:
            cur, acc, first = 0, sz, False
        elif acc + sz > budget:
            cur, acc = cur + 1, sz
        else:
            acc += sz
        bins.append(cur)
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    from collections import defaultdict

    tot = defaultdict(int)
    for sz, b in zip(sizes, bins):
        tot[b] += sz
    for b, s in tot.items():
        members = [sz for sz, bb in zip(sizes, bins) if bb == b]
        assert s <= budget or len(members) == 1
