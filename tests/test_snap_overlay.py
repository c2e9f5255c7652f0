"""Fixed-precision overlay (geo/algorithms.snap_overlay — the GEOS
OverlayNG precision-model analog): output vertices are exact grid
multiples, the result is valid, sliver inputs thinner than the grid
collapse deterministically, and area perturbation is bounded by
O(grid * perimeter). Property-tested with adversarial jitter."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_spatial_spark.geo import algorithms as A
from duckdb_spatial_spark.geo import geom as G


def _rect(x0, y0, x1, y1):
    return G.polygon([[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]])


def _all_coords(g):
    out = []
    for leaf in g.flatten():
        if leaf.tag == G.POINT:
            out.append(np.asarray([leaf.data]))
        elif leaf.tag == G.LINESTRING:
            out.append(np.asarray(leaf.data))
        elif leaf.tag == G.POLYGON:
            out.extend(np.asarray(r) for r in leaf.data)
    return np.vstack(out) if out else np.zeros((0, 2))


def test_grid_alignment_and_validity():
    a = _rect(0.0003, 0.0007, 10.0004, 8.0001)
    b = _rect(4.9998, 3.0002, 15.0006, 12.0)
    out = A.snap_overlay("intersection", a, b, 0.001)
    c = _all_coords(out)
    assert len(c) and np.allclose(c / 0.001, np.round(c / 0.001), atol=1e-9)
    assert A.is_valid(out)
    # area close to the exact rectangle overlap (5..10 x 3..8 = 25)
    assert abs(A.area(out) - 25.0) < 0.01


def test_slivers_collapse_deterministically():
    # a 1e-7-thin sliver vanishes entirely under a 1e-3 grid
    sliver = _rect(0.0, 0.0, 5.0, 1e-7)
    box = _rect(-1.0, -1.0, 6.0, 6.0)
    out = A.snap_overlay("intersection", sliver, box, 1e-3)
    assert A.area(out) == 0.0
    # union with a sliver equals the box alone on the grid
    u = A.snap_overlay("union", box, sliver, 1e-3)
    assert abs(A.area(u) - 49.0) < 1e-6


@settings(max_examples=60, deadline=None)
@given(
    x0=st.floats(0, 3), y0=st.floats(0, 3),
    w1=st.floats(0.5, 4), h1=st.floats(0.5, 4),
    x1=st.floats(0, 3), y1=st.floats(0, 3),
    w2=st.floats(0.5, 4), h2=st.floats(0.5, 4),
    jit=st.floats(-4e-7, 4e-7),
)
def test_property_grid_and_area_bound(x0, y0, w1, h1, x1, y1, w2, h2, jit):
    grid = 1e-3
    a = _rect(x0 + jit, y0, x0 + w1, y0 + h1 + jit)
    b = _rect(x1, y1 + jit, x1 + w2 + jit, y1 + h2)
    for op in ("intersection", "union", "difference"):
        out = A.snap_overlay(op, a, b, grid)
        c = _all_coords(out)
        if len(c):
            assert np.allclose(c / grid, np.round(c / grid), atol=1e-6), op
        exact = {
            "intersection": A.area(A.intersection(a, b)),
            "union": A.area(a) + A.area(b) - A.area(A.intersection(a, b)),
            "difference": A.area(a) - A.area(A.intersection(a, b)),
        }[op]
        per = 2 * (w1 + h1) + 2 * (w2 + h2)
        assert abs(A.area(out) - exact) <= grid * per + 1e-9, op


def test_bad_args():
    a = _rect(0, 0, 1, 1)
    with pytest.raises(ValueError, match="grid_size"):
        A.snap_overlay("intersection", a, a, 0.0)
    with pytest.raises(ValueError, match="op must be"):
        A.snap_overlay("xor", a, a, 0.1)
