"""Codec robustness: EWKB variants, malformed-input behavior, fuzz.

The reference's readers accept EWKB flags and reject garbage with typed
errors (``wkb_reader.cpp``, ``wkt_reader.cpp``); same contract here."""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from duckdb_spatial_spark.geo import algorithms as A, from_wkb, from_wkt, to_wkt
from duckdb_spatial_spark.geo.wkb import WKBParseError
from duckdb_spatial_spark.geo.wkt import WKTParseError


def test_ewkb_flags():
    # EWKB point with SRID: 0x20000001, srid 4326, (1, 2)
    b = struct.pack("<BIIdd", 1, 0x20000001, 4326, 1.0, 2.0)
    assert to_wkt(from_wkb(b)) == "POINT (1 2)"  # SRID read and discarded
    # EWKB Z flag (0x80000000)
    b = struct.pack("<BIddd", 1, 0x80000001, 1.0, 2.0, 3.0)
    assert to_wkt(from_wkb(b)) == "POINT Z (1 2 3)"
    # EWKB ZM
    b = struct.pack("<BIdddd", 1, 0xC0000001, 1.0, 2.0, 3.0, 4.0)
    assert to_wkt(from_wkb(b)) == "POINT ZM (1 2 3 4)"
    # big-endian ISO
    b = struct.pack(">BIdd", 0, 1, 5.0, 6.0)
    assert to_wkt(from_wkb(b)) == "POINT (5 6)"


def test_malformed_wkb_raises_typed():
    with pytest.raises(WKBParseError):
        from_wkb(b"\x01\x01\x00\x00\x00\x00")  # truncated coords
    with pytest.raises(WKBParseError):
        from_wkb(struct.pack("<BIdd", 1, 99, 0.0, 0.0))  # unknown type code


def test_malformed_wkt_raises_typed():
    for bad in ["POINT", "POINT (", "POINT (1", "POLYGON ((0 0, 1 1)",
                "LINESTRING (a b)", "CIRCLE (0 0, 1)", "POINT (1 2) extra"]:
        with pytest.raises(WKTParseError):
            from_wkt(bad)


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=300, deadline=None)
def test_wkb_fuzz_never_hangs_or_segfaults(data):
    """Arbitrary bytes either parse or raise a typed error — nothing else."""
    try:
        g = from_wkb(data)
        # if it parsed, basic ops must not crash
        A.bounds(g)
        to_wkt(g)
    except (WKBParseError, struct.error):
        pass


@given(st.text(min_size=0, max_size=60))
@settings(max_examples=300, deadline=None)
def test_wkt_fuzz_never_hangs(s):
    try:
        g = from_wkt(s)
        to_wkt(g)
    except WKTParseError:
        pass
