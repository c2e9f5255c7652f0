"""Baseline JPEG codec (operators/jpeg.py, ITU-T T.81).

External truth: the single- and two-block grayscale streams below are
HAND-ASSEMBLED from the spec — unit quantization tables make a DC-only
block's pixels exactly 128 + DC/8, and the entropy bits are derived by
hand from the Annex K luminance tables (DC cat7 = '11110', cat5 = '110';
AC EOB = '1010'). If any of zigzag order, Huffman canonicalization,
EXTEND, DC prediction, dequant, or the IDCT scaling were off, these
exact pixel values could not come out.
"""

import struct

import numpy as np
import pytest

from duckdb_spatial_spark.operators.jpeg import (
    _HT,
    decode_jpeg,
    encode_jpeg,
)


def _seg(marker, body):
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dht_segment():
    out = b""
    for (kind, tid), (bits, vals) in _HT.items():
        if tid == 1:
            continue
        out += _seg(0xC4, bytes([(0 if kind == "dc" else 0x10) | tid])
                    + bytes(bits) + vals)
    return out


def _gray_stream(width, entropy):
    b = bytearray(b"\xff\xd8")
    b += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # unit quant table
    b += _seg(0xC0, struct.pack(">BHHB", 8, 8, width, 1) + bytes([1, 0x11, 0]))
    b += _dht_segment()
    b += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    b += entropy
    b += b"\xff\xd9"
    return bytes(b)


def test_hand_assembled_dc_only_block():
    # DC=80, unit quant: pixel = 128 + 80/8 = 138 everywhere.
    # bits: DC cat7 '11110' + 80 ('1010000'), EOB '1010'
    #   -> 11110101 00001010 = F5 0A
    px = decode_jpeg(_gray_stream(8, bytes([0xF5, 0x0A])))
    assert px.shape == (8, 8, 1)
    assert (px == 138).all()


def test_hand_assembled_dc_prediction_two_blocks():
    # block 1: DC diff 80 -> DC 80 -> 138; block 2: diff -16 (cat5 '110'
    # + EXTEND bits '01111') -> DC 64 -> 128 + 8 = 136.
    # bits: [11110 1010000 1010][110 01111 1010] + 1-padding
    #   -> 11110101 00001010 11001111 10101111 = F5 0A CF AF
    px = decode_jpeg(_gray_stream(16, bytes([0xF5, 0x0A, 0xCF, 0xAF])))
    assert px.shape == (8, 16, 1)
    assert (px[:, :8, 0] == 138).all()
    assert (px[:, 8:, 0] == 136).all()


def test_progressive_rejected_loudly():
    b = bytearray(b"\xff\xd8")
    b += _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(b))


def test_roundtrip_flat_and_gradient():
    flat = np.full((16, 24), 137, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, quality=95))[:, :, 0] == 137).all()
    g = (np.arange(32)[:, None] * 8 + np.arange(40)[None, :] * 2) % 256
    g = g.astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))[:, :, 0].astype(int)
    err = np.abs(out - g.astype(int))
    assert err.mean() < 2.0 and err.max() < 20


def test_roundtrip_color_and_odd_sizes():
    flat = np.zeros((10, 13, 3), np.uint8)  # non-multiple-of-8 dims
    flat[:, :, 0], flat[:, :, 1], flat[:, :, 2] = 200, 60, 30
    out = decode_jpeg(encode_jpeg(flat, quality=95))
    assert out.shape == (10, 13, 3)
    assert np.abs(out.astype(int) - flat.astype(int)).max() <= 1
    rng = np.random.RandomState(7)
    c = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(c, quality=95)).astype(int)
    assert out.shape == c.shape
    assert np.abs(out - c.astype(int)).mean() < 6.0


def test_decode_image_dispatch():
    from duckdb_spatial_spark.operators.codecs import decode_image

    img = np.full((8, 8), 99, dtype=np.uint8)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (8, 8, 1) and (out == 99).all()
