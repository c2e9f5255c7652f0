"""Baseline-sequential JPEG codec, pure numpy/stdlib (ITU-T T.81).

The reference reaches JPEG through GDAL's libjpeg; this container has no
codec library, so the baseline path is implemented from the public spec:
marker segments (DQT/SOF0/DHT/DRI/SOS), canonical Huffman per Annex C,
DC prediction + AC run-length per F.2.2, dequantization, the 8x8 type-III
DCT as one einsum over ALL blocks, chroma upsampling, BT.601 YCbCr->RGB.

Scope (honest edges, loud errors):
  * decode: SOF0 baseline sequential, grayscale or YCbCr, any sampling
    factors h,v in {1,2}, restart intervals, 8-bit quant tables (16-bit
    accepted), 0xFF00 stuffing. Progressive (SOF2), arithmetic coding,
    12-bit precision and hierarchical modes raise NotImplementedError.
  * encode: baseline 4:4:4 (and grayscale) with the Annex K example
    quantization (scaled by quality) and Annex K Huffman tables — enough
    to generate real fixtures and write thumbnails.

The entropy (Huffman) loop is per-symbol Python — correct first; the
block transform stage (dequant + IDCT + level shift) is fully vectorized
across every block of the scan. Corpus-scale decode throughput would
need a native codec; this is the spec-correct fallback and the fixture
generator.

Verification: tests/test_jpeg_codec.py decodes HAND-ASSEMBLED streams
whose pixel values follow from the spec by arithmetic (DC-only blocks:
pixel = 128 + DC/8 with unit quant tables), plus encoder->decoder
roundtrips within quantization tolerance.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index: zz order -> (row, col) of the 8x8 block
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 1-D IDCT basis: B[u, x] = C(u)/2 * cos((2x+1) u pi / 16); the 2-D
# inverse transform is B.T @ coef @ B, applied to all blocks at once
_IDCT_B = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _IDCT_B[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and RSTn handling done by the caller (data arrives pre-unstuffed)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: bitstream exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_huffman(bits: list, vals: bytes):
    """Canonical decode tables per T.81 Annex C: for each code LENGTH,
    the smallest/largest code value and the symbol offset."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for ln in range(1, 17):
        valptr[ln] = k
        mincode[ln] = code
        code += bits[ln - 1]
        k += bits[ln - 1]
        maxcode[ln] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, vals


def _huff_decode(r: _BitReader, table) -> int:
    mincode, maxcode, valptr, vals = table
    code = r.read_bit()
    ln = 1
    while code > maxcode[ln]:
        ln += 1
        if ln > 16:
            raise ValueError("jpeg: invalid Huffman code")
        code = (code << 1) | r.read_bit()
    return vals[valptr[ln] + code - mincode[ln]]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t received bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG -> HxWxC uint8 (C=1 grayscale, C=3 RGB)."""
    b = bytes(buf)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    comps = None  # list of (cid, h, v, tq)
    width = height = None
    restart_interval = 0
    i = 2
    scan = None
    scan_comps = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("jpeg: marker expected")
        m = b[i + 1]
        if m == 0xD8:
            i += 2
            continue
        if m == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", b, i + 2)
        seg = b[i + 4 : i + 2 + seglen]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.float64)
                    j += 64
                else:
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.float64)
                    j += 128
                qt[tq] = tbl
        elif m in (0xC0, 0xC1):  # SOF0/SOF1 (baseline / extended sequential)
            prec, height, width, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError(f"jpeg: {prec}-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only baseline sequential (SOF0/SOF1) is supported "
                f"(marker 0xFF{m:02X} is progressive/arithmetic/hierarchical)"
            )
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = seg[j + 17 : j + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
                j += 17 + nv
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0x0F))
            scan_start = i + 2 + seglen
            # collect entropy data up to EOI, unstuffing 0xFF00 and
            # recording restart-marker positions
            out = bytearray()
            rst_at = []  # MCU-data byte offsets where an RST boundary sits
            j = scan_start
            while j < len(b):
                byte = b[j]
                if byte == 0xFF:
                    nxt = b[j + 1] if j + 1 < len(b) else 0xD9
                    if nxt == 0x00:
                        out.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # RSTn
                        rst_at.append(len(out))
                        j += 2
                        continue
                    break  # EOI or next marker
                else:
                    out.append(byte)
                    j += 1
            scan = (bytes(out), rst_at)
            i = j
            continue
        i += 2 + seglen
    if comps is None or scan is None:
        raise ValueError("jpeg: missing SOF/SOS")
    data, rst_at = scan
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # per-component block grids (full MCU coverage, cropped at the end)
    tables = {cid: (huff_dc[td], huff_ac[ta]) for cid, td, ta in scan_comps}
    planes = {}
    nblocks = {}
    for cid, h, v, tq in comps:
        planes[cid] = np.zeros((mcuy * v, mcux * h, 64), dtype=np.float64)
        nblocks[cid] = (h, v, qt[tq])
    r = _BitReader(data)
    pred = {cid: 0 for cid, _, _, _ in comps}
    rst_set = set(rst_at)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align and cross the recorded restart boundary
                if r.bit:
                    r.bit = 0
                    r.pos += 1
                if r.pos not in rst_set:
                    # tolerate missing markers only at stream end
                    if r.pos < len(data):
                        raise ValueError("jpeg: restart marker misaligned")
                pred = {cid: 0 for cid, _, _, _ in comps}
            for cid, h, v, tq in comps:
                dc_t, ac_t = tables[cid]
                for by in range(v):
                    for bx in range(h):
                        zz = np.zeros(64, dtype=np.float64)
                        t = _huff_decode(r, dc_t)
                        diff = _extend(r.read_bits(t), t) if t else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_t)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(r.read_bits(ss), ss)
                            k += 1
                        planes[cid][my * v + by, mx * h + bx] = zz
            mcu_count += 1
    # vectorized dequant + un-zigzag + IDCT per component
    out_planes = {}
    for cid, h, v, tq in comps:
        grid = planes[cid]
        gy, gx = grid.shape[:2]
        blocks = grid.reshape(-1, 64) * qt[tq][None, :]
        mat = np.zeros((blocks.shape[0], 64))
        mat[:, _ZZ] = blocks
        mat = mat.reshape(-1, 8, 8)
        # pixel = B.T @ coef @ B, batched
        px = np.einsum("ux,nuv,vy->nxy", _IDCT_B, mat, _IDCT_B) + 128.0
        px = px.reshape(gy, gx, 8, 8).transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8)
        # upsample to the luma grid
        ry, rx = vmax // v, hmax // h
        if ry > 1 or rx > 1:
            px = np.repeat(np.repeat(px, ry, axis=0), rx, axis=1)
        out_planes[cid] = px[: height, : width]
    order = [cid for cid, _, _, _ in comps]
    if len(order) == 1:
        g = np.clip(np.round(out_planes[order[0]]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    if len(order) != 3:
        raise NotImplementedError(f"jpeg: {len(order)}-component scan")
    y, cb, cr = (out_planes[c] for c in order)
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encoder
# Annex K.1 example quantization tables (luminance / chrominance)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)
# Annex K.3 typical Huffman tables: (bits[16], values)
_HT = {
    ("dc", 0): ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                bytes(range(12))),
    ("dc", 1): ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                bytes(range(12))),
    ("ac", 0): ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ])),
    ("ac", 1): ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ])),
}


def _enc_codes(bits, vals):
    """symbol -> (code, length) from canonical (bits, values)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.n += ln
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _category(v: int) -> int:
    a = abs(v)
    t = 0
    while a:
        a >>= 1
        t += 1
    return t


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a (H,W) plane -> quantized zigzag coefficients."""
    h, w = plane.shape
    gy, gx = h // 8, w // 8
    blocks = plane.reshape(gy, 8, gx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    blocks = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ux,nxy,vy->nuv", _IDCT_B, blocks, _IDCT_B)
    zzed = coef.reshape(-1, 64)[:, _ZZ]
    return np.round(zzed / q[None, :]).astype(np.int64).reshape(gy, gx, 64)


def encode_jpeg(px: np.ndarray, quality: int = 75) -> bytes:
    """Baseline JPEG encoder: grayscale (H,W) / (H,W,1) or RGB (H,W,3),
    4:4:4 sampling, Annex K tables, no restart markers."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels")
    # quality scaling (the public IJG convention)
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qlum = np.clip(np.floor((_Q_LUM * scale + 50) / 100), 1, 255)
    qchr = np.clip(np.floor((_Q_CHR * scale + 50) / 100), 1, 255)
    ph = -(-h // 8) * 8
    pw = -(-w // 8) * 8
    pad = np.empty((ph, pw, nc), dtype=np.uint8)
    pad[:h, :w] = px
    pad[h:, :w] = px[-1:, :, :]
    pad[:, w:] = pad[:, w - 1 : w, :]
    if nc == 3:
        rr, gg, bb = (pad[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * rr + 0.587 * gg + 0.114 * bb
        cb = -0.168736 * rr - 0.331264 * gg + 0.5 * bb + 128.0
        cr = 0.5 * rr - 0.418688 * gg - 0.081312 * bb + 128.0
        planes = [(y, qlum, 0), (cb, qchr, 1), (cr, qchr, 1)]
    else:
        planes = [(pad[:, :, 0].astype(np.float64), qlum, 0)]
    enc = {k: _enc_codes(*v) for k, v in _HT.items()}
    wtr = _BitWriter()
    coefs = [_fdct_quant(p, q_) for p, q_, _ in planes]
    gy, gx = coefs[0].shape[:2]
    pred = [0] * len(planes)
    for by in range(gy):
        for bx in range(gx):
            for ci, (_, _, tid) in enumerate(planes):
                zz = coefs[ci][by, bx]
                dc_codes = enc[("dc", tid)]
                ac_codes = enc[("ac", tid)]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = _category(diff)
                c, ln = dc_codes[t]
                wtr.write(c, ln)
                if t:
                    wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                last = 63
                while last > 0 and zz[last] == 0:
                    last -= 1
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[0xF0]
                        wtr.write(c, ln)
                        run -= 16
                    s = _category(v)
                    c, ln = ac_codes[(run << 4) | s]
                    wtr.write(c, ln)
                    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    c, ln = ac_codes[0x00]
                    wtr.write(c, ln)
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qlum.astype(np.uint8)))
    if nc == 3:
        out += seg(0xDB, bytes([1]) + bytes(qchr.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for (kind, tid), (bits, vals) in _HT.items():
        if nc == 1 and tid == 1:
            continue
        out += seg(0xC4, bytes([(0 if kind == "dc" else 0x10) | tid])
                   + bytes(bits) + vals)
    sos = bytes([nc])
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.buf
    out += b"\xff\xd9"
    return bytes(out)
