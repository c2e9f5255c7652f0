"""MapInfo TAB (binary) dataset reader + writer — the second half of the
GDAL "MapInfo File" driver the reference reaches through ``st_read.cpp``
(MIF/MID, the ASCII half, lives in :mod:`.mapinfo`).

A TAB dataset is four sibling files (public MITAB project documentation,
mitab.sourceforge.net — the format itself is undocumented by MapInfo;
MITAB's reverse-engineered description is the industry reference):

  ``.tab``  ASCII table definition (``!table`` / ``!version`` /
            ``Definition Table`` / ``Fields``)
  ``.dat``  attribute records, standard xBASE (dBASE III) layout —
            the same wire format as shapefile ``.dbf``
  ``.id``   one little-endian int32 per record: absolute byte offset of
            the record's object in ``.map`` (0 = no geometry / NONE)
  ``.map``  geometry, organized in 512-byte blocks

``.map`` layout implemented here (MITAB block classes; sizes/offsets are
documented inline — byte-level conformance can only be validated by
self-roundtrip in this container, there is no GDAL to cross-check, so
the layout below IS the contract this module reads back):

  header block (class 0, at offset 0):
    0x100 i32   magic cookie 42424242       (HDR_MAGIC_COOKIE)
    0x104 i16   version 300
    0x106 i16   block size 512
    0x108 f64   coordsys-to-distance-units (1.0)
    0x110 4xi32 dataset MBR in int coords
    0x120 i32   offset of first index block
    0x124 i32   offset of first garbage block (0)
    0x128 i32   offset of first tool block (0)
    0x12C 4xi32 object counts: point / line / region / text
    0x13C i32   total object count
    0x140 4xf64 XScale, YScale, XDispl, YDispl
                int = round((world - displ) * scale); world = int/scale + displ
  index block (class 1): 0x002 i16 n_entries; entries at 0x004, 20 bytes
    each: 4xi32 MBR + i32 object-block offset
  object block (class 2): 0x002 i16 n_data_bytes; 0x004 2xi32 block
    center (compressed-coordinate origin); 0x00C 2xi32 first/last coord
    block; records from 0x014. Records never straddle blocks; 0x00 pads.
  coord block (class 3): 0x002 i16 n_data_bytes; 0x004 i32 next coord
    block; payload from 0x008, continuing across chained blocks (readers
    skip the 8-byte header at each 512-byte boundary).

  object records (type byte first; MITAB type codes):
    0x02 SYMBOL    i32 id, 2xi32 xy, u8 symbol                (14 B)
    0x01 SYMBOL_C  i32 id, 2xi16 dxy vs block center, u8      (10 B, read-only)
    0x05 LINE      i32 id, 4xi32 xyxy, u8 pen                 (22 B)
    0x04 LINE_C    i32 id, 4xi16 dxy pairs, u8 pen            (14 B, read-only)
    0x08 PLINE     i32 id, i32 coord_ptr, i32 npts, 4xi32 MBR, u8 pen  (30 B)
    0x14 MULTIPLINE i32 id, i32 coord_ptr, i32 nsections, i32 npts_total,
                    4xi32 MBR, u8 pen                         (34 B)
                    coord data: per section i32 npts + int32 xy pairs
    0x0E REGION    i32 id, i32 coord_ptr, i32 nrings, i32 npts_total,
                    4xi32 MBR, u8 pen, u8 brush               (35 B)
                    coord data: per ring i32 npts + int32 xy pairs; ring
                    shell/hole roles are reassembled by containment at
                    read time (GDAL does the same for MIF regions)
"""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..geo import geom as G
from ..geo import wkb as WKB
from .mapinfo import _assemble_region
from .shapefile import _spark_type, read_dbf
from .xmlgeo import _expand, _make_df

BLOCK = 512
MAGIC = 42424242

SYMBOL_C, SYMBOL = 0x01, 0x02
LINE_C, LINE = 0x04, 0x05
PLINE = 0x08
REGION = 0x0E
MULTIPLINE = 0x14


# --------------------------------------------------------------------------
# read
# --------------------------------------------------------------------------

class _MapFile:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        if len(self.buf) < BLOCK:
            raise ValueError(f"{path}: truncated .map header")
        magic = struct.unpack_from("<i", self.buf, 0x100)[0]
        if magic != MAGIC:
            raise ValueError(f"{path}: bad .map magic {magic} (want {MAGIC})")
        self.version, self.block_size = struct.unpack_from("<2h", self.buf, 0x104)
        (self.xscale, self.yscale, self.xdispl, self.ydispl) = struct.unpack_from(
            "<4d", self.buf, 0x140
        )

    def world(self, ix: int, iy: int):
        return ix / self.xscale + self.xdispl, iy / self.yscale + self.ydispl

    def _block_center(self, off: int):
        base = (off // BLOCK) * BLOCK
        return struct.unpack_from("<2i", self.buf, base + 0x004)

    def _stream(self, ptr: int, nbytes: int) -> tuple[bytes, int]:
        """Read ``nbytes`` of coord payload starting at absolute offset
        ``ptr``, skipping the 8-byte coord-block header at every 512-byte
        boundary (payload may straddle chained blocks at ANY byte, incl.
        mid-int32). Returns (bytes, next offset)."""
        out = bytearray()
        off = ptr
        while len(out) < nbytes:
            base = (off // BLOCK) * BLOCK
            if off < base + 8:
                off = base + 8
            avail = min(base + BLOCK - off, nbytes - len(out))
            if avail <= 0:
                off = base + BLOCK + 8
                continue
            out += self.buf[off : off + avail]
            off += avail
        return bytes(out), off

    def _pairs_to_world(self, raw: bytes) -> np.ndarray:
        arr = np.frombuffer(raw, dtype="<i4").reshape(-1, 2).astype(np.float64)
        arr[:, 0] = arr[:, 0] / self.xscale + self.xdispl
        arr[:, 1] = arr[:, 1] / self.yscale + self.ydispl
        return arr

    def _coords(self, ptr: int, n_pairs: int) -> np.ndarray:
        raw, _ = self._stream(ptr, n_pairs * 8)
        return self._pairs_to_world(raw)

    def _sections(self, ptr: int, n_sections: int):
        """Sectioned coord data (region rings / multipline parts): per
        section an int32 count followed by that many int32 xy pairs."""
        out = []
        off = ptr
        for _ in range(n_sections):
            raw, off = self._stream(off, 4)
            npts = struct.unpack("<i", raw)[0]
            raw, off = self._stream(off, npts * 8)
            out.append(self._pairs_to_world(raw))
        return out

    def read_object(self, off: int) -> G.Geometry | None:
        buf = self.buf
        t = buf[off]
        if t in (SYMBOL, SYMBOL_C):
            if t == SYMBOL:
                x, y = struct.unpack_from("<2i", buf, off + 5)
            else:
                cx, cy = self._block_center(off)
                dx, dy = struct.unpack_from("<2h", buf, off + 5)
                x, y = cx + dx, cy + dy
            return G.point(*self.world(x, y))
        if t in (LINE, LINE_C):
            if t == LINE:
                x0, y0, x1, y1 = struct.unpack_from("<4i", buf, off + 5)
            else:
                cx, cy = self._block_center(off)
                d = struct.unpack_from("<4h", buf, off + 5)
                x0, y0, x1, y1 = cx + d[0], cy + d[1], cx + d[2], cy + d[3]
            return G.linestring([self.world(x0, y0), self.world(x1, y1)])
        if t == PLINE:
            ptr, npts = struct.unpack_from("<2i", buf, off + 5)
            return G.linestring(self._coords(ptr, npts))
        if t == MULTIPLINE:
            ptr, nsec = struct.unpack_from("<2i", buf, off + 5)
            parts = self._sections(ptr, nsec)
            return G.Geometry(
                G.MULTILINESTRING, [G.linestring(p) for p in parts]
            )
        if t == REGION:
            ptr, nrings = struct.unpack_from("<2i", buf, off + 5)
            return _assemble_region(self._sections(ptr, nrings))
        raise ValueError(f"unsupported .map object type 0x{t:02x} at offset {off}")


def _sibling(base: str, ext: str) -> str | None:
    for e in (ext, ext.upper()):
        cand = base + e
        if os.path.exists(cand):
            return cand
    return None


def read_tab(spark: SparkSession, path: str, encoding: str = "latin-1") -> DataFrame:
    """ST_Read of a MapInfo TAB binary dataset: .dat attributes + .map
    geometry (via .id offsets) as a DataFrame with a WKB ``geom`` column."""
    files = [f for f in _expand(path, (".tab", ".TAB")) if os.path.exists(f)]
    if not files:
        raise FileNotFoundError(path)

    base0 = os.path.splitext(files[0])[0]
    dat0 = _sibling(base0, ".dat")
    if dat0 is None:
        raise FileNotFoundError(f"{files[0]}: no sibling .dat")
    fields, _ = read_dbf(dat0, encoding)
    schema = T.StructType(
        [T.StructField(n, _spark_type(ft, fd), True) for n, ft, fl, fd in fields]
        + [T.StructField("geom", T.BinaryType(), True)]
    )

    def iter_rows(fp: str):
        b = os.path.splitext(fp)[0]
        dat = _sibling(b, ".dat")
        if dat is None:
            return
        _, rows = read_dbf(dat, encoding)
        idp, mapp = _sibling(b, ".id"), _sibling(b, ".map")
        offsets = []
        if idp is not None:
            with open(idp, "rb") as f:
                raw = f.read()
            offsets = list(np.frombuffer(raw, dtype="<i4"))
        mf = _MapFile(mapp) if mapp is not None else None
        for k, attrs in enumerate(rows):
            g = None
            if mf is not None and k < len(offsets) and offsets[k] > 0:
                g = mf.read_object(int(offsets[k]))
            yield tuple(attrs) + (WKB.to_wkb(g) if g is not None else None,)

    return _make_df(spark, files, schema, iter_rows, "mapinfo_tab")


# --------------------------------------------------------------------------
# write
# --------------------------------------------------------------------------

def _dat_bytes(rows, attr_fields, geom_idx_excluded_cols) -> bytes:
    """Typed xBASE: Char for strings, N for integers (dec 0), N width-30
    repr text for doubles (shortest exact roundtrip), L for booleans."""
    descs, convs = [], []
    for f in attr_fields:
        t = f.dataType
        if isinstance(t, (T.LongType, T.IntegerType, T.ShortType)):
            ftype, flen, fdec = b"N", 19, 0
            conv = lambda v: ("" if v is None else str(int(v))).rjust(19)
        elif isinstance(t, (T.DoubleType, T.FloatType)):
            ftype, flen, fdec = b"N", 30, 15
            conv = lambda v: ("" if v is None else repr(float(v))).rjust(30)
        elif isinstance(t, T.BooleanType):
            ftype, flen, fdec = b"L", 1, 0
            conv = lambda v: "?" if v is None else ("T" if v else "F")
        else:
            ftype, flen, fdec = b"C", 64, 0
            conv = lambda v: ("" if v is None else str(v))[:64].ljust(64)
        descs.append(
            f.name[:10].encode("ascii", "ignore").ljust(11, b"\0")
            + ftype
            + b"\0" * 4
            + bytes([flen, fdec])
            + b"\0" * 14
        )
        convs.append((f.name, conv, flen))
    fields_desc = b"".join(descs)
    header_size = 32 + len(fields_desc) + 1
    record_size = 1 + sum(fl for _, _, fl in convs)
    out = [
        struct.pack("<4BI2H20x", 3, 24, 1, 1, len(rows), header_size, record_size),
        fields_desc,
        b"\r",
    ]
    for r in rows:
        rec = b" "
        for name, conv, flen in convs:
            rec += conv(r[name]).encode("ascii", "replace")[:flen].ljust(flen)
        out.append(rec)
    out.append(b"\x1a")
    return b"".join(out)


class _MapWriter:
    """Builds the .map byte stream: header + one index block + object
    blocks + chained coord blocks, and the per-record .id offsets."""

    def __init__(self, xscale, yscale, xdispl, ydispl):
        self.xscale, self.yscale = xscale, yscale
        self.xdispl, self.ydispl = xdispl, ydispl
        self.obj_blocks: list[bytearray] = []
        self.obj_block_mbrs: list[list[int]] = []
        self.coord_payload = bytearray()
        self.id_offsets: list[int] = []
        self.counts = {"point": 0, "line": 0, "region": 0, "text": 0}
        self.mbr = [2**31 - 1, 2**31 - 1, -(2**31), -(2**31)]

    def ints(self, arr) -> np.ndarray:
        a = np.asarray(arr, dtype=np.float64)[:, :2]
        out = np.empty_like(a, dtype=np.int64)
        out[:, 0] = np.rint((a[:, 0] - self.xdispl) * self.xscale)
        out[:, 1] = np.rint((a[:, 1] - self.ydispl) * self.yscale)
        return out

    def _grow_mbr(self, ints: np.ndarray):
        self.mbr[0] = min(self.mbr[0], int(ints[:, 0].min()))
        self.mbr[1] = min(self.mbr[1], int(ints[:, 1].min()))
        self.mbr[2] = max(self.mbr[2], int(ints[:, 0].max()))
        self.mbr[3] = max(self.mbr[3], int(ints[:, 1].max()))

    def _coord_ptr(self) -> int:
        """Offset the NEXT coord byte will land at RELATIVE to the coord
        area start, accounting for the 8-byte header each 504-byte payload
        chunk gets (serialize() relocates by +coord_area)."""
        n = len(self.coord_payload)
        return n // (BLOCK - 8) * BLOCK + n % (BLOCK - 8) + 8

    def _append_record(self, rec: bytes, mbr_ints: np.ndarray) -> int:
        """Place the record in the current object block (new block if it
        would straddle); returns the record's offset RELATIVE to the start
        of the object-block area."""
        if not self.obj_blocks or len(self.obj_blocks[-1]) + len(rec) > BLOCK:
            self.obj_blocks.append(bytearray(20))  # header placeholder
            self.obj_block_mbrs.append([2**31 - 1, 2**31 - 1, -(2**31), -(2**31)])
        blk = self.obj_blocks[-1]
        off = (len(self.obj_blocks) - 1) * BLOCK + len(blk)
        blk.extend(rec)
        m = self.obj_block_mbrs[-1]
        m[0] = min(m[0], int(mbr_ints[:, 0].min()))
        m[1] = min(m[1], int(mbr_ints[:, 1].min()))
        m[2] = max(m[2], int(mbr_ints[:, 0].max()))
        m[3] = max(m[3], int(mbr_ints[:, 1].max()))
        self._grow_mbr(mbr_ints)
        return off

    def _append_coords(self, payload: bytes) -> int:
        ptr = self._coord_ptr()
        self.coord_payload.extend(payload)
        return ptr

    def add(self, oid: int, g: G.Geometry | None):
        if g is None or g.is_empty():
            self.id_offsets.append(0)
            return
        if g.tag == G.POINT:
            iv = self.ints(g.data.reshape(1, -1))
            rec = struct.pack("<Bi2iB", SYMBOL, oid, int(iv[0, 0]), int(iv[0, 1]), 1)
            self.counts["point"] += 1
            self.id_offsets.append(self._append_record(rec, iv))
            return
        if g.tag == G.LINESTRING and len(g.data) == 2:
            iv = self.ints(g.data)
            rec = struct.pack(
                "<Bi4iB", LINE, oid,
                int(iv[0, 0]), int(iv[0, 1]), int(iv[1, 0]), int(iv[1, 1]), 1,
            )
            self.counts["line"] += 1
            self.id_offsets.append(self._append_record(rec, iv))
            return
        if g.tag == G.LINESTRING:
            iv = self.ints(g.data)
            ptr = self._append_coords(iv.astype("<i4").tobytes())
            rec = struct.pack(
                "<B3i4iB", PLINE, oid, ptr, len(iv),
                int(iv[:, 0].min()), int(iv[:, 1].min()),
                int(iv[:, 0].max()), int(iv[:, 1].max()), 1,
            )
            self.counts["line"] += 1
            self.id_offsets.append(self._append_record(rec, iv))
            return
        if g.tag == G.MULTILINESTRING:
            parts = [p for p in g.data if not p.is_empty()]
            ivs = [self.ints(p.data) for p in parts]
            payload = b"".join(
                struct.pack("<i", len(iv)) + iv.astype("<i4").tobytes() for iv in ivs
            )
            ptr = self._append_coords(payload)
            allv = np.vstack(ivs)
            rec = struct.pack(
                "<B4i4iB", MULTIPLINE, oid, ptr, len(ivs), int(sum(len(v) for v in ivs)),
                int(allv[:, 0].min()), int(allv[:, 1].min()),
                int(allv[:, 0].max()), int(allv[:, 1].max()), 1,
            )
            self.counts["line"] += 1
            self.id_offsets.append(self._append_record(rec, allv))
            return
        if g.tag in (G.POLYGON, G.MULTIPOLYGON):
            polys = [g] if g.tag == G.POLYGON else [p for p in g.data if not p.is_empty()]
            rings = [r for p in polys for r in p.data]
            ivs = [self.ints(np.asarray(r)) for r in rings]
            payload = b"".join(
                struct.pack("<i", len(iv)) + iv.astype("<i4").tobytes() for iv in ivs
            )
            ptr = self._append_coords(payload)
            allv = np.vstack(ivs)
            rec = struct.pack(
                "<B4i4i2B", REGION, oid, ptr, len(ivs), int(sum(len(v) for v in ivs)),
                int(allv[:, 0].min()), int(allv[:, 1].min()),
                int(allv[:, 0].max()), int(allv[:, 1].max()), 1, 1,
            )
            self.counts["region"] += 1
            self.id_offsets.append(self._append_record(rec, allv))
            return
        raise ValueError(f"write_tab: unsupported geometry tag {g.tag}")

    def serialize(self) -> tuple[bytes, list[int]]:
        n_obj_blocks = max(len(self.obj_blocks), 1)
        obj_area = BLOCK * 2  # header + index block
        coord_area = obj_area + n_obj_blocks * BLOCK
        # coord payload -> chained 512-byte blocks with 8-byte headers
        chunks = []
        pay = bytes(self.coord_payload)
        step = BLOCK - 8
        for i in range(0, max(len(pay), 1), step):
            chunks.append(pay[i : i + step])
        if not pay:
            chunks = []
        coord_blocks = []
        for i, ch in enumerate(chunks):
            nxt = coord_area + (i + 1) * BLOCK if i + 1 < len(chunks) else 0
            hdr = struct.pack("<BxhI", 3, len(ch), nxt)
            coord_blocks.append((hdr + ch).ljust(BLOCK, b"\0"))
        # object blocks: fill headers, relocate record offsets to absolute
        blocks = []
        for i, blk in enumerate(self.obj_blocks):
            m = self.obj_block_mbrs[i]
            cx = (m[0] + m[2]) // 2 if m[0] <= m[2] else 0
            cy = (m[1] + m[3]) // 2 if m[1] <= m[3] else 0
            struct.pack_into(
                "<BxH2i2i", blk, 0, 2, len(blk) - 20, cx, cy,
                coord_area if coord_blocks else 0,
                coord_area + (len(coord_blocks) - 1) * BLOCK if coord_blocks else 0,
            )
            blocks.append(bytes(blk).ljust(BLOCK, b"\0"))
        if not blocks:
            blocks = [struct.pack("<BxH2i2i", 2, 0, 0, 0, 0, 0).ljust(BLOCK, b"\0")]
        # index block
        idx = bytearray(struct.pack("<Bxh", 1, len(blocks)))
        for i, _ in enumerate(blocks):
            m = (
                self.obj_block_mbrs[i]
                if i < len(self.obj_block_mbrs)
                else [0, 0, 0, 0]
            )
            idx += struct.pack("<5i", m[0], m[1], m[2], m[3], obj_area + i * BLOCK)
        # header block
        hdr = bytearray(BLOCK)
        hdr[0] = 0
        struct.pack_into("<i", hdr, 0x100, MAGIC)
        struct.pack_into("<2h", hdr, 0x104, 300, BLOCK)
        struct.pack_into("<d", hdr, 0x108, 1.0)
        m = self.mbr if self.mbr[0] <= self.mbr[2] else [0, 0, 0, 0]
        struct.pack_into("<4i", hdr, 0x110, *m)
        struct.pack_into("<3i", hdr, 0x120, BLOCK, 0, 0)
        struct.pack_into(
            "<4i", hdr, 0x12C,
            self.counts["point"], self.counts["line"],
            self.counts["region"], self.counts["text"],
        )
        struct.pack_into("<i", hdr, 0x13C, sum(1 for o in self.id_offsets if o))
        struct.pack_into(
            "<4d", hdr, 0x140, self.xscale, self.yscale, self.xdispl, self.ydispl
        )
        out = bytes(hdr) + bytes(idx).ljust(BLOCK, b"\0") + b"".join(blocks)
        # coord_ptrs were recorded relative to the coord area; relocate
        out = bytearray(out)
        for i, blk_off in enumerate(range(obj_area, obj_area + len(blocks) * BLOCK, BLOCK)):
            pos = blk_off + 20
            end = blk_off + 20 + (struct.unpack_from("<H", out, blk_off + 2)[0])
            while pos < end:
                t = out[pos]
                if t == SYMBOL:
                    pos += 14
                elif t == LINE:
                    pos += 22
                elif t == PLINE:
                    struct.pack_into(
                        "<i", out, pos + 5,
                        struct.unpack_from("<i", out, pos + 5)[0] + coord_area,
                    )
                    pos += 30
                elif t == MULTIPLINE:
                    struct.pack_into(
                        "<i", out, pos + 5,
                        struct.unpack_from("<i", out, pos + 5)[0] + coord_area,
                    )
                    pos += 34
                elif t == REGION:
                    struct.pack_into(
                        "<i", out, pos + 5,
                        struct.unpack_from("<i", out, pos + 5)[0] + coord_area,
                    )
                    pos += 35
                else:
                    break
        final = bytes(out) + b"".join(coord_blocks)
        # .id offsets: relocate object-block-relative offsets to absolute
        ids = [o + obj_area if o else 0 for o in self.id_offsets]
        return final, ids


def write_tab(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    max_rows: int = 2_000_000,
) -> None:
    """COPY TO ... (FORMAT GDAL, DRIVER 'MapInfo File') analog for the
    binary TAB side: writes ``.tab`` + ``.dat`` + ``.map`` + ``.id``.
    Single-file interchange format — driver-collected with the same
    ``max_rows`` guard as the other serial writers."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_tab: result exceeds max_rows={max_rows}; TAB is a serial "
            "single-file interchange format — use write_geo_parquet for large tables"
        )
    attr_fields = [f for f in df.schema.fields if f.name != geom_col]
    gi = df.columns.index(geom_col)
    geoms = [WKB.from_wkb(r[gi]) if r[gi] is not None else None for r in rows]

    # coordinate transform: center the int space on the data MBR, scale so
    # the MBR spans +/- 1e9 (MITAB picks bounds-derived scales the same way)
    xs, ys = [], []
    for g in geoms:
        if g is None or g.is_empty():
            continue
        x0, y0, x1, y1 = _geom_bounds(g)
        xs += [x0, x1]
        ys += [y0, y1]
    if xs:
        xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)
    else:
        xmin = ymin = -1.0
        xmax = ymax = 1.0
    xdispl, ydispl = (xmin + xmax) / 2.0, (ymin + ymax) / 2.0
    span = max(xmax - xmin, ymax - ymin, 1e-9)
    scale = 2e9 / span / 1.0001  # headroom so rounded ints stay in int32
    w = _MapWriter(scale, scale, xdispl, ydispl)
    for k, g in enumerate(geoms):
        w.add(k + 1, g)
    map_bytes, ids = w.serialize()

    base = os.path.splitext(path)[0]
    with open(base + ".map", "wb") as f:
        f.write(map_bytes)
    with open(base + ".id", "wb") as f:
        f.write(np.asarray(ids, dtype="<i4").tobytes())
    with open(base + ".dat", "wb") as f:
        f.write(_dat_bytes(rows, attr_fields, None))

    def tab_type(f):
        t = f.dataType
        if isinstance(t, (T.LongType, T.IntegerType, T.ShortType)):
            return "Integer"
        if isinstance(t, (T.DoubleType, T.FloatType)):
            return "Float"
        if isinstance(t, T.BooleanType):
            return "Logical"
        return "Char (64)"

    lines = [
        "!table",
        "!version 300",
        "!charset WindowsLatin1",
        "",
        "Definition Table",
        '  Type NATIVE Charset "WindowsLatin1"',
        f"  Fields {len(attr_fields)}",
    ]
    lines += [f"    {f.name} {tab_type(f)} ;" for f in attr_fields]
    with open(base + ".tab", "w", encoding="latin-1") as f:
        f.write("\n".join(lines) + "\n")


def _geom_bounds(g: G.Geometry):
    from ..geo.algorithms import bounds

    return bounds(g)
