"""ST_ReadOSM: native OpenStreetMap .osm.pbf reader (pure Python).

The reference ships a native PBF reader with a fixed 8-column schema and
parallel blob decoding (``spatial/src/spatial/core/io/osm/st_read_osm.cpp:
39-96``: kind ENUM, id, tags MAP, refs LIST, lat, lon, ref_roles,
ref_types). This is an independent implementation of the public OSM PBF
wire format (protobuf varint framing + zlib raw blobs):

  file   = repeat( int4 BE header_len, BlobHeader, Blob )
  BlobHeader { 1: type (OSMHeader|OSMData), 3: datasize }
  Blob       { 1: raw, 2: raw_size, 3: zlib_data }
  PrimitiveBlock { 1: stringtable, 2: primitivegroup*,
                   17: granularity, 19: lat_offset, 20: lon_offset }
  PrimitiveGroup { 1: nodes*, 2: dense, 3: ways*, 4: relations* }

Spark integration: one DataSource partition per blob (the reference
parallelizes blob decode the same way) — blob offsets are indexed at bind
time with a cheap scan of the framing.
"""

from __future__ import annotations

import struct
import zlib

from ..geo import geom as G  # noqa: F401  (schema parity; geometry built by callers)

KINDS = ("node", "way", "relation")
MEMBER_TYPES = ("node", "way", "relation")


# ---------------------------------------------------------------- protobuf
def _varint(buf: bytes, i: int):
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<I", buf, i)[0]
            i += 4
        elif wt == 1:
            v = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        yield fno, wt, v


def _packed_varints(buf: bytes, signed=False):
    out = []
    i = 0
    while i < len(buf):
        v, i = _varint(buf, i)
        out.append(_zigzag(v) if signed else v)
    return out


# ---------------------------------------------------------------- decoding
def iter_blob_spans(path: str):
    """(offset, header_type, data_offset, data_len) for each blob."""
    with open(path, "rb") as f:
        while True:
            lenb = f.read(4)
            if len(lenb) < 4:
                break
            (hlen,) = struct.unpack(">I", lenb)
            header = f.read(hlen)
            btype = b""
            datasize = 0
            for fno, wt, v in _fields(header):
                if fno == 1:
                    btype = v
                elif fno == 3:
                    datasize = v
            off = f.tell()
            f.seek(datasize, 1)
            yield btype.decode(), off, datasize


def _read_blob(path: str, off: int, size: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(off)
        blob = f.read(size)
    raw = None
    for fno, wt, v in _fields(blob):
        if fno == 1:
            raw = v
        elif fno == 3:
            raw = zlib.decompress(v)
    return raw or b""


def _decode_stringtable(buf: bytes):
    return [v.decode("utf-8", "replace") for fno, wt, v in _fields(buf) if fno == 1]


def decode_primitive_block(data: bytes):
    """Yield row dicts with the reference's 8-column schema."""
    strings = []
    groups = []
    granularity = 100
    lat_off = lon_off = 0
    for fno, wt, v in _fields(data):
        if fno == 1:
            strings = _decode_stringtable(v)
        elif fno == 2:
            groups.append(v)
        elif fno == 17:
            granularity = v
        elif fno == 19:
            lat_off = v
        elif fno == 20:
            lon_off = v
    scale = 1e-9

    for grp in groups:
        for fno, wt, v in _fields(grp):
            if fno == 2:  # dense nodes
                ids = lats = lons = []
                kvs = []
                for f2, w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = _packed_varints(v2, signed=True)
                    elif f2 == 8:
                        lats = _packed_varints(v2, signed=True)
                    elif f2 == 9:
                        lons = _packed_varints(v2, signed=True)
                    elif f2 == 10:
                        kvs = _packed_varints(v2)
                cid = clat = clon = 0
                ki = 0
                for k in range(len(ids)):
                    cid += ids[k]
                    clat += lats[k]
                    clon += lons[k]
                    tags = {}
                    while ki < len(kvs) and kvs[ki] != 0:
                        tags[strings[kvs[ki]]] = strings[kvs[ki + 1]]
                        ki += 2
                    ki += 1  # skip 0 delimiter
                    yield {
                        "kind": "node",
                        "id": cid,
                        "tags": tags or None,
                        "refs": None,
                        "lat": (lat_off + granularity * clat) * scale,
                        "lon": (lon_off + granularity * clon) * scale,
                        "ref_roles": None,
                        "ref_types": None,
                    }
            elif fno == 1:  # plain node
                nid = 0
                lat = lon = 0
                keys = vals = []
                for f2, w2, v2 in _fields(v):
                    if f2 == 1:
                        nid = _zigzag(v2) if w2 == 0 else v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        lat = _zigzag(v2)
                    elif f2 == 9:
                        lon = _zigzag(v2)
                yield {
                    "kind": "node",
                    "id": nid,
                    "tags": {strings[k]: strings[vv] for k, vv in zip(keys, vals)} or None,
                    "refs": None,
                    "lat": (lat_off + granularity * lat) * scale,
                    "lon": (lon_off + granularity * lon) * scale,
                    "ref_roles": None,
                    "ref_types": None,
                }
            elif fno == 3:  # way
                wid = 0
                keys = vals = refs = []
                for f2, w2, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        deltas = _packed_varints(v2, signed=True)
                        acc = 0
                        refs = []
                        for d in deltas:
                            acc += d
                            refs.append(acc)
                yield {
                    "kind": "way",
                    "id": wid,
                    "tags": {strings[k]: strings[vv] for k, vv in zip(keys, vals)} or None,
                    "refs": refs,
                    "lat": None,
                    "lon": None,
                    "ref_roles": None,
                    "ref_types": None,
                }
            elif fno == 4:  # relation
                rid = 0
                keys = vals = roles = mids = mtypes = []
                for f2, w2, v2 in _fields(v):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        roles = _packed_varints(v2)
                    elif f2 == 9:
                        deltas = _packed_varints(v2, signed=True)
                        acc = 0
                        mids = []
                        for d in deltas:
                            acc += d
                            mids.append(acc)
                    elif f2 == 10:
                        mtypes = _packed_varints(v2)
                yield {
                    "kind": "relation",
                    "id": rid,
                    "tags": {strings[k]: strings[vv] for k, vv in zip(keys, vals)} or None,
                    "refs": mids,
                    "lat": None,
                    "lon": None,
                    "ref_roles": [strings[r] for r in roles],
                    "ref_types": [MEMBER_TYPES[t] for t in mtypes],
                }


OSM_SCHEMA = (
    "kind string, id long, tags map<string,string>, refs array<long>, "
    "lat double, lon double, ref_roles array<string>, ref_types array<string>"
)


def read_osm(spark, path: str):
    """ST_ReadOSM(path): fixed 8-column schema, one partition per data blob
    (parallel decode like the reference, ``st_read_osm.cpp`` max_threads)."""
    from .vfs import localize

    _v = localize(path, (".pbf",))
    if _v is not None:
        if len(_v) != 1:
            raise ValueError(f"{path!r}: archive holds {len(_v)} .pbf members; address one with !member")
        path = _v[0]
    spans = [(o, s) for t, o, s in iter_blob_spans(path) if t == "OSMData"]

    try:
        from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

        # unique per-call registration name: Spark resolves python
        # sources BY NAME; a fixed name + fresh closure state hands a
        # second read the stale reader (schema mismatch)
        import uuid as _uuid

        _ds_name = f"osmpbf_{_uuid.uuid4().hex[:12]}"

        class _Reader(DataSourceReader):
            def __init__(self):
                pass

            def partitions(self):
                return [InputPartition(sp) for sp in spans]

            def read(self, partition):
                off, size = partition.value
                for row in decode_primitive_block(_read_blob(path, off, size)):
                    yield (
                        row["kind"],
                        row["id"],
                        row["tags"],
                        row["refs"],
                        row["lat"],
                        row["lon"],
                        row["ref_roles"],
                        row["ref_types"],
                    )

        class OSMSource(DataSource):
            @classmethod
            def name(cls):
                return _ds_name

            def schema(self):
                return OSM_SCHEMA

            def reader(self, schema):
                return _Reader()

        spark.dataSource.register(OSMSource)
        return spark.read.format(_ds_name).schema(OSM_SCHEMA).load(path)
    except ImportError:
        rows = []
        for off, size in spans:
            for row in decode_primitive_block(_read_blob(path, off, size)):
                rows.append(
                    (
                        row["kind"], row["id"], row["tags"], row["refs"],
                        row["lat"], row["lon"], row["ref_roles"], row["ref_types"],
                    )
                )
        return spark.createDataFrame(rows, OSM_SCHEMA)


# ------------------------------------------------------- fixture writer
def _emit_field(fno: int, wt: int, payload) -> bytes:
    head = _enc_varint((fno << 3) | wt)
    if wt == 0:
        return head + _enc_varint(payload)
    return head + _enc_varint(len(payload)) + payload


def _enc_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _packed(vals, signed=False) -> bytes:
    return b"".join(_enc_varint(_enc_zigzag(v) if signed else v) for v in vals)


def write_osm_fixture(path: str, nodes, ways=(), relations=()):
    """Write a tiny .osm.pbf (dense nodes + ways + relations) for tests.

    nodes: [(id, lat, lon, {tags})]; ways: [(id, [refs], {tags})];
    relations: [(id, [(ref, role, type)], {tags})].
    """
    strings = [""]

    def sid(s):
        if s not in strings:
            strings.append(s)
        return strings.index(s)

    # dense nodes
    ids, lats, lons, kvs = [], [], [], []
    pid = plat = plon = 0
    for (nid, lat, lon, tags) in nodes:
        ids.append(nid - pid)
        la = int(round(lat / 1e-9 / 100))
        lo = int(round(lon / 1e-9 / 100))
        lats.append(la - plat)
        lons.append(lo - plon)
        pid, plat, plon = nid, la, lo
        for k, v in (tags or {}).items():
            kvs.extend([sid(k), sid(v)])
        kvs.append(0)
    dense = (
        _emit_field(1, 2, _packed(ids, signed=True))
        + _emit_field(8, 2, _packed(lats, signed=True))
        + _emit_field(9, 2, _packed(lons, signed=True))
        + _emit_field(10, 2, _packed(kvs))
    )
    group = _emit_field(2, 2, dense)

    for (wid, refs, tags) in ways:
        keys = [sid(k) for k in (tags or {})]
        vals = [sid(v) for v in (tags or {}).values()]
        deltas = [refs[0]] + [refs[i] - refs[i - 1] for i in range(1, len(refs))]
        way = (
            _emit_field(1, 0, wid)
            + _emit_field(2, 2, _packed(keys))
            + _emit_field(3, 2, _packed(vals))
            + _emit_field(8, 2, _packed(deltas, signed=True))
        )
        group += _emit_field(3, 2, way)

    for (rid, members, tags) in relations:
        keys = [sid(k) for k in (tags or {})]
        vals = [sid(v) for v in (tags or {}).values()]
        roles = [sid(r) for (_m, r, _t) in members]
        mids = [m for (m, _r, _t) in members]
        deltas = [mids[0]] + [mids[i] - mids[i - 1] for i in range(1, len(mids))] if mids else []
        mtypes = [MEMBER_TYPES.index(t) for (_m, _r, t) in members]
        rel = (
            _emit_field(1, 0, rid)
            + _emit_field(2, 2, _packed(keys))
            + _emit_field(3, 2, _packed(vals))
            + _emit_field(8, 2, _packed(roles))
            + _emit_field(9, 2, _packed(deltas, signed=True))
            + _emit_field(10, 2, _packed(mtypes))
        )
        group += _emit_field(4, 2, rel)

    st = b"".join(_emit_field(1, 2, s.encode()) for s in strings)
    block = _emit_field(1, 2, st) + _emit_field(2, 2, group)

    def blob(btype: str, payload: bytes) -> bytes:
        z = zlib.compress(payload)
        body = _emit_field(2, 0, len(payload)) + _emit_field(3, 2, z)
        header = _emit_field(1, 2, btype.encode()) + _emit_field(3, 0, len(body))
        return struct.pack(">I", len(header)) + header + body

    hb = _emit_field(4, 2, b"OsmSchema-V0.6") + _emit_field(16, 2, b"test")
    with open(path, "wb") as f:
        f.write(blob("OSMHeader", hb))
        f.write(blob("OSMData", block))
