"""NTv2 (.gsb) datum grid-shift: reader, writer, bilinear application.

The reference bundles proj 9.x, whose +nadgrids= consumes NTv2 grids for
datum transforms the 7-parameter Helmert cannot express (NAD27<->NAD83,
AGD66/84->GDA94, ...; reference proj/functions.cpp:487-508 exposes them
through ST_Transform, tested in test/sql/proj.test). This module
implements the PUBLIC NTv2 binary format (Canadian Geodetic Survey
"National Transformation v2" spec, also documented in the PROJ and GDAL
manuals):

  * overview header: 11 records of 16 bytes — 8-byte ASCII key + 8-byte
    value (int32+pad for counts, float64 for numbers)
  * per-subgrid header: 11 records (SUB_NAME, PARENT, CREATED, UPDATED,
    S_LAT, N_LAT, E_LONG, W_LONG, LAT_INC, LONG_INC, GS_COUNT)
  * GS_COUNT nodes of four float32: lat shift, lon shift, lat accuracy,
    lon accuracy — ARC-SECONDS, longitude POSITIVE WEST
  * node order: rows south->north; within a row the first node sits at
    E_LONG (the easternmost, smallest positive-west value) and columns
    step WEST by LONG_INC
  * either endianness exists in the wild — detected from NUM_OREC == 11

Application semantics match proj's +nadgrids=: the grid stores the shift
FROM the source datum TO the target datum, so

    lat_dst = lat_src + shift_lat/3600
    lon_dst = lon_src - shift_lon/3600   (positive-west shift)

and the inverse direction iterates (the shift is looked up at source
coordinates, unknown when going backwards; 4 fixed-point iterations —
shift gradients are ~1e-5, so the residual is far below float64 noise).
Points outside every subgrid pass through UNSHIFTED (proj's historical
behavior for optional grids); callers that need a hard failure can check
:meth:`NTv2Grid.covers`. Sub-grid selection picks the finest (smallest
LAT_INC) subgrid containing the point, which is the parent/child
containment rule of the spec.

Scale shape: grids are driver/executor-local files, loaded once per
process through an lru_cache and applied as vectorized numpy bilinear
interpolation inside the existing ST_Transform Arrow batches — no extra
Python crossings, no shuffle. On a cluster, ship the .gsb with
``spark.files`` (executors resolve the basename via SparkFiles) exactly
as proj ships grids to each node.
"""

from __future__ import annotations

import os
import struct
from functools import lru_cache

import numpy as np

_OVERVIEW_KEYS = (
    "NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_TYPE", "VERSION",
    "SYSTEM_F", "SYSTEM_T", "MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T",
)
_SUB_KEYS = (
    "SUB_NAME", "PARENT", "CREATED", "UPDATED", "S_LAT", "N_LAT",
    "E_LONG", "W_LONG", "LAT_INC", "LONG_INC", "GS_COUNT",
)
_INT_KEYS = {"NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"}
_STR_KEYS = {
    "GS_TYPE", "VERSION", "SYSTEM_F", "SYSTEM_T",
    "SUB_NAME", "PARENT", "CREATED", "UPDATED",
}


class SubGrid:
    """One NTv2 subgrid. Bounds/increments in arc-seconds (lat positive
    north, lon POSITIVE WEST); shifts as [nrows, ncols] float32 arrays in
    arc-seconds, row 0 at S_LAT, column 0 at E_LONG stepping west."""

    __slots__ = (
        "name", "parent", "s_lat", "n_lat", "e_long", "w_long",
        "lat_inc", "long_inc", "shift_lat", "shift_lon",
    )

    def __init__(self, name, parent, s_lat, n_lat, e_long, w_long,
                 lat_inc, long_inc, shift_lat, shift_lon):
        self.name = name
        self.parent = parent
        self.s_lat = float(s_lat)
        self.n_lat = float(n_lat)
        self.e_long = float(e_long)
        self.w_long = float(w_long)
        self.lat_inc = float(lat_inc)
        self.long_inc = float(long_inc)
        self.shift_lat = shift_lat
        self.shift_lon = shift_lon

    @property
    def nrows(self) -> int:
        return self.shift_lat.shape[0]

    @property
    def ncols(self) -> int:
        return self.shift_lat.shape[1]

    def contains(self, lat_sec, lon_pw_sec):
        """Vectorized containment in arc-seconds (lon positive west)."""
        return (
            (lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
            & (lon_pw_sec >= self.e_long) & (lon_pw_sec <= self.w_long)
        )

    def interpolate(self, lat_sec, lon_pw_sec):
        """Bilinear (shift_lat_sec, shift_lon_pw_sec) at the given
        positions; caller guarantees containment."""
        rf = (lat_sec - self.s_lat) / self.lat_inc
        cf = (lon_pw_sec - self.e_long) / self.long_inc
        r0 = np.clip(np.floor(rf).astype(np.int64), 0, self.nrows - 2)
        c0 = np.clip(np.floor(cf).astype(np.int64), 0, self.ncols - 2)
        fy = rf - r0
        fx = cf - c0
        out = []
        for arr in (self.shift_lat, self.shift_lon):
            v00 = arr[r0, c0].astype(np.float64)
            v01 = arr[r0, c0 + 1].astype(np.float64)
            v10 = arr[r0 + 1, c0].astype(np.float64)
            v11 = arr[r0 + 1, c0 + 1].astype(np.float64)
            out.append(
                v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
                + v10 * (1 - fx) * fy + v11 * fx * fy
            )
        return out[0], out[1]


class NTv2Grid:
    __slots__ = ("subgrids", "path")

    def __init__(self, subgrids, path=""):
        self.subgrids = subgrids
        self.path = path

    def covers(self, lon_deg, lat_deg):
        """True where at least one subgrid contains the point."""
        lat_sec = np.asarray(lat_deg, dtype=np.float64) * 3600.0
        lon_pw = -np.asarray(lon_deg, dtype=np.float64) * 3600.0
        hit = np.zeros(lat_sec.shape, dtype=bool)
        for g in self.subgrids:
            hit |= g.contains(lat_sec, lon_pw)
        return hit

    def _shift_at(self, lon_deg, lat_deg):
        """(dlat_sec, dlon_pw_sec) at source coordinates; 0 outside all
        subgrids. Finest containing subgrid wins (parent/child rule)."""
        lat_sec = np.asarray(lat_deg, dtype=np.float64) * 3600.0
        lon_pw = -np.asarray(lon_deg, dtype=np.float64) * 3600.0
        dlat = np.zeros(lat_sec.shape, dtype=np.float64)
        dlon = np.zeros(lat_sec.shape, dtype=np.float64)
        # coarse->fine: finer subgrids overwrite parents where they apply
        for g in sorted(self.subgrids, key=lambda s: -s.lat_inc):
            m = g.contains(lat_sec, lon_pw)
            if not m.any():
                continue
            la, lo = g.interpolate(lat_sec[m], lon_pw[m])
            dlat[m] = la
            dlon[m] = lo
        return dlat, dlon

    def forward(self, lon_deg, lat_deg):
        """Source datum -> target datum (e.g. NAD27 -> NAD83)."""
        lon = np.asarray(lon_deg, dtype=np.float64)
        lat = np.asarray(lat_deg, dtype=np.float64)
        dlat, dlon_pw = self._shift_at(lon, lat)
        return lon - dlon_pw / 3600.0, lat + dlat / 3600.0

    def inverse(self, lon_deg, lat_deg, iterations: int = 4):
        """Target datum -> source datum: fixed-point iteration (the shift
        is defined at SOURCE coordinates)."""
        lon_t = np.asarray(lon_deg, dtype=np.float64)
        lat_t = np.asarray(lat_deg, dtype=np.float64)
        lon_s, lat_s = lon_t.copy(), lat_t.copy()
        for _ in range(int(iterations)):
            dlat, dlon_pw = self._shift_at(lon_s, lat_s)
            lon_s = lon_t + dlon_pw / 3600.0
            lat_s = lat_t - dlat / 3600.0
        return lon_s, lat_s


def _rec_value(raw: bytes, key: str, fmt_int: str, fmt_dbl: str):
    if key in _STR_KEYS:
        return raw.decode("ascii", "replace").rstrip("\x00 ")
    if key in _INT_KEYS:
        return struct.unpack(fmt_int, raw[:4])[0]
    return struct.unpack(fmt_dbl, raw)[0]


def read_gsb(path: str) -> NTv2Grid:
    """Parse an NTv2 .gsb file (either endianness)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 11 * 16:
        raise ValueError(f"{path}: truncated NTv2 file")
    # endianness: NUM_OREC must be 11
    le = struct.unpack("<i", data[8:12])[0] == 11
    be = struct.unpack(">i", data[8:12])[0] == 11
    if not (le or be):
        raise ValueError(f"{path}: not an NTv2 .gsb (NUM_OREC != 11)")
    fi, fd, f4 = ("<i", "<d", "<f") if le else (">i", ">d", ">f")
    pos = 0
    hdr = {}
    for key in _OVERVIEW_KEYS:
        name = data[pos:pos + 8].decode("ascii", "replace").strip()
        if name != key:
            raise ValueError(f"{path}: expected header record {key}, got {name!r}")
        hdr[key] = _rec_value(data[pos + 8:pos + 16], key, fi, fd)
        pos += 16
    n_sub = int(hdr["NUM_FILE"])
    gs_type = str(hdr.get("GS_TYPE", "SECONDS")).upper()
    if "SECOND" not in gs_type:
        raise ValueError(f"{path}: GS_TYPE {gs_type!r} unsupported (SECONDS only)")
    subs = []
    for _ in range(n_sub):
        sh = {}
        for key in _SUB_KEYS:
            name = data[pos:pos + 8].decode("ascii", "replace").strip()
            if name != key:
                raise ValueError(f"{path}: expected subgrid record {key}, got {name!r}")
            sh[key] = _rec_value(data[pos + 8:pos + 16], key, fi, fd)
            pos += 16
        count = int(sh["GS_COUNT"])
        ncols = int(round((sh["W_LONG"] - sh["E_LONG"]) / sh["LONG_INC"])) + 1
        nrows = int(round((sh["N_LAT"] - sh["S_LAT"]) / sh["LAT_INC"])) + 1
        if nrows * ncols != count:
            raise ValueError(
                f"{path}: subgrid {sh['SUB_NAME']!r} GS_COUNT {count} != "
                f"{nrows}x{ncols} from bounds/increments"
            )
        nodes = np.frombuffer(
            data, dtype=np.dtype(f4), count=count * 4, offset=pos
        ).reshape(count, 4)
        pos += count * 16
        subs.append(
            SubGrid(
                sh["SUB_NAME"], sh["PARENT"], sh["S_LAT"], sh["N_LAT"],
                sh["E_LONG"], sh["W_LONG"], sh["LAT_INC"], sh["LONG_INC"],
                nodes[:, 0].reshape(nrows, ncols).copy(),
                nodes[:, 1].reshape(nrows, ncols).copy(),
            )
        )
    return NTv2Grid(subs, path=path)


def write_gsb(path: str, subgrids: list[SubGrid], big_endian: bool = False) -> None:
    """Serialize subgrids to the NTv2 wire format (test fixtures and
    synthetic grids; the format is symmetric so read_gsb(write_gsb(x))
    roundtrips)."""
    fi, fd, f4 = (">i", ">d", ">f") if big_endian else ("<i", "<d", "<f")

    def rec(key: str, value) -> bytes:
        name = key.encode("ascii").ljust(8)
        if key in _STR_KEYS:
            return name + str(value).encode("ascii")[:8].ljust(8)
        if key in _INT_KEYS:
            return name + struct.pack(fi, int(value)) + b"\x00" * 4
        return name + struct.pack(fd, float(value))

    out = [
        rec("NUM_OREC", 11), rec("NUM_SREC", 11), rec("NUM_FILE", len(subgrids)),
        rec("GS_TYPE", "SECONDS"), rec("VERSION", "NTv2.0"),
        rec("SYSTEM_F", "NAD27"), rec("SYSTEM_T", "NAD83"),
        rec("MAJOR_F", 6378206.4), rec("MINOR_F", 6356583.8),
        rec("MAJOR_T", 6378137.0), rec("MINOR_T", 6356752.314),
    ]
    for g in subgrids:
        nrows, ncols = g.shift_lat.shape
        out += [
            rec("SUB_NAME", g.name), rec("PARENT", g.parent or "NONE"),
            rec("CREATED", "00000000"), rec("UPDATED", "00000000"),
            rec("S_LAT", g.s_lat), rec("N_LAT", g.n_lat),
            rec("E_LONG", g.e_long), rec("W_LONG", g.w_long),
            rec("LAT_INC", g.lat_inc), rec("LONG_INC", g.long_inc),
            rec("GS_COUNT", nrows * ncols),
        ]
        la = np.ascontiguousarray(g.shift_lat.reshape(-1), dtype=np.float32)
        lo = np.ascontiguousarray(g.shift_lon.reshape(-1), dtype=np.float32)
        zero = np.zeros_like(la)
        nodes = np.stack([la, lo, zero, zero], axis=1)
        if big_endian:
            nodes = nodes.astype(nodes.dtype.newbyteorder(">"))
        out.append(nodes.tobytes())
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(b"".join(out))
    os.replace(tmp, path)


@lru_cache(maxsize=32)
def load_grid(spec: str) -> NTv2Grid:
    """Resolve a +nadgrids= value to a loaded grid. Comma-separated list;
    a leading '@' marks a grid as optional (skipped when missing). All
    subgrids of all present files merge into one lookup (proj semantics:
    files are consulted in order; our finest-grid-wins selection gives
    the same answer for the standard parent/child layouts). Missing
    MANDATORY files raise. Relative names are also resolved against
    SparkFiles (grids shipped to executors with spark.files)."""
    subs = []
    found_any = False
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        optional = part.startswith("@")
        name = part[1:] if optional else part
        path = name
        if not os.path.exists(path):
            try:  # executor-side: grid shipped via spark.files
                from pyspark import SparkFiles

                cand = SparkFiles.get(os.path.basename(name))
                if os.path.exists(cand):
                    path = cand
            except Exception:  # pragma: no cover - no active Spark context
                pass
        if not os.path.exists(path):
            if optional:
                continue
            raise FileNotFoundError(
                f"+nadgrids grid {name!r} not found (NTv2 .gsb; prefix "
                f"with '@' to mark optional, ship to executors via "
                f"spark.files)"
            )
        subs.extend(read_gsb(path).subgrids)
        found_any = True
    if not found_any:
        raise FileNotFoundError(f"+nadgrids={spec!r}: no grid file present")
    return NTv2Grid(subs, path=spec)
