"""GTX vertical (geoid) grid: reader, writer, bilinear undulation.

The reference's vendored proj consumes +geoidgrids= vertical shift
grids for orthometric <-> ellipsoidal height conversion (EGM geoids,
NAVD88 GEOID files, VDatum). The GTX wire format is public (NOAA/NGS
VDatum, also documented in the PROJ manual) and trivially simple —
BIG-ENDIAN throughout:

  header, 40 bytes: float64 lat of the SW corner (deg), float64 lon of
  the SW corner (deg EAST, may be 0..360), float64 lat increment,
  float64 lon increment, int32 n_rows, int32 n_cols
  data: n_rows * n_cols float32 undulation values N in METERS, row
  major from the SW corner, west -> east within a row

Semantics (proj's vgridshift):  h_ellipsoidal = H_orthometric + N, so a
CRS carrying +geoidgrids converts its orthometric z UP to ellipsoidal
on the way out and back DOWN on the way in. Unlike the horizontal NTv2
case no iteration is needed for the inverse — N is looked up at the
(lat, lon) position, which the vertical shift does not move. Points
outside the grid pass through unshifted (same stance as ntv2.py).
"""

from __future__ import annotations

import os
import struct
from functools import lru_cache

import numpy as np


class GTXGrid:
    __slots__ = ("s_lat", "w_lon", "dlat", "dlon", "values", "path")

    def __init__(self, s_lat, w_lon, dlat, dlon, values, path=""):
        self.s_lat = float(s_lat)
        self.w_lon = float(w_lon)
        self.dlat = float(dlat)
        self.dlon = float(dlon)
        self.values = values  # [nrows, ncols] float32, row 0 at s_lat
        self.path = path

    @property
    def nrows(self) -> int:
        return self.values.shape[0]

    @property
    def ncols(self) -> int:
        return self.values.shape[1]

    def undulation(self, lon_deg, lat_deg):
        """Bilinear N (meters) at east-positive degrees; 0 outside."""
        lon = np.asarray(lon_deg, dtype=np.float64)
        lat = np.asarray(lat_deg, dtype=np.float64)
        # the header lon may be 0..360 (VDatum convention): normalize the
        # query into the grid's frame
        glon = lon.copy()
        if self.w_lon >= 0 and self.w_lon + self.dlon * (self.ncols - 1) > 180:
            glon = np.where(glon < 0, glon + 360.0, glon)
        cf = (glon - self.w_lon) / self.dlon
        rf = (lat - self.s_lat) / self.dlat
        inside = (
            (cf >= 0) & (cf <= self.ncols - 1) & (rf >= 0) & (rf <= self.nrows - 1)
        )
        out = np.zeros(lon.shape, dtype=np.float64)
        if not inside.any():
            return out
        cfi, rfi = cf[inside], rf[inside]
        c0 = np.clip(np.floor(cfi).astype(np.int64), 0, self.ncols - 2)
        r0 = np.clip(np.floor(rfi).astype(np.int64), 0, self.nrows - 2)
        fx, fy = cfi - c0, rfi - r0
        v = self.values
        out[inside] = (
            v[r0, c0].astype(np.float64) * (1 - fx) * (1 - fy)
            + v[r0, c0 + 1].astype(np.float64) * fx * (1 - fy)
            + v[r0 + 1, c0].astype(np.float64) * (1 - fx) * fy
            + v[r0 + 1, c0 + 1].astype(np.float64) * fx * fy
        )
        return out

    def to_ellipsoidal(self, lon, lat, z):
        """Orthometric H -> ellipsoidal h (h = H + N)."""
        return np.asarray(z, dtype=np.float64) + self.undulation(lon, lat)

    def to_orthometric(self, lon, lat, z):
        """Ellipsoidal h -> orthometric H (H = h - N)."""
        return np.asarray(z, dtype=np.float64) - self.undulation(lon, lat)


def read_gtx(path: str) -> GTXGrid:
    with open(path, "rb") as f:
        hdr = f.read(40)
        if len(hdr) < 40:
            raise ValueError(f"{path}: truncated GTX header")
        s_lat, w_lon, dlat, dlon = struct.unpack(">4d", hdr[:32])
        nrows, ncols = struct.unpack(">2i", hdr[32:40])
        if not (0 < nrows < 100_000 and 0 < ncols < 100_000):
            raise ValueError(f"{path}: implausible GTX dimensions {nrows}x{ncols}")
        data = np.frombuffer(f.read(nrows * ncols * 4), dtype=">f4")
        if data.size != nrows * ncols:
            raise ValueError(f"{path}: truncated GTX data")
    return GTXGrid(s_lat, w_lon, dlat, dlon,
                   data.reshape(nrows, ncols).astype(np.float32), path)


def write_gtx(path: str, s_lat, w_lon, dlat, dlon, values) -> None:
    """Serialize a GTX grid (test fixtures / synthetic geoids)."""
    vals = np.asarray(values, dtype=np.float32)
    nrows, ncols = vals.shape
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(struct.pack(">4d", float(s_lat), float(w_lon), float(dlat), float(dlon)))
        f.write(struct.pack(">2i", nrows, ncols))
        f.write(vals.astype(">f4").tobytes())
    os.replace(tmp, path)


@lru_cache(maxsize=32)
def load_gtx(spec: str) -> GTXGrid:
    """Resolve a +geoidgrids= value (single .gtx path; '@' prefix marks
    optional — skipped when missing, like ntv2.load_grid)."""
    path = spec[1:] if spec.startswith("@") else spec
    if not os.path.exists(path):
        try:  # executor-side: shipped via spark.files
            from pyspark import SparkFiles

            cand = SparkFiles.get(os.path.basename(path))
            if os.path.exists(cand):
                path = cand
        except Exception:  # pragma: no cover
            pass
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"+geoidgrids grid {spec!r} not found (GTX; ship to executors "
            f"via spark.files)"
        )
    return read_gtx(path)
