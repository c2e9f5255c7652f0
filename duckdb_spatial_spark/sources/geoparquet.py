"""True GeoParquet (spec 1.0) single-file writer + footer helpers.

The distributed layout (:func:`..plans.pruning.write_geo_parquet`) keeps
geometry as WKB **column content** — which is GeoParquet's encoding —
but Spark's parquet writer cannot attach file-level key/value metadata,
so those files carry the layout's own sidecar instead of the spec's
``geo`` key. This module adds the interop surface the reference gets
from its parquet extension (``duckdb`` reads/writes the ``geo`` key):

* :func:`write_geoparquet_file` — a bounded single-file sink via pyarrow
  whose parquet ``FileMetaData`` carries the public *GeoParquet 1.0.0*
  ``geo`` JSON (version, primary_column, per-column encoding/WKB,
  geometry_types, bbox) that GeoPandas / GDAL / DuckDB-spatial key on.
* :func:`read_geo_key` — one footer read (no data pages) returning the
  parsed ``geo`` metadata, used by ``st_read`` to locate a primary
  geometry column with a non-standard name and by ``st_read_meta`` for a
  header-only answer (row count from the footer, bbox/types from the
  key).
"""

from __future__ import annotations

import json
import os

import numpy as np

_GTYPE_NAMES = {
    1: "Point", 2: "LineString", 3: "Polygon",
    4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
    7: "GeometryCollection",
}


def write_geoparquet_file(
    df,
    path: str,
    geom_col: str = "geom",
    max_rows: int = 1_000_000,
    crs: str | None = None,
) -> int:
    """Write one spec-1.0 GeoParquet FILE (``geo`` key in the footer).

    Single-file interop sink — collect bounded by ``max_rows`` like every
    other one-file writer; the scale path stays the sharded layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..geo import algorithms as A
    from ..geo import wkb as WKB

    n_rows = df.count()
    if n_rows > max_rows:
        raise ValueError(
            f"write_geoparquet_file is a single-file sink: {n_rows} rows > "
            f"max_rows={max_rows}; use write_geo_parquet for the layout path"
        )
    pdf = df.toPandas()
    if geom_col not in pdf.columns:
        raise ValueError(f"geometry column {geom_col!r} not in {list(pdf.columns)}")

    bbox = [np.inf, np.inf, -np.inf, -np.inf]
    gtypes: set[str] = set()
    for b in pdf[geom_col]:
        if b is None:
            continue
        g = WKB.from_wkb(bytes(b))
        if g.is_empty():
            continue
        name = _GTYPE_NAMES.get(g.tag, "GeometryCollection")
        if g.has_z:
            name += " Z"
        gtypes.add(name)
        gb = A.bounds(g)
        if gb is not None:
            bbox[0] = min(bbox[0], gb[0])
            bbox[1] = min(bbox[1], gb[1])
            bbox[2] = max(bbox[2], gb[2])
            bbox[3] = max(bbox[3], gb[3])

    col_meta = {
        "encoding": "WKB",
        "geometry_types": sorted(gtypes),
    }
    if bbox[0] <= bbox[2]:
        col_meta["bbox"] = [float(v) for v in bbox]
    if crs is not None:
        col_meta["crs"] = crs
    geo = {
        "version": "1.0.0",
        "primary_column": geom_col,
        "columns": {geom_col: col_meta},
    }
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    meta = dict(table.schema.metadata or {})
    meta[b"geo"] = json.dumps(geo).encode("utf-8")
    table = table.replace_schema_metadata(meta)
    pq.write_table(table, path)
    return n_rows


def _first_parquet(path: str) -> str | None:
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                return os.path.join(path, name)
    return None


def read_geo_key(path: str) -> dict | None:
    """Parse the ``geo`` footer key of a parquet file (or the first file
    of a directory). One footer read; None when absent/unreadable."""
    try:
        import pyarrow.parquet as pq

        fp = _first_parquet(path)
        if fp is None:
            return None
        md = pq.ParquetFile(fp).schema_arrow.metadata or {}
        raw = md.get(b"geo")
        return json.loads(raw.decode("utf-8")) if raw else None
    except Exception:  # noqa: BLE001 - metadata probe is advisory
        return None
