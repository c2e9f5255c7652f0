"""OGC WFS (Web Feature Service) source — the reference reaches remote
feature services through GDAL's WFS driver (``st_read.cpp:684-692`` with
a ``WFS:http://...`` path); here it is a thin paged HTTP client over the
public WFS 2.0 / 1.1 query protocol.

Design mirrors the repo's other remote lanes (postgis/jdbc_spatial):

  * every REQUEST is built by a pure function the tests pin offline
    (this container has no network);
  * the transport is injectable (``fetch=``) so the paging/stop logic is
    fully tested against canned responses;
  * responses are GeoJSON FeatureCollections (``outputFormat=
    application/json``, what GeoServer/pygeoapi/QGIS-server emit) —
    pages are spooled to a temp ``.geojsonl`` and parsed by the existing
    DISTRIBUTED geojsonseq reader, so only the polite driver-side fetch
    is serial, not the decode.

Scale note: a WFS endpoint is a paged API, not a bulk store — the
100 TB path is the provider's bulk export (GeoParquet/FGB dumps) read by
the native readers; this lane exists for the long tail of live
services, with ``max_features`` as the runaway guard.
"""

from __future__ import annotations

import json
import os
import tempfile
from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession


def wfs_getcapabilities_url(base_url: str, version: str = "2.0.0") -> str:
    """The GetCapabilities request for an endpoint."""
    sep = "&" if "?" in base_url else "?"
    return (
        f"{base_url}{sep}service=WFS&version={version}"
        f"&request=GetCapabilities"
    )


def wfs_getfeature_url(
    base_url: str,
    typename: str,
    version: str = "2.0.0",
    bbox: tuple | None = None,
    srs: str | None = None,
    count: int | None = None,
    start_index: int | None = None,
    output_format: str = "application/json",
    cql_filter: str | None = None,
) -> str:
    """One GetFeature request URL.

    ``bbox`` is (min_x, min_y, max_x, max_y) and ships as the standard
    4-corner BBOX parameter (plus the CRS as its 5th member when ``srs``
    is given) — the server-side spatial prune, exactly like the
    SDO_FILTER/geometry::Filter conjuncts of the JDBC lanes. WFS 2.0
    pages with count/startIndex; 1.1 uses maxFeatures (no paging)."""
    sep = "&" if "?" in base_url else "?"
    two = version.startswith("2")
    q = [
        f"service=WFS", f"version={version}", "request=GetFeature",
        f"{'typeNames' if two else 'typeName'}={quote(typename, safe=':')}",
        f"outputFormat={quote(output_format, safe='')}",
    ]
    if bbox is not None:
        parts = ",".join(repr(float(v)) for v in bbox)
        if srs:
            parts += f",{quote(srs, safe=':')}"
        q.append(f"bbox={parts}")
    if srs:
        q.append(f"srsName={quote(srs, safe=':')}")
    if count is not None:
        q.append(f"{'count' if two else 'maxFeatures'}={int(count)}")
    if start_index is not None and two:
        q.append(f"startIndex={int(start_index)}")
    if cql_filter:
        q.append(f"cql_filter={quote(cql_filter, safe='')}")
    return base_url + sep + "&".join(q)


def _unlink_quiet(path: str) -> None:
    try:
        os.unlink(path)
    except OSError:
        pass


def _default_fetch(url: str) -> bytes:
    import urllib.request

    with urllib.request.urlopen(url, timeout=60) as r:  # noqa: S310
        return r.read()


def read_wfs(
    spark: SparkSession,
    base_url: str,
    typename: str,
    version: str = "2.0.0",
    bbox: tuple | None = None,
    srs: str | None = None,
    page_size: int = 10_000,
    max_features: int | None = 1_000_000,
    cql_filter: str | None = None,
    fetch=None,
    spool_dir: str | None = None,
    empty_schema: str | None = None,
) -> DataFrame:
    """Read a WFS feature type into a DataFrame with WKB geometry.

    Pages of ``page_size`` features are fetched driver-side (WFS 2.0
    count/startIndex paging; version 1.1 gets one maxFeatures-capped
    request) and spooled as newline-delimited GeoJSON; the distributed
    geojsonseq reader then parses them in parallel. Stops when a page
    comes back short, ``numberMatched`` is exhausted, or
    ``max_features`` (runaway guard; None disables) is reached.

    Spool lifetime/location: when ``spool_dir=`` is not given the spool
    defaults to ``<spark.sql.warehouse.dir>/_wfs_spool`` whenever the
    warehouse is a local-filesystem URI (a shared NFS/fuse warehouse is
    then executor-reachable on a real cluster), falling back to the
    driver's temp dir otherwise — in that fallback executors can read it
    in LOCAL mode only, so on a multi-node cluster with a remote
    warehouse pass ``spool_dir=`` pointing at a Spark-reachable shared
    path (DBFS / NFS / fuse mount). The file must outlive the returned
    (lazy) DataFrame; it is deleted at driver exit (atexit), not before.

    ``empty_schema=`` (DDL string) sets the schema of a ZERO-feature
    result — without it an empty read returns ``geom binary`` only, while
    non-empty reads carry the feature property columns; callers unioning
    multiple reads should pass it or use
    ``unionByName(allowMissingColumns=True)``."""
    fetch = fetch or _default_fetch
    if spool_dir is None:
        # default the spool into the warehouse dir when it is a local
        # path: on NFS/fuse-shared warehouses that makes the spool
        # executor-reachable beyond local mode with zero configuration
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        from urllib.parse import unquote, urlparse

        parsed = urlparse(wh)
        if parsed.scheme in ("file", "") and parsed.path:
            cand = os.path.join(unquote(parsed.path), "_wfs_spool")
            try:
                os.makedirs(cand, exist_ok=True)
                spool_dir = cand
            except OSError:
                spool_dir = None  # unwritable warehouse: temp-dir fallback
    spool = tempfile.NamedTemporaryFile(
        "wb", suffix=".geojsonl", delete=False, dir=spool_dir
    )
    n = 0
    try:
        start = 0
        while True:
            want = page_size
            if max_features is not None:
                want = min(want, max_features - n)
                if want <= 0:
                    break
            url = wfs_getfeature_url(
                base_url, typename, version=version, bbox=bbox, srs=srs,
                count=want, start_index=start if version.startswith("2") else None,
                cql_filter=cql_filter,
            )
            doc = json.loads(fetch(url))
            feats = doc.get("features", [])
            for f in feats:
                spool.write(json.dumps(f, separators=(",", ":")).encode())
                spool.write(b"\n")
            n += len(feats)
            start += len(feats)
            matched = doc.get("numberMatched")
            if (
                not version.startswith("2")
                or len(feats) < want
                or (isinstance(matched, int) and start >= matched)
            ):
                break
        spool.close()
        if n == 0:
            os.unlink(spool.name)
            return spark.createDataFrame([], empty_schema or "geom binary")
        import atexit

        atexit.register(_unlink_quiet, spool.name)
        from .geojson import read_geojsonseq

        return read_geojsonseq(spark, spool.name)
    except Exception:
        spool.close()
        if os.path.exists(spool.name):
            os.unlink(spool.name)
        raise
