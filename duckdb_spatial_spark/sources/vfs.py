"""Virtual file system shims for ST_Read — the analog of the reference's
GDAL VFS bridge (``spatial/src/spatial/gdal/file_handler.cpp``, exercised by
``test/sql/gdal/st_read_vsi.test``: /vsizip/, /vsigzip/, /vsicurl/, S3).

Accepted URI forms (members may be globs):

    /vsizip/path/to/archive.zip/member.geojson     (GDAL spelling)
    path/to/archive.zip!member.geojson             (bang spelling)
    zip://path/to/archive.zip!member.geojson
    path/to/archive.zip                            (all members)
    /vsigzip/path/to/file.geojson.gz               (GDAL spelling)
    path/to/file.geojson.gz                        (single gzipped file)
    http(s)://host/file.geojson[.zip|.gz]          (urllib; needs network)
    s3://bucket/key                                (boto3 if installed)

Remote fetches and archive members are materialized into a content-keyed
cache under the system temp dir — the pure-Python readers then operate on
ordinary local paths (the reference streams through VSI handles instead;
materialize-once is the Spark-friendly equivalent since every executor
re-reads the same small sidecar formats, while the big-data path — parquet —
already goes through Hadoop's own filesystems, not this shim)."""

from __future__ import annotations

import fnmatch
import gzip
import hashlib
import os
import shutil
import tempfile
import zipfile

_CACHE_ROOT = os.path.join(tempfile.gettempdir(), "duckdb_spatial_spark_vfs")


def _cache_dir(key: str) -> str:
    d = os.path.join(_CACHE_ROOT, hashlib.sha1(key.encode()).hexdigest()[:20])
    os.makedirs(d, exist_ok=True)
    return d


def _split_zip(path: str):
    """(archive, member_glob_or_None) if path addresses into a zip."""
    if path.startswith("/vsizip/"):
        rest = path[len("/vsizip/") :]
        low = rest.lower()
        i = low.find(".zip")
        if i < 0:
            raise ValueError(f"/vsizip/ path without .zip archive: {path!r}")
        arch, member = rest[: i + 4], rest[i + 5 :]
        return arch, member or None
    if path.startswith("zip://"):
        path = path[len("zip://") :]
    if "!" in path and ".zip" in path.lower():
        arch, member = path.split("!", 1)
        return arch, member or None
    if path.lower().endswith(".zip"):
        return path, None
    return None, None


def _is_remote(path: str) -> bool:
    return path.startswith(("http://", "https://", "s3://"))


def _fetch_remote(path: str) -> str:
    d = _cache_dir("url:" + path)
    local = os.path.join(d, os.path.basename(path.rstrip("/")) or "download")
    if os.path.exists(local):
        return local
    # download to a temp name and rename into place only once complete, so
    # an interrupted transfer can never leave a truncated file that later
    # reads silently reuse (os.rename is atomic within the cache dir)
    tmp = local + f".part-{os.getpid()}"
    try:
        if path.startswith("s3://"):
            try:
                import boto3  # noqa: PLC0415
            except ImportError as e:
                raise NotImplementedError(
                    "s3:// ST_Read needs boto3, which is not installed in this "
                    "environment; stage the object locally or use s3a:// through "
                    "spark.read for parquet"
                ) from e
            bucket, _, key = path[len("s3://") :].partition("/")
            boto3.client("s3").download_file(bucket, key, tmp)
        else:
            import urllib.request  # noqa: PLC0415

            with urllib.request.urlopen(path) as r, open(tmp, "wb") as f:  # noqa: S310
                shutil.copyfileobj(r, f)
        os.rename(tmp, local)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return local


def localize(path: str, exts: tuple[str, ...] | None = None):
    """Local plain-file paths for a VFS path; None when ``path`` is not a
    VFS form (caller proceeds with its normal glob handling)."""
    if _is_remote(path):
        arch_member = _split_zip(path)
        if arch_member[0] is not None and not path.startswith("s3://"):
            # remote zip: fetch the archive, then recurse into it
            local_arch = _fetch_remote(arch_member[0])
            inner = f"{local_arch}!{arch_member[1]}" if arch_member[1] else local_arch
            return localize(inner, exts)
        local = _fetch_remote(path)
        return localize(local, exts) or [local]

    if path.startswith("/vsigzip/"):
        path = path[len("/vsigzip/") :]
    if path.lower().endswith(".gz") and os.path.exists(path):
        d = _cache_dir(f"gz:{path}:{os.path.getmtime(path)}")
        out = os.path.join(d, os.path.basename(path)[:-3])
        if not os.path.exists(out):
            with gzip.open(path, "rb") as src, open(out, "wb") as dst:
                shutil.copyfileobj(src, dst)
        return [out]

    arch, member = _split_zip(path)
    if arch is None:
        return None
    if not os.path.exists(arch):
        raise FileNotFoundError(f"zip archive not found: {arch!r}")
    d = _cache_dir(f"zip:{arch}:{os.path.getmtime(arch)}")
    with zipfile.ZipFile(arch) as z:
        names = [n for n in z.namelist() if not n.endswith("/")]
        if member:
            wanted = [n for n in names if fnmatch.fnmatch(n, member) or n == member]
            if not wanted:
                raise FileNotFoundError(f"no member matching {member!r} in {arch!r}")
        else:
            wanted = names
        out = []
        # multi-file datasets need their siblings on disk too: shapefile
        # (.shx/.dbf/.prj/.cpg), MapInfo TAB (.dat/.map/.id/.ind), MIF (.mid)
        _SIDECARS = {
            ".shp": (".shx", ".dbf", ".prj", ".cpg"),
            ".tab": (".dat", ".map", ".id", ".ind"),
            ".mif": (".mid",),
        }
        sidecars = set()
        for n in wanted:
            low = n.lower()
            for lead, exts_ in _SIDECARS.items():
                if low.endswith(lead):
                    stem = n[: -len(lead)]
                    sidecars.update(
                        m for m in names
                        if m.startswith(stem) and m.lower().endswith(exts_)
                    )
        for n in list(wanted) + sorted(sidecars - set(wanted)):
            dest = os.path.join(d, n.replace("/", "__"))
            if not os.path.exists(dest):
                with z.open(n) as src, open(dest, "wb") as f:
                    shutil.copyfileobj(src, f)
            out.append(dest)
        out = out[: len(wanted)]
    if exts:
        filt = [p for p in out if p.lower().endswith(tuple(e.lower() for e in exts))]
        if filt:
            return sorted(filt)
    return sorted(out)
