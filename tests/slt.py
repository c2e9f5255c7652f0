"""sqllogictest runner: executes the reference's own .test corpus
(/root/reference/test/sql) against this engine's Spark SQL surface.

The reference ships DuckDB sqllogictests; this adapter translates the
DuckDB dialect to Spark SQL (register_all names are identical) and
compares pinned expected outputs with sqllogictest conventions
(NULL/(empty)/true/false tokens, numeric tolerance). Unsupported
constructs (rtree pragmas, restart/attach, GDAL-only fixtures) skip with
a recorded reason instead of failing.
"""

from __future__ import annotations

import math
import os
import re
import shutil
import tempfile

REF_SQL = "/root/reference/test/sql"


class Unsupported(Exception):
    pass


# ---------------------------------------------------------------- parsing

def parse_records(text: str):
    """Yield (kind, payload) records: ('require', name) | ('statement', ok?,
    sql) | ('query', sortmode, sql, expected_lines) | ('loop', var, values)
    | ('endloop',)."""
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        tok = line.split()
        if tok[0] == "require":
            yield ("require", tok[1] if len(tok) > 1 else "")
            i += 1
        elif tok[0] in ("load", "restart", "attach", "use", "mode", "set"):
            yield ("meta", line)
            i += 1
        elif tok[0] == "foreach":
            yield ("loop", tok[1], tok[2:])
            i += 1
        elif tok[0] == "endloop":
            yield ("endloop",)
            i += 1
        elif tok[0] == "statement":
            ok = tok[1] == "ok"
            i += 1
            sql = []
            while i < len(lines) and lines[i].strip() and not lines[i].startswith("----"):
                sql.append(lines[i])
                i += 1
            expected = []
            if i < len(lines) and lines[i].startswith("----"):
                i += 1
                while i < len(lines) and lines[i].strip():
                    expected.append(lines[i])
                    i += 1
            yield ("statement", ok, "\n".join(sql), expected)
        elif tok[0] == "query":
            types = tok[1] if len(tok) > 1 else ""
            sortmode = tok[2] if len(tok) > 2 else "nosort"
            i += 1
            sql = []
            while i < len(lines) and not lines[i].startswith("----"):
                sql.append(lines[i])
                i += 1
            expected = []
            if i < len(lines) and lines[i].startswith("----"):
                i += 1
                while i < len(lines) and lines[i].strip():
                    expected.append(lines[i].rstrip("\n"))
                    i += 1
            yield ("query", sortmode, "\n".join(sql), expected, types)
        else:
            raise Unsupported(f"directive {tok[0]!r}")


def expand_loops(records):
    """Expand foreach/endloop by textual ${VAR} substitution."""
    out = []
    stack = []
    for rec in records:
        if rec[0] == "loop":
            stack.append((rec[1], rec[2], []))
        elif rec[0] == "endloop":
            var, values, body = stack.pop()
            expanded = []
            for v in values:
                for b in body:
                    expanded.append(_subst(b, var, v))
            if stack:
                stack[-1][2].extend(expanded)
            else:
                out.extend(expanded)
        elif stack:
            stack[-1][2].append(rec)
        else:
            out.append(rec)
    return out


def _subst(rec, var, val):
    def s(x):
        if isinstance(x, str):
            return x.replace("${" + var + "}", val)
        if isinstance(x, list):
            return [s(e) for e in x]
        return x

    return tuple(s(x) for x in rec)


# ------------------------------------------------------------ translation

_BOX_LIT = re.compile(
    r"\{\s*'?min_x'?\s*:\s*([^,]+?)\s*,\s*'?min_y'?\s*:\s*([^,]+?)\s*,"
    r"\s*'?max_x'?\s*:\s*([^,]+?)\s*,\s*'?max_y'?\s*:\s*([^}]+?)\s*\}\s*::\s*BOX_2D",
    re.I,
)
_STR_GEOM = re.compile(r"('(?:[^']|'')*')\s*::\s*GEOMETRY", re.I)
_PT_LIT = re.compile(
    r"\{\s*'x'\s*:\s*([^,]+?)\s*,\s*'y'\s*:\s*([^}]+?)\s*\}\s*::\s*POINT_2D", re.I
)
_XY = r"\{\s*'x'\s*:\s*([-\d.eE+]+)\s*,\s*'y'\s*:\s*([-\d.eE+]+)\s*\}"
_LINE_LIT = re.compile(r"\[((?:\s*" + _XY + r"\s*,?)*)\]\s*::\s*LINESTRING_2D", re.I)
_POLY_LIT = re.compile(r"\[\s*\[((?:\s*" + _XY + r"\s*,?)*)\]\s*\]\s*::\s*POLYGON_2D", re.I)


def _xy_wkt(body: str) -> str:
    pts = re.findall(_XY, body)
    return ", ".join(f"{x} {y}" for x, y in pts)
_NATIVE_CAST = re.compile(r"::\s*(POINT_2D|LINESTRING_2D|POLYGON_2D|GEOMETRY)\b", re.I)
_BOX_CAST = re.compile(r"::\s*BOX_2D\b", re.I)
_METHOD_CALL = re.compile(r"\(\s*('(?:[^']|'')*')\s*\)\s*\.\s*(\w+)\s*\(\s*\)")


def _split_top(s: str, sep: str = ","):
    """Split on sep at paren/quote depth 0."""
    out, cur, depth, inq = [], [], 0, False
    for ch in s:
        if ch == "'" :
            inq = not inq
            cur.append(ch)
        elif inq:
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _bracket_arrays(s: str) -> str:
    """DuckDB list literals [a, b] -> array(a, b); [] -> typed empty."""
    out, inq = [], False
    for ch in s:
        if ch == "'":
            inq = not inq
            out.append(ch)
        elif not inq and ch == "[":
            out.append("array(")
        elif not inq and ch == "]":
            out.append(")")
        else:
            out.append(ch)
    s = "".join(out)
    return s.replace("array()", "CAST(array() AS ARRAY<BINARY>)")


def _arity(arglist: str) -> int:
    a = arglist.strip()
    return 0 if not a else len(_split_top(a))


def _rename_by_arity(s: str) -> str:
    """Map DuckDB's overloaded names onto this engine's suffixed SQL names
    (Spark cannot overload a UDF name): ST_MakeLine(a, b) -> ST_MakeLine2,
    ST_RemoveRepeatedPoints(g, tol) -> ..._tol, 1-arg ST_CollectionExtract
    -> ST_CollectionExtract1."""
    rules = {
        "st_makeline": {2: "ST_MakeLine2"},
        "st_removerepeatedpoints": {2: "ST_RemoveRepeatedPoints_Tol"},
        "st_collectionextract": {1: "ST_CollectionExtract1"},
        "st_makepolygon": {2: "ST_MakePolygon_Holes"},
        "st_buffer": {3: "ST_Buffer_NSeg", 5: "ST_Buffer_Style"},
        "st_linemerge": {2: "ST_LineMerge_Directed"},
        # reference 3-arg ST_Transform defaults always_xy=false; ours takes 4
        "st_transform": {3: ("ST_Transform", ", false")},
    }
    res = []
    i = 0
    low = s.lower()
    while i < len(s):
        matched = False
        for name, by_n in rules.items():
            if low.startswith(name, i) and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")):
                j = i + len(name)
                while j < len(s) and s[j].isspace():
                    j += 1
                if j < len(s) and s[j] == "(":
                    # find matching close paren
                    depth, k, inq = 0, j, False
                    while k < len(s):
                        ch = s[k]
                        if ch == "'":
                            inq = not inq
                        elif not inq and ch == "(":
                            depth += 1
                        elif not inq and ch == ")":
                            depth -= 1
                            if depth == 0:
                                break
                        k += 1
                    inner = _rename_by_arity(s[j + 1:k])
                    n = _arity(inner)
                    new = by_n.get(n, s[i:i + len(name)])
                    extra = ""
                    if isinstance(new, tuple):
                        new, extra = new
                    res.append(f"{new}({inner}{extra})")
                    i = k + 1
                    matched = True
                    break
        if not matched:
            res.append(s[i])
            i += 1
    return "".join(res)


_VALUES_RE = re.compile(r"\bVALUES\b", re.I)


def _rewrite_values(s: str) -> str:
    """Spark inline tables (VALUES ...) cannot evaluate UDF expressions;
    rewrite every VALUES list into a UNION ALL of SELECTs (alias column
    names from a trailing `AS t(c1, c2)` when present)."""
    m = _VALUES_RE.search(s)
    if not m:
        return s
    # find the span of the VALUES tuple list: sequence of (...) groups
    # separated by commas
    i = m.end()
    tuples = []
    n = len(s)
    while True:
        while i < n and (s[i].isspace() or s[i] == ","):
            i += 1
        if i >= n or s[i] != "(":
            break
        depth, j, inq = 0, i, False
        while j < n:
            ch = s[j]
            if ch == "'":
                inq = not inq
            elif not inq and ch == "(":
                depth += 1
            elif not inq and ch == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        tuples.append(s[i + 1:j])
        i = j + 1
    if not tuples:
        return s
    head = s[:m.start()]
    tail = s[i:]

    def union(names=None):
        selects = []
        for t in tuples:
            cols = _split_top(t)
            if names:
                cols = [f"{c.strip()} AS {names[k]}" for k, c in enumerate(cols)]
            selects.append("SELECT " + ", ".join(c.strip() for c in cols))
        return " UNION ALL ".join(selects)

    if re.match(r"\s*INSERT\b", head, re.I):
        # INSERT INTO t VALUES (...), (...) -> INSERT INTO t SELECT ... UNION ALL ...
        return head + union() + tail
    stripped = tail.lstrip()
    if stripped.startswith(")"):
        # FROM ( VALUES (...), (...) ) [AS] t(c1, c2)
        after = stripped[1:]
        alias = re.match(r"\s*(?:AS\s+)?(\w+)\s*\(([^)]*)\)", after, re.I)
        hh = head.rstrip()
        if alias and hh.endswith("("):
            names = [c.strip() for c in alias.group(2).split(",")]
            rest = after[alias.end():]
            return f"{hh[:-1]}({union(names)}) AS {alias.group(1)}{rest}"
        return f"{hh[:-1] if hh.endswith('(') else hh}({union()}){after if alias is None else after}"
    # bare VALUES list in other positions: wrap as a subquery
    return f"{head}({union()}){tail}"


def translate(sql: str, workdir: str, testdir: str) -> str:
    s = sql
    if "__WORKING_DIRECTORY__" in s:
        s = s.replace("__WORKING_DIRECTORY__", workdir)
    if "__TEST_DIR__" in s:
        s = s.replace("__TEST_DIR__", testdir)
    # UNNEST(expr, recursive := true) over a list<struct> -> inline(expr):
    # the struct fields become the output columns; an inner list column
    # (ST_Dump's path) stays a list, matching DuckDB's rendering
    s = re.sub(r"UNNEST\s*\(\s*(.*?)\s*,\s*recursive\s*:=\s*true\s*\)",
               r"inline(\1)", s, flags=re.I | re.S)
    # ::BLOB on an already-binary expression is an identity cast
    s = re.sub(r"\)\s*::\s*BLOB\b", ")", s, flags=re.I)
    low = s.lower()
    for kw, why in (
        ("pragma", "DuckDB pragma"),
        ("create index", "rtree physical index (analog: plans/pruning.py)"),
        ("drop index", "rtree physical index"),
        ("install", "extension management"),
        ("st_read", "table function call-site (analog: sources.st_read)"),
        ("copy ", "COPY syntax (analog: sources.write_*)"),
        ("explain", "physical-plan text differs by engine"),
        ("summarize", "DuckDB meta-command"),
        ("::blob", "blob-literal cast dialect"),
        ("from glob", "DuckDB glob table function"),
        (":=", "DuckDB named-argument call"),
        ("unnest", "DuckDB struct-unnest semantics"),
        ("attach", "ATTACH database"),
        ("detach", "ATTACH database"),
        ("export database", "EXPORT DATABASE"),
        ("import database", "EXPORT DATABASE"),
    ):
        if kw in low:
            raise Unsupported(why)
    if re.match(r"\s*use\s+\w+\s*;?\s*$", s, re.I):
        raise Unsupported("USE database")
    # DuckDB tolerates a trailing comma in the select list
    s = re.sub(r",\s*(FROM\b)", r" \1", s, flags=re.I)
    # st_astext over a BOX_2D-returning ST_Extent: DuckDB renders the box
    # text form via an implicit cast; our struct needs the named composition
    s = re.sub(r"st_astext\s*\(\s*st_extent\s*\(", "ST_Extent_Text((", s, flags=re.I)
    # (expr).Fn() postfix call syntax -> Fn(expr); loop to unwrap chains like
    # ('wkt').ST_GeomFromText().ST_AsWKB()
    prev = None
    while prev != s:
        prev = s
        s = _METHOD_CALL.sub(lambda m: f"{m.group(2)}({m.group(1)})", s)
        s = re.sub(r"(\w+\((?:[^()']|'(?:[^']|'')*'|\([^()]*\))*\))\s*\.\s*(\w+)\s*\(\s*\)",
                   lambda m: f"{m.group(2)}({m.group(1)})", s)
    # {'min_x': ...}::BOX_2D literal -> envelope constructor
    s = _BOX_LIT.sub(lambda m: f"ST_MakeEnvelope({m.group(1)}, {m.group(2)}, {m.group(3)}, {m.group(4)})", s)
    # {'x': ..}::POINT_2D and vertex-struct-list LINESTRING_2D/POLYGON_2D
    # literals -> WKT constructors
    s = _PT_LIT.sub(lambda m: f"ST_Point({m.group(1)}, {m.group(2)})", s)
    s = _LINE_LIT.sub(lambda m: f"ST_GeomFromText('LINESTRING ({_xy_wkt(m.group(1))})')", s)
    s = _POLY_LIT.sub(lambda m: f"ST_GeomFromText('POLYGON (({_xy_wkt(m.group(1))}))')", s)
    # DuckDB reads parquet by quoting the path as a table
    s = re.sub(r"FROM\s+'([^']+\.parquet)'", lambda m: f"FROM parquet.`{m.group(1)}`", s, flags=re.I)
    # 'WKT'::GEOMETRY -> ST_GeomFromText('WKT')
    s = _STR_GEOM.sub(lambda m: f"ST_GeomFromText({m.group(1)})", s)
    # DuckDB's implicit VARCHAR->GEOMETRY coercion in function args: wrap
    # bare WKT string literals, except when already inside ST_GeomFromText
    def _wrap_wkt(m):
        before = s[:m.start()].rstrip().lower()
        if before.endswith("fromtext(") or before.endswith("fromtext"):
            return m.group(0)
        return f"ST_GeomFromText({m.group(0)})"

    s = re.sub(
        r"'(?:POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON|GEOMETRYCOLLECTION)"
        r"(?:[^']|'')*'",
        _wrap_wkt, s, flags=re.I,
    )
    # expr::BOX_2D on non-literals: the source is a geometry expression and
    # the cast takes its bbox — refuse (can't see the expression boundary)
    if _BOX_CAST.search(s):
        raise Unsupported("::BOX_2D cast on expression")
    # native-type casts are value-preserving through the uniform WKB path
    s = _NATIVE_CAST.sub("", s)
    # list literals
    s = _bracket_arrays(s)
    # overload dispatch by arity
    s = _rename_by_arity(s)
    # GEOMETRY / native column types in DDL -> engine-canonical WKB BINARY
    # (CREATE TABLE only — 'geometry' is also a common column NAME)
    if re.match(r"\s*CREATE\s+", s, re.I):
        s = re.sub(r"\b(GEOMETRY|POINT_2D|LINESTRING_2D|POLYGON_2D|BOX_2D)\b(?=\s*[,)])",
                   "BINARY", s, flags=re.I)
        s = re.sub(r"\bVARCHAR\b(?!\s*\()", "STRING", s, flags=re.I)
    # inline tables with UDF expressions
    s = _rewrite_values(s)
    return s


# ------------------------------------------------------------- comparison

def _norm_token(v, ty: str = "") -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (bytes, bytearray)):
        # DuckDB's sqllogictest renders GEOMETRY as WKT; our canonical form
        # is WKB — decode for comparison (hex-upper for non-geometry blobs)
        try:
            from duckdb_spatial_spark.geo import from_wkb, to_wkt

            return to_wkt(from_wkb(bytes(v)))
        except Exception:  # noqa: BLE001
            return bytes(v).hex().upper()
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        return str(int(v))
    if hasattr(v, "asDict"):  # Row -> DuckDB struct rendering
        inner = ", ".join(f"'{k}': {_norm_token(x)}" for k, x in v.asDict().items())
        return "{" + inner + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_norm_token(x) for x in v) + "]"
    return str(v)


_NUM_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


def _float_close(a: float, b: float) -> bool:
    if math.isnan(a) and math.isnan(b):
        return True
    return abs(a - b) <= 1e-7 * max(1.0, abs(a), abs(b))


def _tokens_match(exp: str, got: str) -> bool:
    if exp == got:
        return True
    if exp == "(empty)" and got == "":
        return True
    try:
        return _float_close(float(exp), float(got))
    except ValueError:
        pass
    # WKT-ish strings: engines agree on structure but can differ in the
    # last ulp of printed coordinates — compare skeleton + numbers
    skel_e, skel_g = _NUM_RE.sub("#", exp), _NUM_RE.sub("#", got)
    if skel_e != skel_g or "#" not in skel_e:
        return False
    nums_e = [float(x) for x in _NUM_RE.findall(exp)]
    nums_g = [float(x) for x in _NUM_RE.findall(got)]
    return len(nums_e) == len(nums_g) and all(
        _float_close(a, b) for a, b in zip(nums_e, nums_g)
    )


def compare(expected_lines, rows, sortmode: str, types: str = ""):
    got_lines = []
    for r in rows:
        got_lines.append("\t".join(
            _norm_token(v, types[k] if k < len(types) else "") for k, v in enumerate(r)))
    exp = list(expected_lines)
    # sqllogictest also accepts one-value-per-line layout for single rows
    if len(exp) != len(got_lines) and got_lines and exp:
        ncols = len(got_lines[0].split("\t"))
        if ncols > 1 and len(exp) == len(got_lines) * ncols:
            exp = ["\t".join(exp[i * ncols:(i + 1) * ncols]) for i in range(len(got_lines))]
    if sortmode == "rowsort" or (sortmode == "valuesort-auto"):
        exp = sorted(exp)
        got_lines = sorted(got_lines)
    if len(exp) != len(got_lines):
        return False, f"row count: expected {len(exp)}, got {len(got_lines)}"
    for e, g in zip(exp, got_lines):
        # some corpus files separate columns with runs of tabs
        et, gt = re.split(r"\t+", e), g.split("\t")
        if len(et) != len(gt) or not all(_tokens_match(a, b) for a, b in zip(et, gt)):
            return False, f"expected {e!r}, got {g!r}"
    return True, ""


# --------------------------------------------------------------- executor

_ST_READ_CALL = re.compile(
    r"\b(st_read|st_readshp|st_readosm)\s*\(\s*'([^']+)'\s*(?:,\s*([^()]*))?\)", re.I
)
_COPY_GDAL = re.compile(
    r"^\s*COPY\s*\((.+)\)\s*TO\s*'([^']+)'\s*(?:WITH\s*)?\(([^()]*)\)\s*;?\s*$",
    re.I | re.S,
)


def _parse_copy_opts(raw: str) -> dict:
    """``FORMAT GDAL, DRIVER 'GeoJSONSeq', GEOMETRY_TYPE 'POINT'`` -> dict."""
    out = {}
    for tok in _split_top(raw, ","):
        tok = tok.strip()
        if not tok:
            continue
        parts = tok.split(None, 1)
        key = parts[0].lower()
        val = parts[1].strip() if len(parts) > 1 else ""
        out[key] = val.strip("'\"")
    return out


def run_file(spark, path: str, workdir: str | None = None):
    """Run one .test file. Returns dict with counts and details.

    GDAL call sites run for real: ``st_read('p')`` / ``st_readshp`` in FROM
    position are lifted into temp views backed by ``sources.st_read`` (with
    DuckDB's implicit ``rowid`` pseudo-column exposed), and ``COPY ... TO
    ... (FORMAT GDAL, DRIVER 'X')`` dispatches to the matching ``write_*``
    sink. Writes aimed under the read-only reference checkout land in a
    shadow directory that later reads resolve first."""
    # __WORKING_DIRECTORY__ is the reference repo root (tests reference
    # fixtures as __WORKING_DIRECTORY__/test/data/...)
    workdir = workdir or os.path.dirname(os.path.dirname(REF_SQL.rstrip("/")))
    testdir = tempfile.mkdtemp(prefix="slt_")
    text = open(path, "r", encoding="utf-8").read()
    res = {"file": os.path.relpath(path, REF_SQL), "pass": 0, "fail": 0,
           "skip": 0, "failures": [], "skips": []}
    created = []
    views: dict = {}

    def _subst_paths(s: str) -> str:
        return s.replace("__WORKING_DIRECTORY__", workdir).replace("__TEST_DIR__", testdir)

    def _opaque(p: str) -> bool:
        return p.startswith("/vsi") or "://" in p or "!" in p

    def _resolve(p: str, for_write: bool = False) -> str:
        if _opaque(p):
            return p
        if p.startswith(workdir):
            sp = os.path.join(testdir, "shadow", os.path.relpath(p, workdir))
            if for_write:
                os.makedirs(os.path.dirname(sp), exist_ok=True)
                return sp
            return sp if os.path.exists(sp) else p
        return p

    def _lift_reads(s: str) -> str:
        from pyspark.sql import functions as F

        def repl(m):
            fn, p, extra = m.group(1).lower(), m.group(2), (m.group(3) or "").strip()
            rp = _resolve(p)
            if not _opaque(rp) and not os.path.exists(rp):
                raise Unsupported(f"missing fixture {os.path.basename(p)}")
            key = (fn, rp, extra.lower())
            if key not in views:
                from duckdb_spatial_spark.sources import st_read as _st_read
                from duckdb_spatial_spark.sources.shapefile import read_shapefile

                if fn == "st_readshp":
                    df = read_shapefile(spark, rp)
                elif fn == "st_readosm":
                    from duckdb_spatial_spark.sources.osm import read_osm

                    df = read_osm(spark, rp)
                else:
                    df = _st_read(spark, rp)
                if re.search(r"keep_wkb\s*=\s*true", extra, re.I):
                    df = df.withColumnRenamed("geom", "wkb_geometry")
                elif extra:
                    raise Unsupported(f"st_read option {extra!r}")
                # DuckDB's implicit rowid pseudo-column: only materialized
                # when the test references it (it must not surface in
                # SELECT * column lists, which pin exact output columns)
                if ("rowid" in text.lower()
                        and "rowid" not in [c.lower() for c in df.columns]):
                    df = df.withColumn("rowid", F.monotonically_increasing_id())
                name = f"_slt_read_{len(views)}"
                df.createOrReplaceTempView(name)
                views[key] = name
            return views[key]

        return _ST_READ_CALL.sub(repl, s)

    def _prep_copy(cm):
        """Validate a GDAL COPY and return a thunk that executes it (writer
        errors must surface at execution time for statement-error blocks)."""
        inner, target, raw_opts = cm.group(1), cm.group(2), cm.group(3)
        opts = _parse_copy_opts(raw_opts)
        if opts.get("format", "").upper() != "GDAL":
            raise Unsupported(f"COPY format {opts.get('format')!r}")
        drv = opts.get("driver", "").lower().replace(" ", "")
        tsql = translate(_lift_reads(inner), workdir, testdir)

        def run():
            from pyspark.sql import types as ST

            from duckdb_spatial_spark.sources import (
                write_gdb,
                write_geojson,
                write_gpkg,
                write_kml,
                write_mif,
                write_shapefile,
                write_xlsx,
            )
            from duckdb_spatial_spark.sources.flatgeobuf import write_flatgeobuf

            df = spark.sql(tsql)
            bincols = [f.name for f in df.schema.fields if isinstance(f.dataType, ST.BinaryType)]
            if bincols and "geom" not in df.columns:
                df = df.withColumnRenamed(bincols[0], "geom")
            tgt = _resolve(target, for_write=True)
            if drv == "geojson":
                write_geojson(df, tgt, style="collection")
            elif drv == "geojsonseq":
                write_geojson(df, tgt, style="lines")
            elif drv in ("esrishapefile",):
                write_shapefile(df, tgt)
            elif drv == "openfilegdb":
                write_gdb(df, tgt, geometry_type=opts.get("geometry_type"))
            elif drv == "xlsx":
                write_xlsx(df, tgt)
            elif drv == "gpkg":
                write_gpkg(df, tgt)
            elif drv == "kml":
                write_kml(df, tgt)
            elif drv in ("mapinfofile",):
                write_mif(df, tgt)
            elif drv == "flatgeobuf":
                write_flatgeobuf(df, tgt)
            else:
                raise Unsupported(f"GDAL driver {opts.get('driver')!r}")

        if drv not in ("geojson", "geojsonseq", "esrishapefile", "openfilegdb",
                       "xlsx", "gpkg", "kml", "mapinfofile", "flatgeobuf"):
            raise Unsupported(f"GDAL driver {opts.get('driver')!r}")
        return run
    try:
        records = expand_loops(list(parse_records(text)))
    except Unsupported as e:
        res["skip"] += 1
        res["skips"].append(f"file: {e}")
        return res
    try:
        for rec in records:
            if rec[0] == "require":
                if rec[1] not in ("spatial", "parquet", ""):
                    res["skip"] += 1
                    res["skips"].append(f"require {rec[1]}")
                    return res
                continue
            if rec[0] == "meta":
                res["skip"] += 1
                res["skips"].append(rec[1].split()[0])
                return res  # restart/attach/load semantics not replicable
            if rec[0] == "statement":
                _, ok, sql, _exp = rec
                try:
                    parts = [p for p in _split_top(sql, ";") if p.strip()]
                    tparts = []
                    for p in parts:
                        p = _subst_paths(p)
                        cm = _COPY_GDAL.match(p)
                        if cm:
                            tparts.append(_prep_copy(cm))
                        else:
                            tparts.append(translate(_lift_reads(p), workdir, testdir))
                except Unsupported as e:
                    res["skip"] += 1
                    res["skips"].append(str(e))
                    if "ATTACH" in str(e) or "USE database" in str(e):
                        return res  # later statements depend on the attach
                    continue
                try:
                    for tsql in tparts:
                        if callable(tsql):  # prepared GDAL COPY
                            tsql()
                            continue
                        m = re.match(r"\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(\w+)", tsql, re.I)
                        if m:
                            name = m.group(2)
                            spark.sql(f"DROP TABLE IF EXISTS {name}")
                            loc = os.path.join(testdir, f"tbl_{name}")
                            shutil.rmtree(loc, ignore_errors=True)
                            if re.search(r"\bAS\s+SELECT\b", tsql, re.I):
                                spark.sql(re.sub(r"(TABLE\s+\w+)", rf"\1 USING parquet LOCATION '{loc}'", tsql, count=1, flags=re.I))
                            else:
                                spark.sql(re.sub(r"\)\s*;?\s*$", f") USING parquet LOCATION '{loc}'", tsql, count=1))
                            created.append(name)
                        else:
                            # force evaluation: SELECT statements are lazy
                            # and UDF errors only surface on an action
                            spark.sql(tsql).collect()
                    if ok:
                        res["pass"] += 1
                    else:
                        res["fail"] += 1
                        res["failures"].append(f"expected error, none raised: {sql[:120]}")
                except Exception as e:  # noqa: BLE001
                    if ok:
                        res["fail"] += 1
                        res["failures"].append(f"{sql[:120]} -> {type(e).__name__}: {str(e)[:200]}")
                    else:
                        res["pass"] += 1
                continue
            if rec[0] == "query":
                _, sortmode, sql, expected, types = rec
                try:
                    tsql = translate(_lift_reads(_subst_paths(sql)), workdir, testdir)
                except Unsupported as e:
                    res["skip"] += 1
                    res["skips"].append(str(e))
                    continue
                if sortmode == "nosort" and "order by" not in sql.lower():
                    # Spark gives no deterministic scan order for unordered
                    # queries (DuckDB preserves insertion order) — compare
                    # as a sorted multiset
                    sortmode = "valuesort-auto"
                try:
                    rows = spark.sql(tsql).collect()
                except Exception as e:  # noqa: BLE001
                    res["fail"] += 1
                    res["failures"].append(f"{sql[:120]} -> {type(e).__name__}: {str(e)[:200]}")
                    continue
                okc, why = compare(expected, rows, sortmode, types)
                if okc:
                    res["pass"] += 1
                else:
                    res["fail"] += 1
                    res["failures"].append(f"{sql[:120]} -> {why}")
    finally:
        for name in created:
            try:
                spark.sql(f"DROP TABLE IF EXISTS {name}")
            except Exception:  # noqa: BLE001
                pass
        shutil.rmtree(testdir, ignore_errors=True)
    return res


def run_corpus(spark, root: str = REF_SQL):
    results = []
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".test"):
                results.append(run_file(spark, os.path.join(dirpath, f)))
    return results
