"""Geometry support: WKT <-> WKB codec, bbox statistics, Spark ST_* UDFs.

Reference parity: the geo sqllogictest corpus
(/root/reference/tests/sqllogictests/sql/geo/ducklake_geometry*.test) —
DuckLake stores GEOMETRY columns as WKB blobs in parquet and records a
per-file ``extra_stats`` JSON on the column stats row:

    {"bbox": {"xmin": .., "xmax": .., "ymin": .., "ymax": ..,
              "zmin": .., "zmax": .., "mmin": .., "mmax": ..},
     "types": ["point", "linestring_z", ...]}

The container has neither DuckDB's spatial extension nor shapely, so the
codec here is self-contained: ISO WKB (geometry codes 1-7, +1000 for Z,
+2000 for M, +3000 for ZM; both byte orders on read, little-endian on
write) and the matching WKT dialect (``POINT Z (1 2 3)`` etc.).

Scale note: the ST_* functions are Arrow-batched pandas UDFs (the only
sound choice — WKB is an opaque byte format Spark expressions can't
destructure); bbox statistics are computed once per written file from a
single-column read, the same cost class as writing the file itself.
"""

from __future__ import annotations

import json
import math
import struct
from typing import Iterable, Optional

import pandas as pd

_TYPE_NAMES = {1: "point", 2: "linestring", 3: "polygon", 4: "multipoint",
               5: "multilinestring", 6: "multipolygon",
               7: "geometrycollection"}
_TYPE_CODES = {v: k for k, v in _TYPE_NAMES.items()}


class GeoError(ValueError):
    pass


# ---------------------------------------------------------------- WKT parse

def _tokenize_wkt(s: str) -> list[str]:
    out, cur = [], []
    for ch in s:
        if ch in "(),":
            if cur:
                out.append("".join(cur))
                cur = []
            out.append(ch)
        elif ch.isspace():
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


class _Tokens:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise GeoError("unexpected end of WKT")
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t != tok:
            raise GeoError(f"expected {tok!r} in WKT, got {t!r}")


def _parse_coords(tk: _Tokens, dim: int) -> list[float]:
    vals = []
    for _ in range(dim):
        t = tk.next()
        try:
            vals.append(float(t))
        except ValueError:
            raise GeoError(f"bad coordinate {t!r}")
    return vals


def _parse_point_text(tk: _Tokens, dim: int) -> list[float]:
    if tk.peek() == "EMPTY":
        tk.next()
        return [math.nan] * dim
    tk.expect("(")
    c = _parse_coords(tk, dim)
    tk.expect(")")
    return c


def _parse_ring(tk: _Tokens, dim: int) -> list[list[float]]:
    tk.expect("(")
    pts = [_parse_coords(tk, dim)]
    while tk.peek() == ",":
        tk.next()
        pts.append(_parse_coords(tk, dim))
    tk.expect(")")
    return pts


def _parse_rings(tk: _Tokens, dim: int) -> list[list[list[float]]]:
    tk.expect("(")
    rings = [_parse_ring(tk, dim)]
    while tk.peek() == ",":
        tk.next()
        rings.append(_parse_ring(tk, dim))
    tk.expect(")")
    return rings


def _wkb_header(code: int, has_z: bool, has_m: bool) -> bytes:
    c = code + (1000 if has_z else 0) + (2000 if has_m else 0)
    return struct.pack("<BI", 1, c)


def _parse_geometry(tk: _Tokens) -> bytes:
    kind = tk.next().upper()
    if kind.lower() not in _TYPE_CODES:
        raise GeoError(f"unknown geometry type {kind!r}")
    has_z = has_m = False
    while tk.peek() in ("Z", "M", "ZM"):
        flag = tk.next()
        has_z = has_z or "Z" in flag
        has_m = has_m or "M" in flag
    dim = 2 + has_z + has_m
    code = _TYPE_CODES[kind.lower()]
    head = _wkb_header(code, has_z, has_m)
    pk = "<" + "d" * dim

    def pack_pts(pts: Iterable[list[float]]) -> bytes:
        pts = list(pts)
        return struct.pack("<I", len(pts)) + b"".join(
            struct.pack(pk, *p) for p in pts)

    if kind == "POINT":
        return head + struct.pack(pk, *_parse_point_text(tk, dim))
    if kind == "LINESTRING":
        if tk.peek() == "EMPTY":
            tk.next()
            return head + struct.pack("<I", 0)
        return head + pack_pts(_parse_ring(tk, dim))
    if kind == "POLYGON":
        if tk.peek() == "EMPTY":
            tk.next()
            return head + struct.pack("<I", 0)
        rings = _parse_rings(tk, dim)
        return head + struct.pack("<I", len(rings)) + b"".join(
            pack_pts(r) for r in rings)
    if kind in ("MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON",
                "GEOMETRYCOLLECTION"):
        if tk.peek() == "EMPTY":
            tk.next()
            return head + struct.pack("<I", 0)
        tk.expect("(")
        parts = []
        while True:
            if kind == "GEOMETRYCOLLECTION":
                parts.append(_parse_geometry(tk))
            elif kind == "MULTIPOINT":
                # both MULTIPOINT ((1 2), (3 4)) and MULTIPOINT (1 2, 3 4)
                sub_head = _wkb_header(1, has_z, has_m)
                if tk.peek() == "(":
                    tk.next()
                    c = _parse_coords(tk, dim)
                    tk.expect(")")
                else:
                    c = _parse_coords(tk, dim)
                parts.append(sub_head + struct.pack(pk, *c))
            elif kind == "MULTILINESTRING":
                parts.append(_wkb_header(2, has_z, has_m)
                             + pack_pts(_parse_ring(tk, dim)))
            else:  # MULTIPOLYGON
                rings = _parse_rings(tk, dim)
                parts.append(_wkb_header(3, has_z, has_m)
                             + struct.pack("<I", len(rings))
                             + b"".join(pack_pts(r) for r in rings))
            if tk.peek() == ",":
                tk.next()
                continue
            tk.expect(")")
            break
        return head + struct.pack("<I", len(parts)) + b"".join(parts)
    raise GeoError(f"unhandled geometry type {kind!r}")


def wkt_to_wkb(wkt: str) -> bytes:
    """Parse a WKT string into little-endian ISO WKB."""
    tk = _Tokens(_tokenize_wkt(wkt.strip()))
    out = _parse_geometry(tk)
    if tk.peek() is not None:
        raise GeoError(f"trailing tokens in WKT: {tk.peek()!r}")
    return out


# ---------------------------------------------------------------- WKB parse

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.i = 0

    def header(self) -> tuple[int, bool, bool, str]:
        order = self.buf[self.i]
        endian = "<" if order == 1 else ">"
        (code,) = struct.unpack_from(endian + "I", self.buf, self.i + 1)
        self.i += 5
        has_z = has_m = False
        base = code
        # ISO WKB: +1000 Z, +2000 M, +3000 ZM; also honor the EWKB
        # high-bit flags (0x80000000 Z, 0x40000000 M) some writers emit.
        if base & 0x80000000:
            has_z, base = True, base & ~0x80000000
        if base & 0x40000000:
            has_m, base = True, base & ~0x40000000
        base &= 0x0FFFFFFF
        if base >= 3000:
            has_z = has_m = True
            base -= 3000
        elif base >= 2000:
            has_m = True
            base -= 2000
        elif base >= 1000:
            has_z = True
            base -= 1000
        if base not in _TYPE_NAMES:
            raise GeoError(f"unknown WKB geometry code {code}")
        return base, has_z, has_m, endian

    def u32(self, endian: str) -> int:
        (v,) = struct.unpack_from(endian + "I", self.buf, self.i)
        self.i += 4
        return v

    def coords(self, endian: str, dim: int, n: int) -> list[tuple]:
        fmt = endian + "d" * (dim * n)
        flat = struct.unpack_from(fmt, self.buf, self.i)
        self.i += 8 * dim * n
        return [flat[k * dim:(k + 1) * dim] for k in range(n)]


def _walk(r: _Reader, on_coords, type_names: set, depth: int = 0) -> None:
    base, has_z, has_m, endian = r.header()
    dim = 2 + has_z + has_m
    suffix = ("_zm" if has_z and has_m else
              "_z" if has_z else "_m" if has_m else "")
    if depth == 0:
        # stats record the TOP-LEVEL type of each value (a collection's
        # children widen the bbox but not the type list — the reference
        # corpus shows ["point"] / ["linestring_z"] per stored value)
        type_names.add(_TYPE_NAMES[base] + suffix)
    if base == 1:
        on_coords(r.coords(endian, dim, 1), has_z, has_m)
    elif base == 2:
        n = r.u32(endian)
        on_coords(r.coords(endian, dim, n), has_z, has_m)
    elif base == 3:
        for _ in range(r.u32(endian)):
            n = r.u32(endian)
            on_coords(r.coords(endian, dim, n), has_z, has_m)
    else:
        for _ in range(r.u32(endian)):
            _walk(r, on_coords, type_names, depth + 1)


def wkb_bbox(wkb: bytes) -> tuple[list[Optional[float]], set]:
    """(bbox [xmin,xmax,ymin,ymax,zmin,zmax,mmin,mmax] with None for
    absent dims, type-name set) of one WKB geometry."""
    lo = [math.inf] * 4
    hi = [-math.inf] * 4
    seen = [False] * 4

    def on_coords(pts, has_z, has_m):
        for p in pts:
            vals = [p[0], p[1]]
            k = 2
            if has_z:
                vals.append(p[k])
                k += 1
            else:
                vals.append(None)
            vals.append(p[k] if has_m else None)
            for d, v in enumerate(vals):
                if v is None or math.isnan(v):
                    continue
                seen[d] = True
                if v < lo[d]:
                    lo[d] = v
                if v > hi[d]:
                    hi[d] = v

    types: set = set()
    _walk(_Reader(wkb), on_coords, types)
    bbox: list[Optional[float]] = []
    for d in range(4):
        bbox.extend([lo[d], hi[d]] if seen[d] else [None, None])
    return bbox, types


def wkb_to_wkt(wkb: bytes) -> str:
    """Render WKB as WKT (DuckDB spatial's shape: ``POINT (1 2)``,
    ``LINESTRING Z (5 5 5, 10 10 10)``)."""
    r = _Reader(wkb)
    return _render(r)


def _fmt(v: float) -> str:
    if math.isnan(v):
        return "nan"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _render(r: _Reader) -> str:
    base, has_z, has_m, endian = r.header()
    dim = 2 + has_z + has_m
    name = _TYPE_NAMES[base].upper()
    flag = (" ZM" if has_z and has_m else
            " Z" if has_z else " M" if has_m else "")
    head = name + flag

    def pts_text(pts) -> str:
        return ", ".join(" ".join(_fmt(c) for c in p) for p in pts)

    if base == 1:
        p = r.coords(endian, dim, 1)[0]
        if all(math.isnan(c) for c in p):
            return head + " EMPTY"
        return f"{head} ({pts_text([p])})"
    if base == 2:
        n = r.u32(endian)
        if n == 0:
            return head + " EMPTY"
        return f"{head} ({pts_text(r.coords(endian, dim, n))})"
    if base == 3:
        nr = r.u32(endian)
        if nr == 0:
            return head + " EMPTY"
        rings = []
        for _ in range(nr):
            n = r.u32(endian)
            rings.append(f"({pts_text(r.coords(endian, dim, n))})")
        return f"{head} ({', '.join(rings)})"
    n = r.u32(endian)
    if n == 0:
        return head + " EMPTY"
    parts = []
    for _ in range(n):
        sub = _render(r)
        if base == 7:
            parts.append(sub)
        elif "(" in sub:
            # strip the child's "POINT "/"LINESTRING Z " prefix: WKT
            # multi-geometries list parenthesized coordinate bodies
            body = sub.split("(", 1)[1].rsplit(")", 1)[0]
            parts.append(f"({body})")
        else:
            parts.append("EMPTY")
    return f"{head} ({', '.join(parts)})"


# ------------------------------------------------------------- extra_stats

def _fmt_stat(v: Optional[float]) -> str:
    return "null" if v is None else f"{v:.6f}"


def bbox_to_extra_stats(bbox: list[Optional[float]],
                        types: Iterable[str]) -> str:
    """Render the DuckLake ``extra_stats`` JSON exactly as the reference
    corpus expects it (6-decimal floats, null for absent dims, sorted
    type list)."""
    keys = ["xmin", "xmax", "ymin", "ymax", "zmin", "zmax", "mmin", "mmax"]
    body = ", ".join(f'"{k}": {_fmt_stat(v)}' for k, v in zip(keys, bbox))
    tl = ", ".join(f'"{t}"' for t in sorted(set(types)))
    return f'{{"bbox": {{{body}}}, "types": [{tl}]}}'


def merge_extra_stats(blobs: Iterable[str]) -> Optional[str]:
    """Union several extra_stats JSONs (file-level -> table-level)."""
    keys = ["xmin", "xmax", "ymin", "ymax", "zmin", "zmax", "mmin", "mmax"]
    acc: list[Optional[float]] = [None] * 8
    types: set = set()
    any_seen = False
    for blob in blobs:
        if not blob:
            continue
        any_seen = True
        d = json.loads(blob)
        bb = d.get("bbox", {})
        for i, k in enumerate(keys):
            v = bb.get(k)
            if v is None:
                continue
            if acc[i] is None:
                acc[i] = v
            elif i % 2 == 0:
                acc[i] = min(acc[i], v)
            else:
                acc[i] = max(acc[i], v)
        types.update(d.get("types", []))
    if not any_seen:
        return None
    return bbox_to_extra_stats(acc, types)


def file_extra_stats(path: str, column: str) -> Optional[str]:
    """extra_stats JSON for one geometry column of one parquet file (a
    single-column read; called once per written file, same cost class as
    writing the file). None when every value is NULL."""
    import pyarrow.parquet as pq

    table = pq.read_table(path, columns=[column])
    bbox_acc: list[Optional[float]] = [None] * 8
    types: set = set()
    seen = False
    for chunk in table.column(0).chunks:
        for v in chunk:
            b = v.as_py()
            if b is None:
                continue
            seen = True
            bbox, t = wkb_bbox(bytes(b))
            types.update(t)
            for i in range(8):
                v2 = bbox[i]
                if v2 is None:
                    continue
                if bbox_acc[i] is None:
                    bbox_acc[i] = v2
                elif i % 2 == 0:
                    bbox_acc[i] = min(bbox_acc[i], v2)
                else:
                    bbox_acc[i] = max(bbox_acc[i], v2)
    if not seen:
        return None
    return bbox_to_extra_stats(bbox_acc, types)


# -------------------------------------------------------- measurements

def wkb_npoints(wkb: bytes) -> int:
    """Total coordinate count across all parts."""
    n = 0

    def on_coords(pts, _z, _m):
        nonlocal n
        n += sum(0 if all(math.isnan(c) for c in p) else 1 for p in pts)

    _walk(_Reader(wkb), on_coords, set())
    return n


def wkb_length(wkb: bytes) -> float:
    """Summed 2D segment length of every linestring / ring (polygons
    contribute their ring perimeters — ST_Perimeter semantics there)."""
    total = 0.0

    def on_coords(pts, _z, _m):
        nonlocal total
        for a, b in zip(pts, pts[1:]):
            total += math.hypot(b[0] - a[0], b[1] - a[1])

    # points contribute nothing (no consecutive pairs)
    _walk(_Reader(wkb), on_coords, set())
    return total


def wkb_area(wkb: bytes) -> float:
    """2D shoelace area of polygon rings: outer ring positive magnitude,
    holes subtract (|first ring| - |other rings| per polygon, the common
    GIS convention when ring orientation is unnormalized)."""
    areas: list[float] = []

    def shoelace(pts) -> float:
        s = 0.0
        for a, b in zip(pts, pts[1:]):
            s += a[0] * b[1] - b[0] * a[1]
        return s / 2.0

    def walk(r: _Reader) -> None:
        base, has_z, has_m, endian = r.header()
        dim = 2 + has_z + has_m
        if base == 1:
            r.coords(endian, dim, 1)
        elif base == 2:
            r.coords(endian, dim, r.u32(endian))
        elif base == 3:
            total = 0.0
            for ring_i in range(r.u32(endian)):
                a = abs(shoelace(r.coords(endian, dim, r.u32(endian))))
                total += a if ring_i == 0 else -a
            areas.append(total)
        else:
            for _ in range(r.u32(endian)):
                walk(r)

    walk(_Reader(wkb))
    return sum(areas)


# ------------------------------------------------------------ Spark UDFs

def register_geo_functions(spark) -> None:
    """Register the ST_* scalar surface (pandas UDFs, Arrow-batched).

    DuckDB renders GEOMETRY columns as WKT implicitly; Spark has no
    display hook, so reads go through st_astext() explicitly (documented
    divergence — the stored bytes are identical WKB)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def st_point(x: pd.Series, y: pd.Series) -> pd.Series:
        head = struct.pack("<BI", 1, 1)
        return pd.Series(
            [None if (a is None or b is None
                      or (isinstance(a, float) and math.isnan(a))
                      or (isinstance(b, float) and math.isnan(b)))
             else head + struct.pack("<dd", float(a), float(b))
             for a, b in zip(x, y)])

    @pandas_udf("binary")
    def st_geomfromtext(wkt: pd.Series) -> pd.Series:
        return pd.Series([None if w is None else wkt_to_wkb(w)
                          for w in wkt])

    @pandas_udf("string")
    def st_astext(g: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else wkb_to_wkt(bytes(b))
                          for b in g])

    @pandas_udf("string")
    def st_geometrytype(g: pd.Series) -> pd.Series:
        out = []
        for b in g:
            if b is None:
                out.append(None)
                continue
            base, _, _, _ = _Reader(bytes(b)).header()
            out.append(_TYPE_NAMES[base].upper())
        return pd.Series(out)

    def _coord_udf(index: int, point_only: bool = True):
        @pandas_udf("double")
        def fn(g: pd.Series) -> pd.Series:
            out = []
            for b in g:
                if b is None:
                    out.append(None)
                    continue
                bbox, _ = wkb_bbox(bytes(b))
                out.append(bbox[index])
            return pd.Series(out)
        return fn

    @pandas_udf("long")
    def st_npoints(g: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else wkb_npoints(bytes(b))
                          for b in g])

    @pandas_udf("double")
    def st_length(g: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else wkb_length(bytes(b))
                          for b in g])

    @pandas_udf("double")
    def st_area(g: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else wkb_area(bytes(b))
                          for b in g])

    @pandas_udf("double")
    def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
        # 2D centroid-free point-point distance: bbox centers for
        # non-points (documented approximation; exact for POINTs)
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(None)
                continue
            bx, _ = wkb_bbox(bytes(x))
            by, _ = wkb_bbox(bytes(y))
            if None in bx[:4] or None in by[:4]:
                out.append(None)
                continue
            cx = ((bx[0] + bx[1]) / 2, (bx[2] + bx[3]) / 2)
            cy = ((by[0] + by[1]) / 2, (by[2] + by[3]) / 2)
            out.append(math.hypot(cx[0] - cy[0], cx[1] - cy[1]))
        return pd.Series(out)

    @pandas_udf("boolean")
    def st_intersects_bbox(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(None)
                continue
            bx, _ = wkb_bbox(bytes(x))
            by, _ = wkb_bbox(bytes(y))
            if None in bx[:4] or None in by[:4]:
                out.append(None)
                continue
            out.append(bx[0] <= by[1] and by[0] <= bx[1]
                       and bx[2] <= by[3] and by[2] <= bx[3])
        return pd.Series(out)

    spark.udf.register("st_npoints", st_npoints)
    spark.udf.register("st_length", st_length)
    spark.udf.register("st_area", st_area)
    spark.udf.register("st_distance", st_distance)
    spark.udf.register("st_intersects_bbox", st_intersects_bbox)
    # ST_X/ST_Y on points == xmin/ymin of the bbox; the *min/*max
    # variants work on any geometry.
    spark.udf.register("st_point", st_point)
    spark.udf.register("st_geomfromtext", st_geomfromtext)
    spark.udf.register("st_astext", st_astext)
    spark.udf.register("st_geometrytype", st_geometrytype)
    spark.udf.register("st_x", _coord_udf(0))
    spark.udf.register("st_y", _coord_udf(2))
    spark.udf.register("st_xmin", _coord_udf(0))
    spark.udf.register("st_xmax", _coord_udf(1))
    spark.udf.register("st_ymin", _coord_udf(2))
    spark.udf.register("st_ymax", _coord_udf(3))
