"""DuckLake ↔ Spark type mapping, normalization, and promotion rules.

Reference parity: src/types.rs — ducklake_to_arrow_type (12-90),
arrow_to_ducklake_type (95-164), decimal parsing/validation (166-251),
list parsing (253-297), normalization (299-308), promotion (310-400),
types_compatible (402-423), build_arrow_schema (425+).

Documented semantic gaps vs the reference (Spark has no unsigned ints and
caps decimals at precision 38):
- uint8→short, uint16→int, uint32→long, uint64→decimal(20,0)
- decimal(p>38, s) → rejected (reference supports Decimal256 up to 76)
- time → long (µs of day); interval → rejected for scans
Conversely Spark-native struct/map could exceed the reference; we reject
them for parity (ref: types.rs:74-88).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

from .errors import UnsupportedType

# canonical name -> Spark type factory
_SIMPLE = {
    "boolean": T.BooleanType,
    "int8": T.ByteType,
    "int16": T.ShortType,
    "int32": T.IntegerType,
    "int64": T.LongType,
    "float32": T.FloatType,
    "float64": T.DoubleType,
    "date": T.DateType,
    "varchar": T.StringType,
    "blob": T.BinaryType,
}

_ALIASES = {
    "bool": "boolean",
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32", "integer": "int32", "signed": "int32",
    "bigint": "int64", "long": "int64",
    "float": "float32", "real": "float32",
    "double": "float64",
    "text": "varchar", "string": "varchar",
    "binary": "blob", "bytea": "blob",
    "numeric": "decimal",
}

_UNSIGNED = {
    # DuckLake type -> (Spark type, widened canonical name note)
    "uint8": T.ShortType, "utinyint": T.ShortType,
    "uint16": T.IntegerType, "usmallint": T.IntegerType,
    "uint32": T.LongType, "uinteger": T.LongType,
}

_GEOMETRY = {
    "point", "linestring", "polygon", "multipoint", "multilinestring",
    "multipolygon", "geometrycollection", "geometry",
}

_DECIMAL_RE = re.compile(r"^(?:decimal|numeric)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_LIST_RE = re.compile(r"^(?:list|array)\s*<(.+)>$")
_TRAILING_ARRAY_RE = re.compile(r"^(.+)\[\s*\]$")


def _reject_nested_geometry(child_canonical: str, full_type: str) -> None:
    """GEOMETRY only at top level (geo corpus: ducklake_geometry_nested
    .test — 'GEOMETRY type is only supported as a top-level type')."""
    if child_canonical in _GEOMETRY:
        raise UnsupportedType(
            f"GEOMETRY type is only supported as a top-level type: "
            f"{full_type}")


def _split_type_args(s: str) -> list[str]:
    """Split a nested type's argument list on TOP-LEVEL commas only
    (respects <...> and (...) nesting and double-quoted names)."""
    parts, depth, cur, quoted = [], 0, [], False
    for ch in s:
        if quoted:
            cur.append(ch)
            if ch == '"':
                quoted = False
        elif ch == '"':
            quoted = True
            cur.append(ch)
        elif ch in "<(":
            depth += 1
            cur.append(ch)
        elif ch in ">)":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


@dataclass(frozen=True)
class MappedType:
    spark_type: T.DataType
    canonical: str          # canonical DuckLake type string
    lossless: bool = True   # False where Spark widens (unsigned ints, time)


def ducklake_to_spark_type(type_str: str) -> MappedType:
    """Parse a DuckLake catalog type string into a Spark DataType
    (ref: types.rs:12-90 for the supported surface)."""
    s = type_str.strip().lower()

    # list<T> / array<T> / T[] — element may itself be nested (struct/
    # map/list): a deliberate EXTENSION over the reference, which rejects
    # all nesting (types.rs:74-90); Spark's parquet reader/writer handles
    # nested columns natively, so the engine supports them end-to-end.
    m = _LIST_RE.match(s) or _TRAILING_ARRAY_RE.match(s)
    if m:
        elem = ducklake_to_spark_type(m.group(1).strip())
        _reject_nested_geometry(elem.canonical, type_str)
        return MappedType(T.ArrayType(elem.spark_type, True),
                          f"list<{elem.canonical}>", elem.lossless)

    # struct<name:type,...> / struct(name type, ...) — both the flat
    # canonical form this writer stores and DuckDB's SQL rendering
    m = re.match(r"^struct\s*[<(](.*)[>)]$", s)
    if m:
        fields = []
        lossless = True
        for part in _split_type_args(m.group(1)):
            name, sep, t = part.partition(":")
            if not sep or "<" in name or "(" in name:
                name, _, t = part.strip().partition(" ")
            name = name.strip().strip('"')
            if not name or not t.strip():
                raise UnsupportedType(f"Malformed struct type: {type_str}")
            child = ducklake_to_spark_type(t.strip())
            _reject_nested_geometry(child.canonical, type_str)
            lossless = lossless and child.lossless
            fields.append((name, child))
        if not fields:
            raise UnsupportedType(f"Malformed struct type: {type_str}")
        return MappedType(
            T.StructType([T.StructField(n, c.spark_type, True)
                          for n, c in fields]),
            "struct<" + ",".join(f"{n}:{c.canonical}"
                                 for n, c in fields) + ">",
            lossless)

    # map<key,value> / map(key, value)
    m = re.match(r"^map\s*[<(](.*)[>)]$", s)
    if m:
        parts = _split_type_args(m.group(1))
        if len(parts) != 2:
            raise UnsupportedType(f"Malformed map type: {type_str}")
        k = ducklake_to_spark_type(parts[0].strip())
        v = ducklake_to_spark_type(parts[1].strip())
        _reject_nested_geometry(k.canonical, type_str)
        _reject_nested_geometry(v.canonical, type_str)
        return MappedType(
            T.MapType(k.spark_type, v.spark_type, True),
            f"map<{k.canonical},{v.canonical}>",
            k.lossless and v.lossless)

    if s.startswith("union"):
        raise UnsupportedType(
            f"Unsupported DuckLake type: {type_str} "
            f"(union rejected — reference parity, types.rs:74-90)")

    s = _ALIASES.get(s, s)

    if s in _SIMPLE:
        return MappedType(_SIMPLE[s](), s)

    if s in _UNSIGNED:
        canon = {"utinyint": "uint8", "usmallint": "uint16",
                 "uinteger": "uint32"}.get(s, s)
        return MappedType(_UNSIGNED[s](), canon, lossless=False)
    if s in ("uint64", "ubigint"):
        return MappedType(T.DecimalType(20, 0), "uint64", lossless=False)

    if s == "json":
        return MappedType(T.StringType(), "json")
    if s == "uuid":
        return MappedType(T.BinaryType(), "uuid", lossless=False)
    if s in _GEOMETRY:
        return MappedType(T.BinaryType(), s, lossless=False)
    if s == "timetz" or s == "time with time zone":
        return MappedType(T.StringType(), "timetz", lossless=False)
    if s == "time":
        # No TimeType column support pre-Spark-4.x readers; µs-of-day long.
        return MappedType(T.LongType(), "time", lossless=False)

    if s in ("timestamptz", "timestamp with time zone"):
        return MappedType(T.TimestampType(), "timestamptz")
    if s in ("timestamp", "datetime", "timestamp_s", "timestamp_ms",
             "timestamp_ns", "timestamp without time zone"):
        # All units normalize to Spark µs TimestampNTZ (ref maps to
        # Timestamp(unit, None), types.rs:48,53-55); _ns loses sub-µs.
        return MappedType(T.TimestampNTZType(), "timestamp",
                          lossless=s not in ("timestamp_ns",))

    if s == "interval":
        raise UnsupportedType(
            "interval columns are not supported in Spark parquet scans "
            "(reference maps to Arrow MonthDayNano; documented gap)")

    m = _DECIMAL_RE.match(s)
    if m or s == "decimal":
        if not m:
            p, sc = 18, 3  # DuckDB's default DECIMAL(18,3)
        else:
            p, sc = int(m.group(1)), int(m.group(2))
        if p < 1:
            raise UnsupportedType(f"Decimal precision must be >= 1: {type_str}")
        if sc > p:
            raise UnsupportedType(
                f"Decimal scale {sc} exceeds precision {p}: {type_str}")
        if p > 38:
            raise UnsupportedType(
                f"Decimal precision {p} exceeds Spark's maximum of 38 "
                f"(reference supports up to 76 via Decimal256; documented gap)")
        return MappedType(T.DecimalType(p, sc), f"decimal({p},{sc})")

    raise UnsupportedType(f"Unsupported DuckLake type: {type_str}")


def spark_to_ducklake_type(dt: T.DataType) -> str:
    """Map a Spark DataType to the canonical DuckLake type string for the
    write path (ref: arrow_to_ducklake_type, types.rs:95-164)."""
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.StringType):
        return "varchar"
    if isinstance(dt, T.BinaryType):
        return "blob"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_to_ducklake_type(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        # beyond-reference extension (the reference rejects nesting,
        # types.rs:95-164); canonical flat rendering, parsed back by
        # ducklake_to_spark_type
        inner = ",".join(
            f"{f.name}:{spark_to_ducklake_type(f.dataType)}"
            for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.MapType):
        return (f"map<{spark_to_ducklake_type(dt.keyType)},"
                f"{spark_to_ducklake_type(dt.valueType)}>")
    raise UnsupportedType(f"Spark type not writable to DuckLake: {dt}")


def normalize_ducklake_type(type_str: str) -> str:
    """Alias/case normalization via round-trip (ref: types.rs:299-308)."""
    return ducklake_to_spark_type(type_str).canonical


_INT_RANK = {"int8": 0, "int16": 1, "int32": 2, "int64": 3}
_UINT_RANK = {"uint8": 0, "uint16": 1, "uint32": 2, "uint64": 3}


def is_promotable(from_type: str, to_type: str) -> bool:
    """Safe-widening check for schema evolution (ref: types.rs:310-400)."""
    try:
        f = normalize_ducklake_type(from_type)
        t_ = normalize_ducklake_type(to_type)
    except UnsupportedType:
        return False
    if f == t_:
        return True
    if f in _INT_RANK and t_ in _INT_RANK:
        return _INT_RANK[f] < _INT_RANK[t_]
    if f in _UINT_RANK and t_ in _UINT_RANK:
        return _UINT_RANK[f] < _UINT_RANK[t_]
    if f == "float32" and t_ == "float64":
        return True
    if f in _INT_RANK and t_ == "float64":
        return True
    if f == "timestamp" and t_ == "timestamptz":
        return True
    fm, tm = _DECIMAL_RE.match(f), _DECIMAL_RE.match(t_)
    if fm and tm:
        fp, fs = int(fm.group(1)), int(fm.group(2))
        tp, ts = int(tm.group(1)), int(tm.group(2))
        return ts >= fs and (tp - ts) >= (fp - fs)
    return False


def is_geometry_type(type_str: str) -> bool:
    """True for the GEOMETRY family (stored as WKB blobs in parquet —
    geo corpus: tests/sqllogictests/sql/geo/)."""
    return type_str.strip().lower() in _GEOMETRY


def types_compatible(existing_type: str, new_type: str) -> bool:
    """Compatibility = same canonical type or promotable
    (ref: types.rs:402-423). A WKB blob frame appends into a GEOMETRY
    column (Spark has no geometry DataType, so every geometry value
    arrives as binary); the catalog keeps the geometry type."""
    _blobs = ("blob", "binary", "bytea")
    if is_geometry_type(existing_type) and \
            new_type.strip().lower() in _blobs:
        return True
    if is_geometry_type(new_type) and \
            existing_type.strip().lower() in _blobs:
        # a plain-WKB blob file registers into a GEOMETRY column
        # (add_files; geo corpus ducklake_geometry_add_files.test)
        return True
    try:
        if normalize_ducklake_type(existing_type) == normalize_ducklake_type(new_type):
            return True
    except UnsupportedType:
        return False
    return is_promotable(existing_type, new_type)


def build_spark_schema(columns) -> T.StructType:
    """StructType from DuckLake column metadata, stamping the DuckLake
    column_id as the parquet field id so Spark's field-id-aware reader
    (spark.sql.parquet.fieldId.read.enabled) matches renamed columns
    (ref: build_arrow_schema types.rs:425+, field-id stamping
    table_writer.rs:303-317)."""
    fields = []
    for col in columns:
        mapped = ducklake_to_spark_type(col.column_type)
        fields.append(T.StructField(
            col.column_name, mapped.spark_type, col.nulls_allowed,
            metadata={"parquet.field.id": col.column_id}))
    return T.StructType(fields)
