"""Geometry codec + catalog extra_stats (ref: tests/sqllogictests/sql/geo/
ducklake_geometry*.test — WKB-in-parquet GEOMETRY columns with bbox
extra_stats on the column statistics)."""

from __future__ import annotations

import json
import math
import struct

import pytest

from datafusion_ducklake_spark.functions.geo import (
    GeoError, bbox_to_extra_stats, merge_extra_stats, wkb_bbox,
    wkb_to_wkt, wkt_to_wkb)


# ---------------------------------------------------------------- codec

ROUNDTRIP = [
    "POINT (1 2)",
    "POINT Z (1 2 3)",
    "POINT M (1 2 4)",
    "POINT ZM (1 2 3 4)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "LINESTRING Z (5 5 5, 10 10 10)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOINT ((1 2), (3 4))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    "LINESTRING EMPTY",
    "POLYGON EMPTY",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("wkt", ROUNDTRIP)
def test_wkt_wkb_roundtrip(wkt):
    assert wkb_to_wkt(wkt_to_wkb(wkt)) == wkt


def test_point_wkb_layout():
    # little-endian ISO WKB: 01 01000000 + two doubles
    b = wkt_to_wkb("POINT (1 2)")
    assert b == struct.pack("<BIdd", 1, 1, 1.0, 2.0)
    # Z variant uses code 1001
    bz = wkt_to_wkb("POINT Z (1 2 3)")
    assert struct.unpack_from("<BI", bz) == (1, 1001)


def test_big_endian_read():
    be = struct.pack(">BIdd", 0, 1, 7.0, 8.0)
    assert wkb_to_wkt(be) == "POINT (7 8)"
    bbox, types = wkb_bbox(be)
    assert bbox[:4] == [7.0, 7.0, 8.0, 8.0]
    assert types == {"point"}


def test_ewkb_flag_read():
    # EWKB Z flag (0x80000000) instead of ISO +1000
    b = struct.pack("<BIddd", 1, 0x80000001, 1.0, 2.0, 3.0)
    assert wkb_to_wkt(b) == "POINT Z (1 2 3)"


def test_bad_wkt_rejected():
    for bad in ["POINT 1 2", "CIRCLE (1 2)", "POINT (1)", "POINT (1 2"]:
        with pytest.raises(GeoError):
            wkt_to_wkb(bad)


def test_bbox_multi():
    bbox, types = wkb_bbox(wkt_to_wkb(
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING Z (5 5 5, 10 10 10))"))
    assert bbox == [1.0, 10.0, 2.0, 10.0, 5.0, 10.0, None, None]
    assert types == {"geometrycollection"}


def test_extra_stats_render_matches_reference_shape():
    # exact string the reference corpus asserts
    # (sql/geo/ducklake_geometry.test:32-35)
    bbox, types = wkb_bbox(wkt_to_wkb("POINT (1 2)"))
    s = bbox_to_extra_stats(bbox, types)
    assert s == ('{"bbox": {"xmin": 1.000000, "xmax": 1.000000, '
                 '"ymin": 2.000000, "ymax": 2.000000, "zmin": null, '
                 '"zmax": null, "mmin": null, "mmax": null}, '
                 '"types": ["point"]}')


def test_merge_extra_stats_union():
    a = bbox_to_extra_stats(wkb_bbox(wkt_to_wkb("POINT (1 2)"))[0], {"point"})
    b = bbox_to_extra_stats(
        wkb_bbox(wkt_to_wkb("LINESTRING Z (5 5 5, 10 10 10)"))[0],
        {"linestring_z"})
    merged = json.loads(merge_extra_stats([a, b]))
    assert merged["bbox"] == {"xmin": 1.0, "xmax": 10.0, "ymin": 2.0,
                              "ymax": 10.0, "zmin": 5.0, "zmax": 10.0,
                              "mmin": None, "mmax": None}
    assert merged["types"] == ["linestring_z", "point"]
    assert merge_extra_stats([None, ""]) is None


def test_point_empty():
    b = wkt_to_wkb("POINT EMPTY")
    assert wkb_to_wkt(b) == "POINT EMPTY"
    bbox, _ = wkb_bbox(b)
    assert bbox == [None] * 8


# ------------------------------------------------------------ engine e2e

@pytest.fixture()
def dl(spark, tmp_path):
    from datafusion_ducklake_spark.catalog import DuckLakeSession
    from datafusion_ducklake_spark.metadata.writer import CatalogWriter
    db = str(tmp_path / "catalog.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    return DuckLakeSession(spark, db)


def test_geometry_column_type_survives_append(dl):
    dl.sql("CREATE TABLE g1 (id INTEGER, g GEOMETRY)")
    dl.sql("INSERT INTO g1 SELECT 1 AS id, st_point(1, 2) AS g")
    dl.sql("INSERT INTO g1 SELECT 2 AS id, st_point(3, 4) AS g")
    cols = {c.column_name: c.column_type
            for c in dl.table_handle("main.g1").columns}
    assert cols["g"] == "geometry"
    rows = dl.sql("SELECT id, st_astext(g) AS wkt FROM g1 ORDER BY id"
                  ).collect()
    assert [(r.id, r.wkt) for r in rows] == [(1, "POINT (1 2)"),
                                             (2, "POINT (3 4)")]


def test_geometry_nested_rejected_in_ddl(dl):
    from datafusion_ducklake_spark.errors import UnsupportedType
    for t in ["GEOMETRY[]", "STRUCT<a:GEOMETRY>", "MAP<INT,GEOMETRY>"]:
        with pytest.raises(UnsupportedType,
                           match="top-level"):
            dl.sql(f"CREATE TABLE bad (g {t})")


def test_extra_stats_tracks_delete_survivors(dl, tmp_path):
    # MOR delete doesn't shrink the envelope (DuckLake: table stats are
    # an upper bound); the rewrite after compact() recomputes per-file
    dl.sql("CREATE TABLE g2 (id INTEGER, g GEOMETRY)")
    dl.sql("INSERT INTO g2 SELECT 1 AS id, st_point(0, 0) AS g")
    dl.sql("INSERT INTO g2 SELECT 2 AS id, st_point(100, 100) AS g")
    dl.sql("DELETE FROM g2 WHERE id = 2")
    import json as _json
    env = dl.sql("SELECT extra_stats FROM ducklake_table_column_stats() "
                 "WHERE extra_stats IS NOT NULL").collect()
    assert len(env) == 1
    assert _json.loads(env[0][0])["bbox"]["xmax"] == 100.0
    rows = dl.sql("SELECT st_astext(g) AS wkt FROM g2").collect()
    assert [r.wkt for r in rows] == ["POINT (0 0)"]


def test_non_geo_tables_keep_null_extra_stats(dl):
    dl.sql("CREATE TABLE plain (id INTEGER, s VARCHAR)")
    dl.sql("INSERT INTO plain VALUES (1, 'x'), (2, 'y')")
    rows = dl.sql("SELECT extra_stats FROM ducklake_file_column_stats()"
                  ).collect()
    assert rows and all(r[0] is None for r in rows)
    # min/max envelope still folds for scalar columns
    env = dl.sql("SELECT min_value, max_value "
                 "FROM ducklake_table_column_stats() "
                 "WHERE min_value = '1'").collect()
    assert env and env[0][1] == "2"


def test_wkb_interop_duckdb_reads_our_bytes(dl, tmp_path):
    # DuckDB (no spatial offline) still sees the raw WKB blob — byte-for-
    # byte the codec's little-endian ISO WKB
    import duckdb
    dl.sql("CREATE TABLE g3 (g GEOMETRY)")
    dl.sql("INSERT INTO g3 SELECT st_point(7, 8) AS g")
    files = dl.sql("SELECT data_file_path FROM ducklake_list_files()"
                   ).collect()
    table_dir = dl.table_handle("main.g3").table_path
    import os
    path = os.path.join(table_dir, files[0][0])
    raw = duckdb.sql(f"SELECT g FROM read_parquet('{path}')").fetchone()[0]
    assert bytes(raw) == wkt_to_wkb("POINT (7 8)")


# ------------------------------------------------------- measurements

def test_measurements_pure():
    from datafusion_ducklake_spark.functions.geo import (wkb_area,
                                                         wkb_length,
                                                         wkb_npoints)
    sq = wkt_to_wkb("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert wkb_area(sq) == 16.0
    assert wkb_length(sq) == 16.0          # perimeter
    assert wkb_npoints(sq) == 5
    hole = wkt_to_wkb("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
                      "(1 1, 2 1, 2 2, 1 2, 1 1))")
    assert wkb_area(hole) == 15.0          # outer minus hole
    ln = wkt_to_wkb("LINESTRING (0 0, 3 4)")
    assert wkb_length(ln) == 5.0
    assert wkb_area(ln) == 0.0
    assert wkb_npoints(wkt_to_wkb("POINT (1 2)")) == 1
    multi = wkt_to_wkb(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((10 10, 12 10, 12 12, 10 12, 10 10)))")
    assert wkb_area(multi) == 5.0


def test_measurement_udfs(dl):
    dl.sql("CREATE TABLE gm2 (g GEOMETRY)")
    dl.sql("INSERT INTO gm2 SELECT "
           "'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'::GEOMETRY AS g")
    dl.sql("INSERT INTO gm2 SELECT 'LINESTRING (0 0, 3 4)'::GEOMETRY AS g")
    rows = dl.sql(
        "SELECT st_area(g) AS a, st_length(g) AS l, st_npoints(g) AS n "
        "FROM gm2 ORDER BY a").collect()
    assert [(r.a, r.l, r.n) for r in rows] == [(0.0, 5.0, 2),
                                               (16.0, 16.0, 5)]
    d = dl.sql("SELECT st_distance(st_point(0, 0), st_point(3, 4)) AS d"
               ).collect()[0][0]
    assert d == 5.0
    hit = dl.sql(
        "SELECT st_intersects_bbox("
        "'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'::GEOMETRY, "
        "st_point(1, 1)) AS i, st_intersects_bbox("
        "'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'::GEOMETRY, "
        "st_point(9, 9)) AS o").collect()[0]
    assert (hit.i, hit.o) == (True, False)


def test_bbox_file_pruning(dl):
    # extra_stats bbox drives catalog-level spatial file pruning:
    # a query window intersecting one file's bbox skips the other file
    # before any parquet I/O
    dl.sql("CREATE TABLE gp (id INTEGER, g GEOMETRY)")
    dl.sql("INSERT INTO gp SELECT 1 AS id, st_point(0, 0) AS g")
    dl.sql("INSERT INTO gp SELECT 2 AS id, st_point(100, 100) AS g")
    handle = dl.table_handle("main.gp")
    assert len(handle.files) == 2
    near = handle.prune_files([("g", "bbox_intersects", (-5, -5, 5, 5))])
    assert len(near) == 1
    far = handle.prune_files([("g", "bbox_intersects", (90, 90, 110, 110))])
    assert len(far) == 1 and far[0].data_uri != near[0].data_uri
    both = handle.prune_files([("g", "bbox_intersects", (-5, -5, 200, 200))])
    assert len(both) == 2
    none = handle.prune_files([("g", "bbox_intersects", (500, 500, 600, 600))])
    assert none == []
    # combined with a scalar prune on another column
    combo = handle.prune_files([("g", "bbox_intersects", (-5, -5, 5, 5)),
                                ("id", "=", 1)])
    assert len(combo) == 1
    # prune + filter through the reader, values correct
    rows = (dl.table("main.gp",
                     prune_filters=[("g", "bbox_intersects",
                                     (-5, -5, 5, 5))])
            .selectExpr("id", "st_astext(g) AS wkt").collect())
    assert [(r.id, r.wkt) for r in rows] == [(1, "POINT (0 0)")]
