"""Property-based geo codec checks (hypothesis): WKT<->WKB round-trips
are stable and bboxes match a direct recomputation for arbitrary
generated geometries."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_ducklake_spark.functions.geo import (wkb_bbox, wkb_to_wkt,
                                                     wkt_to_wkb)

# finite, representable coordinates that survive repr() round-trips
coord = st.one_of(
    st.integers(min_value=-10**9, max_value=10**9).map(float),
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False,
              allow_infinity=False, width=64))


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _pt(dim):
    return st.lists(coord, min_size=dim, max_size=dim)


def _wkt_point(dim, flag):
    return _pt(dim).map(
        lambda c: f"POINT{flag} ({' '.join(_fmt(v) for v in c)})")


def _wkt_linestring(dim, flag):
    return st.lists(_pt(dim), min_size=2, max_size=6).map(
        lambda pts: f"LINESTRING{flag} ("
                    + ", ".join(" ".join(_fmt(v) for v in p) for p in pts)
                    + ")")


def _wkt_polygon(dim, flag):
    def render(pts):
        ring = pts + [pts[0]]
        body = ", ".join(" ".join(_fmt(v) for v in p) for p in ring)
        return f"POLYGON{flag} (({body}))"
    return st.lists(_pt(dim), min_size=3, max_size=5).map(render)


def _dim_flag():
    return st.sampled_from([(2, ""), (3, " Z"), (3, " M"), (4, " ZM")])


geometry_wkt = _dim_flag().flatmap(
    lambda df: st.one_of(_wkt_point(*df), _wkt_linestring(*df),
                         _wkt_polygon(*df)))


@given(geometry_wkt)
@settings(max_examples=200, deadline=None)
def test_roundtrip_stable(wkt):
    wkb = wkt_to_wkb(wkt)
    rendered = wkb_to_wkt(wkb)
    # idempotence: render -> parse -> render is a fixed point
    assert wkb_to_wkt(wkt_to_wkb(rendered)) == rendered
    # and the bytes are stable across the round-trip
    assert wkt_to_wkb(rendered) == wkb


@given(geometry_wkt)
@settings(max_examples=200, deadline=None)
def test_bbox_bounds_every_coordinate(wkt):
    wkb = wkt_to_wkb(wkt)
    bbox, types = wkb_bbox(wkb)
    assert len(types) == 1
    # re-extract coordinates from the rendered WKT and check containment
    body = wkb_to_wkt(wkb)
    nums = []
    for tok in body.replace("(", " ").replace(")", " ") \
                   .replace(",", " ").split():
        try:
            nums.append(float(tok))
        except ValueError:
            pass
    head = body.split("(")[0]
    flag = (head.replace("POINT", "").replace("LINESTRING", "")
            .replace("POLYGON", "").strip())
    dim = 2 + ("Z" in flag) + ("M" in flag)
    xs = nums[0::dim]
    ys = nums[1::dim]
    assert bbox[0] == min(xs) and bbox[1] == max(xs)
    assert bbox[2] == min(ys) and bbox[3] == max(ys)
    for v in xs + ys:
        assert not math.isnan(v)
