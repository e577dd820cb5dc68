"""Property-based checks (hypothesis, no Spark) for the nested type
machinery behind struct evolution: canonical parse/render round-trips,
tree-path enumeration consistency, edit_nested_type algebra, and the
evolution validator's accept/reject laws."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_ducklake_spark.errors import UnsupportedType
from datafusion_ducklake_spark.types import (check_nested_evolution,
                                             edit_nested_type,
                                             nested_child_slots,
                                             nested_tree_paths,
                                             normalize_ducklake_type,
                                             types_compatible)

LEAVES = ["int32", "int64", "varchar", "float64", "date", "boolean",
          "decimal(10,2)"]
NAMES = ["a", "b", "c", "d", "e", "f"]


def type_tree(depth):
    if depth == 0:
        return st.sampled_from(LEAVES)
    sub = type_tree(depth - 1)
    struct = st.lists(
        st.tuples(st.sampled_from(NAMES), sub),
        min_size=1, max_size=4,
        unique_by=lambda t: t[0]).map(
        lambda fs: "struct<" + ",".join(f"{n}:{t}" for n, t in fs) + ">")
    lst = sub.map(lambda t: f"list<{t}>")
    mp = st.tuples(st.sampled_from(LEAVES), sub).map(
        lambda kv: f"map<{kv[0]},{kv[1]}>")
    return st.one_of(st.sampled_from(LEAVES), struct, lst, mp)


TYPES = type_tree(3)


@settings(max_examples=200, deadline=None)
@given(TYPES)
def test_normalize_is_idempotent(t):
    canon = normalize_ducklake_type(t)
    assert normalize_ducklake_type(canon) == canon


@settings(max_examples=200, deadline=None)
@given(TYPES)
def test_tree_paths_consistent_with_slots(t):
    canon = normalize_ducklake_type(t)
    paths = nested_tree_paths(canon)
    # every immediate slot appears as a depth-1 path with the same type
    slots = dict(nested_child_slots(canon))
    depth1 = {p[0]: ct for p, ct in paths if len(p) == 1}
    assert depth1 == slots
    # paths are unique and parents precede children
    seen = set()
    for p, _ct in paths:
        assert p not in seen
        seen.add(p)
        if len(p) > 1:
            assert p[:-1] in seen


@settings(max_examples=200, deadline=None)
@given(TYPES)
def test_evolution_reflexive_and_compatible(t):
    canon = normalize_ducklake_type(t)
    check_nested_evolution(canon, canon)     # must not raise
    assert types_compatible(canon, canon)


@settings(max_examples=200, deadline=None)
@given(TYPES, st.sampled_from(LEAVES))
def test_add_then_drop_roundtrips(t, leaf):
    canon = normalize_ducklake_type(t)
    if not canon.startswith("struct<"):
        return
    names = {n for n, _ in nested_child_slots(canon)}
    new = next(n for n in ("zz1", "zz2", "zz3") if n not in names)
    grown = edit_nested_type(canon, (new,), "add", leaf)
    check_nested_evolution(canon, grown)     # adding is legal evolution
    back = edit_nested_type(grown, (new,), "drop")
    assert back == canon                     # exact round-trip
    check_nested_evolution(grown, back)      # dropping is legal too


@settings(max_examples=100, deadline=None)
@given(TYPES, TYPES)
def test_shape_changes_rejected(t1, t2):
    c1, c2 = normalize_ducklake_type(t1), normalize_ducklake_type(t2)

    def kind(c):
        for k in ("struct<", "list<", "map<"):
            if c.startswith(k):
                return k
        return "leaf"

    if kind(c1) != kind(c2):
        try:
            check_nested_evolution(c1, c2)
            # only legal cross-kind case: both leaves is excluded here,
            # so any success for differing kinds is a bug... unless the
            # kinds match after normalization (can't happen) — assert
            raise AssertionError(f"shape change accepted: {c1} -> {c2}")
        except UnsupportedType:
            pass
