"""Path-resolution unit tests (port of src/path_resolver.rs:354+ cases)."""

from __future__ import annotations

import pytest

from datafusion_ducklake_spark.errors import InvalidPath
from datafusion_ducklake_spark.paths import (PathResolver, join_paths,
                                             resolve_path, to_spark_uri,
                                             validate_path_component)


def test_relative_chain():
    r = PathResolver("/lake")
    sp = r.schema_path("main", True)
    tp = r.table_path(sp, "users", True)
    fp = r.file_path(tp, "f.parquet", True)
    assert fp == "/lake/main/users/f.parquet"


def test_absolute_override_at_each_level():
    r = PathResolver("/lake")
    assert r.schema_path("/elsewhere", False) == "/elsewhere"
    assert r.table_path("/lake/main", "s3://bucket/t", False) == "s3://bucket/t"
    assert r.file_path("/lake/main/users", "/abs/f.parquet", False) == "/abs/f.parquet"


def test_s3_scheme_mapping():
    assert to_spark_uri("s3://b/k/f.parquet") == "s3a://b/k/f.parquet"
    assert to_spark_uri("/local/f.parquet") == "/local/f.parquet"


@pytest.mark.parametrize("bad", [
    "../etc/passwd", "a/../../b", "a\x00b", "%2e%2e/x", "%252e%252e/y",
    "..\\windows",
])
def test_traversal_rejected(bad):
    with pytest.raises(InvalidPath):
        validate_path_component(bad)


def test_join_rules():
    assert join_paths("/a/b", "c") == "/a/b/c"
    assert join_paths("/a/b/", "c") == "/a/b/c"
    assert join_paths("", "c") == "c"
    assert join_paths("/a", "") == "/a"
    assert join_paths("/a", "/abs") == "/abs"
    assert resolve_path("/a", "rel", True) == "/a/rel"
    assert resolve_path("/a", "/abs", False) == "/abs"


def test_dots_in_filenames_ok():
    validate_path_component("file.with.dots.parquet")
    validate_path_component("..hidden")  # not a traversal segment
