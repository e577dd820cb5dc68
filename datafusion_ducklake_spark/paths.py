"""Hierarchical path resolution with traversal hardening.

Reference parity: src/path_resolver.rs (URL parsing 115-206, resolve_path
230-264, join_paths 270-352, validation 12-83). DuckLake paths resolve
data_path → schema.path → table.path → file.path, each segment either
absolute or relative to its parent.

Spark-first note: Spark reads s3a:// / file:/ URIs natively, so resolution
only needs to produce a final URI string; no object-store client plumbing.
"""

from __future__ import annotations

from urllib.parse import unquote

from .errors import InvalidPath

_SCHEMES = ("s3://", "s3a://", "gs://", "abfss://", "file://", "hdfs://")


def validate_path_component(path: str) -> None:
    """Reject traversal, null bytes, and encoded variants thereof
    (ref: path_resolver.rs:12-83)."""
    if "\x00" in path:
        raise InvalidPath(f"Path contains null byte: {path!r}")
    decoded = path
    # collapse repeated percent-encoding (%252e -> %2e -> .)
    for _ in range(3):
        new = unquote(decoded)
        if new == decoded:
            break
        decoded = new
    if "\x00" in decoded:
        raise InvalidPath(f"Path contains encoded null byte: {path!r}")
    norm = decoded.replace("\\", "/")
    for segment in norm.split("/"):
        if segment == "..":
            raise InvalidPath(f"Path traversal detected: {path!r}")


def is_absolute(path: str) -> bool:
    return path.startswith("/") or any(path.startswith(s) for s in _SCHEMES)


def join_paths(parent: str, child: str) -> str:
    """Join a child path onto a parent, with validation
    (ref: path_resolver.rs:270-352)."""
    validate_path_component(child)
    if not child:
        return parent
    if is_absolute(child):
        return child
    if not parent:
        return child
    return parent.rstrip("/") + "/" + child


def resolve_path(parent: str, path: str, path_is_relative: bool) -> str:
    """Resolve one level of the hierarchy (ref: path_resolver.rs:230-264)."""
    if path_is_relative:
        return join_paths(parent, path)
    validate_path_component(path)
    return path


def to_spark_uri(path: str) -> str:
    """Map a resolved DuckLake path to a URI Spark's Hadoop FS layer accepts.
    s3:// becomes s3a:// (the Hadoop S3 connector scheme); bare paths are
    treated as local filesystem."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


class PathResolver:
    """Carries the catalog data_path root and resolves the chain
    data_path → schema → table → file (ref: PathResolver,
    path_resolver.rs + chaining at catalog.rs:180-183, schema.rs:135-136,
    table.rs:206-209)."""

    def __init__(self, data_path: str):
        self.data_path = data_path.rstrip("/") if data_path else ""

    def schema_path(self, schema_path: str, path_is_relative: bool) -> str:
        return resolve_path(self.data_path, schema_path, path_is_relative)

    def table_path(self, schema_resolved: str, table_path: str,
                   path_is_relative: bool) -> str:
        return resolve_path(schema_resolved, table_path, path_is_relative)

    def file_path(self, table_resolved: str, file_path: str,
                  path_is_relative: bool) -> str:
        return resolve_path(table_resolved, file_path, path_is_relative)
