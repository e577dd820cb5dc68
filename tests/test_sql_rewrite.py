"""sql() dotted-name rewriting: identifier positions only, and
register_views resilience to unmappable tables (ADVICE r1)."""

from __future__ import annotations

import pytest

from datafusion_ducklake_spark.catalog import DuckLakeSession
from tests.ducklake_fixtures import FixtureCatalog, build_users_fixture, \
    write_data_file

RW = {"main.users": "main__users", "sales.orders": "sales__orders"}


class TestRewriteUnit:
    def _rw(self, q):
        return DuckLakeSession._rewrite_outside_literals(q, RW)

    def test_plain_reference(self):
        assert self._rw("SELECT * FROM main.users") == \
            "SELECT * FROM main__users"

    def test_literal_untouched(self):
        q = "SELECT * FROM main.users WHERE note = 'see main.users'"
        assert self._rw(q) == \
            "SELECT * FROM main__users WHERE note = 'see main.users'"

    def test_escaped_quote_literal(self):
        q = "SELECT 'it''s main.users here', id FROM main.users"
        assert self._rw(q) == \
            "SELECT 'it''s main.users here', id FROM main__users"

    def test_backticked_identifier_untouched(self):
        q = "SELECT `main.users` FROM main.users"
        assert self._rw(q) == "SELECT `main.users` FROM main__users"

    def test_longer_dotted_name_not_clobbered(self):
        q = "SELECT * FROM other.main.users"
        assert self._rw(q) == q

    def test_multiple_tables(self):
        q = "SELECT * FROM main.users u JOIN sales.orders o ON u.id = o.uid"
        assert self._rw(q) == ("SELECT * FROM main__users u JOIN "
                               "sales__orders o ON u.id = o.uid")


def test_register_views_skips_unmappable_table(spark, tmp_path):
    """One table with a type Spark can't map must not poison sql() for
    the rest of the catalog."""
    fx = build_users_fixture(str(tmp_path))
    cat = fx["cat"]
    s = cat.snapshot()
    tid = cat.table(1, "main", "broken", s)
    cat.column(tid, 90, "x", "geometry_blob_v9", 0, s)  # unmappable type
    name, size = write_data_file(cat.table_dir("main", "broken"),
                                 [(1, "a", "b")])
    cat.data_file(tid, name, size, s, 1)

    dl = DuckLakeSession(spark, cat.db_path)
    with pytest.warns(UserWarning, match="broken"):
        dl.register_views()
    # the good table still answers
    assert dl.sql("SELECT COUNT(*) AS n FROM main.users").collect()[0]["n"] == 4
