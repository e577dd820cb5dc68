"""The 40 vendored ClickBench query texts (the reference's
tests/sqllogictests/sql/clickbench/clickbench.test_slow — marked `mode
skip` upstream because it needs the real 14 GB hits.parquet), run over a
deterministic synthetic hits table THROUGH the DuckLake scan and
compared against DuckDB on identical data. See tools/clickbench_suite.py
for the two documented adaptations (deterministic tie-breaks applied to
both engines; Spark-only dialect shims)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.clickbench_suite import run  # noqa: E402


def test_clickbench_all_40(spark):
    r = run(200_000, spark=spark)
    assert r["failed"] == [], r["failed"]
    assert r["n_ok"] == 40
