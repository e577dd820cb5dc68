"""Auto-discovering hybrid sqllogictest run (ref:
tests/sqllogictest_runner.rs:141-200 — discover, run, report)."""

from __future__ import annotations

from pathlib import Path

import pytest

from tests.slt_runner import HybridRunner

SLT_DIR = Path(__file__).parent / "slt"
FILES = sorted(p.name for p in SLT_DIR.glob("*.test"))


@pytest.mark.parametrize("fname", FILES)
def test_slt_file(spark, tmp_path, fname):
    runner = HybridRunner(spark, str(tmp_path))
    try:
        n = runner.run_file(str(SLT_DIR / fname))
        assert n > 0
    finally:
        runner.close()
