"""Driver-gate mirror: every registry query vs its DuckDB oracle at sf0.001.

This is the same compare the driver performs at sf0.01 (row count + schema +
sorted values); kept at the smallest SF so the whole suite stays fast.
"""

from __future__ import annotations

import pytest

from datafusion_ducklake_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE
from tools.check_correctness import compare


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMOKE).toPandas()
    if spec.oracle is None:
        assert sdf is not None
        return
    odf = duck.sql(spec.oracle).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_checker_rejects_raw_binary_output():
    """Driver-parity hardening (r4 verdict #2): a registry entry whose
    output carries raw bytes/bytearray cells must FAIL the local checker
    in strict mode (the driver's canonicalizer crashes sorting them),
    while the slt mode (strict_dtypes=False) still hex-compares BLOBs."""
    import pandas as pd
    binary = pd.DataFrame({"id": [1, 2], "payload": [b"\x00\x01", bytearray(b"\x02")]})
    problems = compare("synthetic_binary", binary, binary.copy())
    assert any("raw binary" in p for p in problems), problems
    assert not compare("slt_blob", binary, binary.copy(), strict_dtypes=False)


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
