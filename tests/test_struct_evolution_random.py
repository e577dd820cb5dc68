"""Randomized struct-evolution sequences checked against a pure-Python
model (seeded — deterministic across runs; the property-test companion
to tests/test_struct_evolution.py).

Each sequence interleaves field adds, drops, safe promotions and row
inserts on a single struct column. The model tracks, per row, the value
of every CURRENT field — where "current" honors DuckLake's field-id
semantics: a field added after a row was written reads NULL for it, and
a field dropped-then-readded NEVER resurrects old values (fresh id).
"""

import random

import pytest

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.metadata.writer import CatalogWriter

PROMOTABLE = {"int32": "int64", "int16": "int32", "float32": "float64"}
FRESH_TYPES = ["int32", "int16", "float32", "int64", "varchar"]


def _spark_lit(val, typ):
    if val is None:
        return None
    if typ.startswith("float"):
        return float(val)
    if typ == "varchar":
        return str(val)
    return int(val)


@pytest.fixture()
def dl(spark, tmp_path):
    db = str(tmp_path / "cat.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    return DuckLakeSession(spark, db)


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_random_evolution_sequence(dl, spark, seed):
    rng = random.Random(seed)
    # model: fields = ordered {name: (generation, type)}; rows = list of
    # {(name, generation): value}. generation bumps on re-add so old
    # values can never be read back (the fresh-field-id contract).
    fields: dict[str, tuple[int, str]] = {"a": (0, "int32"),
                                          "b": (0, "int32")}
    gen = {"a": 0, "b": 0}
    rows: list[dict] = []
    next_name = 0

    dl.sql("CREATE TABLE rt (col1 STRUCT<a:INT,b:INT>)")

    def type_str():
        parts = ",".join(f"{n}:{t}" for n, (_g, t) in fields.items())
        return f"struct<{parts}>"

    def do_insert():
        vals = {}
        items = []
        for n, (g, t) in fields.items():
            v = rng.randint(-50, 50)
            vals[(n, g)] = _spark_lit(v, t)
            lit = f"'{v}'" if t == "varchar" else str(v)
            cast = {"int32": "INT", "int16": "SMALLINT", "int64": "BIGINT",
                    "float32": "FLOAT", "float64": "DOUBLE",
                    "varchar": "STRING"}[t]
            items.append(f"'{n}', CAST({lit} AS {cast})")
        rows.append(vals)
        dl.sql(f"INSERT INTO rt SELECT named_struct({', '.join(items)})")

    def do_add():
        nonlocal next_name
        name = f"f{next_name}"
        next_name += 1
        t = rng.choice(FRESH_TYPES)
        g = gen.get(name, -1) + 1
        gen[name] = g
        fields[name] = (g, t)
        dl.sql(f"ALTER TABLE rt ALTER COLUMN col1 SET DATA TYPE "
               f"{type_str()}")

    def do_drop():
        candidates = [n for n in fields if len(fields) > 1]
        if not candidates:
            return
        victim = rng.choice(candidates)
        del fields[victim]
        dl.sql(f"ALTER TABLE rt ALTER COLUMN col1 SET DATA TYPE "
               f"{type_str()}")

    def do_readd():
        # drop one field and re-add the SAME name with a fresh generation
        candidates = [n for n in fields if len(fields) > 1]
        if not candidates:
            return
        victim = rng.choice(candidates)
        del fields[victim]
        dl.sql(f"ALTER TABLE rt ALTER COLUMN col1 SET DATA TYPE "
               f"{type_str()}")
        g = gen[victim] + 1
        gen[victim] = g
        t = rng.choice(FRESH_TYPES)
        fields[victim] = (g, t)
        dl.sql(f"ALTER TABLE rt ALTER COLUMN col1 SET DATA TYPE "
               f"{type_str()}")

    def do_promote():
        candidates = [n for n, (_g, t) in fields.items() if t in PROMOTABLE]
        if not candidates:
            return
        name = rng.choice(candidates)
        g, t = fields[name]
        wide = PROMOTABLE[t]
        fields[name] = (g, wide)
        # widen already-written model values to the new type
        for r in rows:
            if (name, g) in r and r[(name, g)] is not None:
                r[(name, g)] = _spark_lit(r[(name, g)], wide)
        dl.sql(f"ALTER TABLE rt ALTER COLUMN col1 SET DATA TYPE "
               f"{type_str()}")

    do_insert()
    ops = [do_insert, do_insert, do_add, do_drop, do_readd, do_promote]
    for _ in range(8):
        rng.choice(ops)()
    do_insert()

    # verify: engine rows == model rows, per current field
    names = list(fields)
    sel = ", ".join(f"col1.{n}" for n in names)
    got = [tuple(r) for r in dl.sql(f"SELECT {sel} FROM rt").collect()]
    want = [tuple(r.get((n, fields[n][0])) for n in names) for r in rows]

    def norm(vs):
        return sorted([tuple(float(v) if isinstance(v, (int, float))
                             and not isinstance(v, bool) else v
                             for v in row) for row in vs], key=str)

    assert norm(got) == norm(want), f"seed={seed} fields={fields}"
