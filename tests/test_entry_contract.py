# -*- coding: utf-8 -*-
"""Driver-contract conformance: every queries() entry runs, matches its
DuckDB oracle at sf0.001 (the driver's own gate runs at sf0.01 — same
logic, bigger input), and entry() smoke-passes.
"""

import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@needs_testdata
def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subj", "pred", "obj"}


@needs_testdata
@pytest.mark.slow
def test_all_queries_run_and_match_oracles(spark, duck):
    import __spark_entry__ as mod

    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 40
    # round-2 contract: EVERY query is oracle-checkable, no rows-only rows
    assert set(oracles) == set(qs)
    mismatches = []
    for name, fn in qs.items():
        sdf = fn(spark, SF_DIR)
        rows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            continue  # rows-only entries: just proved they run
        cur = duck.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        if sorted(sdf.columns) != sorted(dcols):
            mismatches.append((name, "columns", sdf.columns, dcols))
            continue
        sn, dn = _normalize(rows, sdf.columns), _normalize(drows, dcols)
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:2]
            mismatches.append((name, f"{len(sn)} vs {len(dn)} rows", diff, None))
    assert not mismatches, mismatches


@needs_testdata
def test_rows_only_queries_nonempty(spark):
    import __spark_entry__ as mod

    qs = mod.queries()
    oracles = mod.oracle_sql()
    for name in set(qs) - set(oracles):
        assert qs[name](spark, SF_DIR).count() > 0, f"{name} returned 0 rows"
