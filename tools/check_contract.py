"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and, where an oracle exists, the oracle SQL on DuckDB over
the same parquet tables; compare row count + order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, cols, full_precision: bool = True):
    """full_precision=True compares float bit-patterns (repr) — the
    strictest possible driver behavior."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v) if full_precision else f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from kgpipe.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="contract-check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_conn(sf_dir)

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    import time

    timings = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            timings[name] = round(time.time() - t0, 2)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(dcols)}")
            failures += 1
            continue
        sn, dn = normalize(srows, scols), normalize(drows, dcols)
        if len(sn) != len(dn):
            print(f"FAIL  {name}: row count {len(sn)} != {len(dn)}")
            failures += 1
        elif sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, e.g. {diff}")
            failures += 1
        else:
            print(f"ok    {name}: {len(sn)} rows match")
    spark.stop()
    if os.environ.get("CONTRACT_TIMINGS"):
        for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
            print(f"time  {name}: {sec}s")
        print(f"time  TOTAL-spark: {round(sum(timings.values()), 2)}s")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
