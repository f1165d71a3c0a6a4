"""Code-KG extraction throughput on the north-rule input shape.

Generates a JVM-side synthetic source-repo table (repo, path, commit,
lang, content) at the requested file count (no driver-side rows — valid
at any scale), persists it, then measures ``code_triples`` end-to-end
(strip passes + per-language regex extraction + explode + distinct)
with the same warmup + best-of-2 discipline as bench.py.

Usage: python tools/bench_code_kg.py [n_files] [cores]
Prints one JSON line: {"code_kg_files": N, "code_kg_triples": M,
"code_kg_sec": S, "code_kg_files_per_sec": R, "cores": C, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _force(df) -> int:
    out = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))).alias("h"),
    ).collect()[0]
    return out["n"]


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", 32)
    )

    from kgpipe.ops.codeops import code_triples, synthetic_source_table
    from kgpipe.session import get_spark

    load_start = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="kgpipe-bench-code", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")

    files = synthetic_source_table(spark, n_files).repartition(max(cores, 32)).persist()
    files.count()  # materialize the input outside the timed window

    _force(code_triples(files))  # warmup: codegen + JIT
    rounds = []
    n_triples = 0
    for _ in range(2):
        t0 = time.time()
        n_triples = _force(code_triples(files))
        rounds.append(round(time.time() - t0, 3))
    sec = min(rounds)
    print(
        json.dumps(
            {
                "code_kg_files": n_files,
                "code_kg_triples": n_triples,
                "code_kg_sec": sec,
                "code_kg_files_per_sec": round(n_files / sec, 1),
                "code_kg_triples_per_sec": round(n_triples / sec, 1),
                "cores": cores,
                "load_1m_start": load_start,
                "load_1m_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
