"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>,
   "kg_triples": N, "kg_triples_per_sec": R, "cores": C}

The KG flagship runs over a bench-scaled deterministic corpus (the
triple-throughput number the baseline protocol tracks); the remaining
headliners exercise the heaviest relational / dedup / similarity
operators at the given scale factor.

Each query is forced with a full-column hash-reduce (computes every
output column, transfers one row back) so Catalyst cannot silently prune
benchmarked work, and timing excludes session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

HEADLINE = [
    "tpch_q1_pricing",
    "tpch_q3_revenue",
    "dim_join_counts",
    "window_dedup_latest",
    "window_topn_per_group",
    "edge_canonicalize_pairs",
    "dedup_exact",
    "dedup_minhash_lsh",
    "simhash32",
    "text_quality_score",
    "doc_fingerprint",
    "ann_cosine_topk",
]

BENCH_CORPUS = dict(n_hanzi=60, n_words=120, n_idioms=80, seed=42, scale=40)


def _force(df) -> int:
    """Execute the full plan: hash every column of every row, reduce to one
    value. Returns the row count (piggybacked on the same job)."""
    out = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))).alias("h"),
    ).collect()[0]
    return out["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf_match = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else -1.0

    from kgpipe.corpus import corpus_to_dataframes, generate_corpus
    from kgpipe.pipeline import build_graph
    from kgpipe.queries import QUERIES
    from kgpipe.session import get_spark

    spark = get_spark(app_name="kgpipe-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # flagship: KG pipeline over the bench corpus. One warmup round first —
    # python-worker spawn + whole-stage-codegen compilation are per-process
    # one-time costs that a long-lived cluster amortizes away; the timed
    # round still executes the complete pipeline (parse → link → edges →
    # CC → canonicalize → dedup) from the cached input.
    corpus = generate_corpus(**BENCH_CORPUS)
    cdf, sdf = corpus_to_dataframes(spark, corpus)
    cdf = cdf.repartition(cpus).persist()
    cdf.count()  # materialize input outside the timed window
    warm = generate_corpus(n_hanzi=20, n_words=20, n_idioms=20, seed=7)
    wc, ws = corpus_to_dataframes(spark, warm)
    _force(build_graph(spark, wc, ws, cache=False).triples)

    t0 = time.time()
    g = build_graph(spark, cdf, sdf)
    n_triples = _force(g.triples)
    kg_sec = round(time.time() - t0, 3)
    timings["kg_pipeline"] = kg_sec

    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg_triples": n_triples,
        "kg_triples_per_sec": round(n_triples / kg_sec, 1) if kg_sec > 0 else None,
        "cores": cpus,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
