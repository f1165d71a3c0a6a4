"""Scale-factor linearity bench: the headline ops queries at sf0.1 and at
a 4x-replicated variant of the same tables, reporting per-query time
ratios. A ratio near 4 (or below, for top-k / fixed-group aggregations)
means the plan scales linearly in the input; a super-linear ratio exposes
O(n^2) or driver-side growth the small factor hides.

The 4x input is built ONCE under bench_out/ (gitignored): fact tables are
unioned as 4 key-shifted generations (documents get a per-generation text
suffix so near-dup candidate structure stays realistic instead of
collapsing into exact-duplicate clusters); dimension tables are copied.

Usage: python tools/bench_sf_scale.py [cores]   (idle machine only)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
GENS = 4
SHIFT = 10_000_000

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

#: table -> columns to shift per generation (facts); absent = copy as-is
FACT_SHIFTS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_TABLES = ["nation", "region"]


def build_scaled(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for table, keys in FACT_SHIFTS.items():
        df = spark.read.parquet(f"{BASE}/{table}.parquet")
        gens = []
        for g in range(GENS):
            gen = df
            for k in keys:
                gen = gen.withColumn(k, (F.col(k) + F.lit(g * SHIFT)).cast(df.schema[k].dataType))
            if table == "documents" and g > 0:
                # distinct content per generation: exact-duplicate clusters
                # across generations would make LSH pair counts quadratic in
                # GENS instead of exercising a 4x-larger realistic corpus
                gen = gen.withColumn("text", F.concat(F.col("text"), F.lit(f" §gen{g}")))
            gens.append(gen)
        out = gens[0]
        for gen in gens[1:]:
            out = out.unionByName(gen)
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
    for table in COPY_TABLES:
        spark.read.parquet(f"{BASE}/{table}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )


def _force(df) -> int:
    from pyspark.sql import functions as F

    out = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))).alias("h"),
    ).collect()[0]
    return out["n"]


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    import gc

    from kgpipe.queries import QUERIES

    for name in HEADLINE:  # warmup: codegen, python workers, file index
        _force(QUERIES[name](spark, sf_dir))
    gc.collect()
    timings = {}
    for name in HEADLINE:
        t0 = time.time()
        _force(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    return timings


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from kgpipe.session import get_spark

    spark = get_spark(app_name="sf-scale-bench", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = os.path.join(REPO, "bench_out", f"sf0.1x{GENS}")
    if not os.path.exists(os.path.join(scaled_dir, "region.parquet")):
        build_scaled(spark, scaled_dir)

    t1 = run_suite(spark, BASE)
    t4 = run_suite(spark, scaled_dir)

    stamp = datetime.now(timezone.utc).isoformat()[:19]
    lines = [
        f"## Scale-factor linearity ({stamp}Z)",
        "",
        f"Headline ops queries at sf0.1 vs a {GENS}x key-shifted replication of the "
        f"same tables, local[{cores}], warmup + single timed pass per scale. "
        "Ratio ≈ 4 = linear in input; well below 4 = fixed-size output/groups "
        "(top-k, constant group count) or per-process floors dominating; "
        "well above 4 would expose super-linear (O(n²)/driver-side) growth.",
        "",
        "| query | sf0.1 s | 4x s | ratio |",
        "|---|---|---|---|",
    ]
    for name in HEADLINE:
        ratio = round(t4[name] / t1[name], 2) if t1[name] > 0 else float("nan")
        lines.append(f"| {name} | {t1[name]} | {t4[name]} | {ratio} |")
    tot1, tot4 = round(sum(t1.values()), 3), round(sum(t4.values()), 3)
    lines += ["", f"Suite total: {tot1}s → {tot4}s (×{round(tot4 / tot1, 2)})", ""]

    bench_md = os.path.join(REPO, "BENCH.md")
    text = open(bench_md).read()
    section = "\n".join(lines)
    if "## Scale-factor linearity" in text:
        text = re.sub(
            r"## Scale-factor linearity.*?(?=\n## |\Z)", section, text, flags=re.DOTALL
        )
    else:
        marker = "\n## Measured scaling results"
        idx = text.find(marker)
        text = (
            text[:idx].rstrip() + "\n\n" + section + text[idx:]
            if idx != -1
            else text.rstrip() + "\n\n" + section
        )
    with open(bench_md, "w") as fh:
        fh.write(text)
    print(json.dumps({"sf0.1": t1, "x4": t4, "total_ratio": round(tot4 / tot1, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
