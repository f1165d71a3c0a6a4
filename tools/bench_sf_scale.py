"""Scale-factor linearity bench: the headline ops queries at sf0.1 and at
a 4x-replicated variant of the same tables, reporting per-query time
ratios. A ratio near 4 (or below, for top-k / fixed-group aggregations)
means the plan scales linearly in the input; a super-linear ratio exposes
O(n^2) or driver-side growth the small factor hides.

Both inputs are built ONCE under bench_out/ (gitignored) through the
same writer so the file layout is comparable: fact tables are unioned as
key-shifted generations (documents letter-permuted per generation so the
duplicate structure mirrors the original corpus instead of every doc
gaining near-dup siblings); dimension tables are copied.

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

#: flagship corpus: bench.py's BENCH_CORPUS at 1x and a 4x entity-scale
#: replication (generate_corpus's ``scale`` clones term entities with
#: suffixed surface forms, so pages/edges/triples all grow ~linearly)
KG_SCALES = {1: 1600, GENS: 1600 * GENS}

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


def build_scaled(spark, out_dir: str, n_gens: int) -> None:
    """Write an ``n_gens``-replicated variant of the base tables. The 1x
    variant is written through the SAME writer as the 4x one so both
    sides have comparable file layout — the driver testdata ships each
    table as ONE parquet file (one scan split at 128 MB
    maxPartitionBytes), so timing it against a multi-file 4x directory
    would measure parallelism of the layout, not input scale."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for table, keys in FACT_SHIFTS.items():
        df = spark.read.parquet(f"{BASE}/{table}.parquet")
        gens = []
        for g in range(n_gens):
            gen = df
            for k in keys:
                gen = gen.withColumn(k, (F.col(k) + F.lit(g * SHIFT)).cast(df.schema[k].dataType))
            if table == "documents" and g > 0:
                # distinct content per generation via a character
                # permutation: a mere suffix leaves generations as
                # NEAR-dups of each other, so every doc gains GENS-1 true
                # near-duplicate siblings and the LSH candidate-pair
                # output grows ~GENS² (measured ×7.1 at 4x) — that is the
                # detector being output-sensitive to a 4x-higher dup
                # rate, not engine super-linearity. Permuting letters
                # changes virtually every shingle, so cross-generation
                # docs are unrelated and the 4x corpus mirrors the
                # original's duplicate structure.
                perm = ["etaoinshr", "taoinshre", "aoinshret", "oinshreta"][g]
                gen = gen.withColumn("text", F.translate(F.col("text"), "etaoinshr", perm))
            gens.append(gen)
        out = gens[0]
        for gen in gens[1:]:
            out = out.unionByName(gen)
        # fixed file-size target so 1x and 4x differ only in file COUNT,
        # not per-file size (both well under maxPartitionBytes)
        out.repartition(max(n_gens * 4, 4)).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
    for table in COPY_TABLES:
        spark.read.parquet(f"{BASE}/{table}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )


def build_kg_corpus(spark, out_dir: str, scale: int, n_gens: int) -> None:
    """Write the flagship bench corpus at an entity ``scale`` — same
    writer/layout discipline as ``build_scaled``: file COUNT grows with
    the scale, per-file size stays comparable."""
    from kgpipe.corpus import corpus_to_dataframes, generate_corpus

    corpus = generate_corpus(n_hanzi=60, n_words=120, n_idioms=80, seed=42, scale=scale)
    cdf, sdf = corpus_to_dataframes(spark, corpus)
    cdf.repartition(16 * n_gens).write.mode("overwrite").parquet(f"{out_dir}/corpus")
    sdf.repartition(4).write.mode("overwrite").parquet(f"{out_dir}/seeds")


def run_kg(spark, kg_dir: str) -> float:
    """Time the full KG pipeline (parse → link → edges → CC →
    canonicalize → dedup) over a prebuilt corpus: one full-size warmup
    round, then best-of-2 — the same steady-state protocol bench.py
    uses, with per-round cache hygiene."""
    import gc

    from kgpipe.pipeline import build_graph
    from kgpipe.session import free_cached_since, persistent_rdd_ids

    sc = spark.sparkContext
    cdf = spark.read.parquet(f"{kg_dir}/corpus").repartition(
        max(sc.defaultParallelism, 32)
    ).persist()
    cdf.count()  # input materialized outside the timed window
    sdf = spark.read.parquet(f"{kg_dir}/seeds")
    keep = persistent_rdd_ids(sc)
    best = None
    for i in range(3):  # round 0 = warmup
        t0 = time.time()
        _force(build_graph(spark, cdf, sdf).triples)
        sec = round(time.time() - t0, 3)
        if i > 0:
            best = sec if best is None else min(best, sec)
        gc.collect()
        free_cached_since(sc, keep)
    cdf.unpersist()
    return best


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
    timings: dict[str, float] = {}
    for _ in range(2):  # best-of-2: one-off GC/cleaner events add ±30%
        for name in HEADLINE:
            t0 = time.time()
            _force(QUERIES[name](spark, sf_dir))
            sec = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, sec), sec)
        gc.collect()
    return timings


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from kgpipe.session import get_spark

    base_dir = os.path.join(REPO, "bench_out", "sf0.1x1")
    scaled_dir = os.path.join(REPO, "bench_out", f"sf0.1x{GENS}")
    kg_dirs = {
        g: os.path.join(REPO, "bench_out", f"kgcorpus-x{g}") for g in KG_SCALES
    }
    if not all(
        os.path.exists(os.path.join(d, "region.parquet"))
        for d in (base_dir, scaled_dir)
    ) or not all(os.path.exists(os.path.join(d, "seeds")) for d in kg_dirs.values()):
        # build in a throwaway session: the big shuffle/write would pollute
        # the measurement session's heap and page cache
        b = get_spark(app_name="sf-scale-build", master=f"local[{cores}]")
        b.sparkContext.setLogLevel("ERROR")
        build_scaled(b, base_dir, 1)
        build_scaled(b, scaled_dir, GENS)
        for g, d in kg_dirs.items():
            build_kg_corpus(b, d, KG_SCALES[g], g)
        b.stop()

    spark = get_spark(app_name="sf-scale-bench", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")

    t1 = run_suite(spark, base_dir)
    t4 = run_suite(spark, scaled_dir)
    t1["kg_pipeline"], t4["kg_pipeline"] = (
        run_kg(spark, kg_dirs[1]),
        run_kg(spark, kg_dirs[GENS]),
    )

    stamp = datetime.now(timezone.utc).isoformat()[:19]
    lines = [
        f"## Scale-factor linearity ({stamp}Z)",
        "",
        f"Headline ops queries at sf0.1 (rewritten through the same writer/"
        f"layout) vs a {GENS}x key-shifted replication of the "
        f"same tables (documents letter-permuted per generation so the duplicate "
        f"structure stays that of the original corpus), local[{cores}], warmup + "
        "best-of-2 timed passes per scale. Ratio ≈ 4 = linear in input; well below "
        "4 = fixed-size output/groups (top-k, constant group count) or per-process "
        "floors dominating; well above 4 would expose super-linear (O(n²)/"
        "driver-side) growth. Note: replicating documents as near-dup *siblings* "
        "instead (suffix-only perturbation) measured ×7.1 on dedup_minhash_lsh — "
        "that is the detector being output-sensitive to a 4x-higher duplicate "
        "rate (candidate pairs grow ~GENS²), not engine super-linearity. The "
        "kg_pipeline row scales the flagship's own bench corpus instead "
        f"(entity scale {KG_SCALES[1]} → {KG_SCALES[GENS]}: pages, edges and "
        "triples all grow ~4x).",
        "",
        "| query | sf0.1 s | 4x s | ratio |",
        "|---|---|---|---|",
    ]
    for name in HEADLINE + ["kg_pipeline"]:
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
