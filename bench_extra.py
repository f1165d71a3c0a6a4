"""Extra benchmarks (guide §1.4): per-stage noop-sink isolation for the
expensive queries, separate from the frozen bench.py. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [stage ...]

Stages: minhash (default), quality, simhash, tpch, windows.
Each stage prints per-step wall seconds; numbers cited in
OPTIMIZATION_r08.md come from here.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, df, n=2):
    best = None
    for _ in range(n):
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        _noop(df)
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"  {label:45s} {best:8.3f}s")
    return best


def stage_minhash(spark, sf_dir):
    from kgpipe.ops import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print("minhash decomposition:")
    spark.sparkContext.setJobDescription("minhash: banded (signatures)")
    banded = textops.minhash_banded(docs)
    timed(spark, "banded (row-local signatures)", banded)
    spark.sparkContext.setJobDescription("minhash: full pairs")
    pairs = textops.dedup_minhash_lsh(docs)
    timed(spark, "full candidate pairs", pairs)
    n_pairs = pairs.count()
    bucket_stats = (
        banded.groupBy("band", "bh").count()
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("count").alias("max_bucket"),
            F.expr("percentile_approx(count, 0.999)").alias("p999"),
            F.sum(F.expr("count * (count - 1) / 2")).alias("total_pairs_pre_distinct"),
        )
        .collect()[0]
    )
    print(f"  pairs={n_pairs}  buckets={bucket_stats['n_buckets']}  "
          f"max_bucket={bucket_stats['max_bucket']}  p999={bucket_stats['p999']}  "
          f"pre_distinct_pairs={int(bucket_stats['total_pairs_pre_distinct'])}")
    spark.sparkContext.setJobDescription(None)


def stage_quality(spark, sf_dir):
    from kgpipe.ops import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print("quality/simhash/fingerprint:")
    timed(spark, "quality_score", textops.quality_score(docs))
    timed(spark, "simhash", textops.simhash(docs))
    timed(spark, "fingerprint", textops.fingerprint(docs))


def stage_tpch(spark, sf_dir):
    from kgpipe.queries import QUERIES

    print("tpch + windows:")
    for name in ("tpch_q1_pricing", "tpch_q3_revenue", "window_dedup_latest",
                 "window_topn_per_group", "edge_canonicalize_pairs", "dedup_exact"):
        timed(spark, name, QUERIES[name](spark, sf_dir))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    from kgpipe.session import get_spark

    spark = get_spark(app_name="kgpipe-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    stages = sys.argv[1:] or ["minhash"]
    t0 = time.time()
    dispatch = {"minhash": stage_minhash, "quality": stage_quality,
                "simhash": stage_quality, "tpch": stage_tpch,
                "windows": stage_tpch}
    for st in stages:
        dispatch[st](spark, sf_dir)
    print(f"total {time.time() - t0:.1f}s  load={os.getloadavg()[0]:.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
