"""Skew micro-bench: content-salted join vs plain shuffle join on a
head-skewed key (north_star: 一/不 dominate composed-of mentions).

Builds a deterministic fact table where ONE key owns 90% of the rows,
joins it against a dimension too large to broadcast, and measures:

  * the max rows any single reducer group receives (the straggler size)
    with and without the salt — the structural effect;
  * wall-clock for (a) plain shuffle join with AQE skew-join OFF (the
    naive plan), (b) salted_join with AQE OFF (our mitigation), (c)
    plain join with AQE skew-join ON (the backstop).

Writes/refreshes the "## Skew micro-bench" section of BENCH.md (kept in
the region tools/bench_scaling.py preserves).

Usage: python tools/skew_bench.py [cores]
"""

from __future__ import annotations

import os
import re
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_FACTS = 32_000_000
N_KEYS = 10_000
N_SALT = 16


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from pyspark.sql import functions as F

    from kgpipe.link import salted_join
    from kgpipe.session import get_spark

    spark = get_spark(app_name="skew-bench", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    # force shuffle joins: the dimension must not broadcast for this test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # facts: 90% of rows on one hot key, rest uniform over k1..kN — every
    # cold fact key exists in the dimension (dim ids 1..N map to k1..kN,
    # id 0 is the hot key), so no rows silently vanish from the inner join
    facts = (
        spark.range(N_FACTS)
        .select(
            F.when(F.col("id") % 10 != 0, F.lit("hot"))
            .otherwise(
                F.concat(
                    F.lit("k"),
                    ((F.col("id") / 10).cast("long") % N_KEYS + 1).cast("string"),
                )
            )
            .alias("key"),
            F.col("id").alias("disambig"),
        )
        .repartition(cores * 4)
        .persist()
    )
    facts.count()
    dim = (
        spark.range(N_KEYS + 1)
        .select(
            F.when(F.col("id") == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
            .alias("key"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .persist()
    )
    dim.count()

    # structural effect: straggler group size with and without the salt
    plain_max = (
        facts.groupBy("key").count().agg(F.max("count")).first()[0]
    )
    salted_max = (
        facts.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col("key"), F.col("disambig")), F.lit(N_SALT)).cast("int"),
        )
        .groupBy("key", "_salt")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )

    def timed(fn) -> float:
        t0 = time.time()
        fn()
        return round(time.time() - t0, 2)

    def run_plain():
        facts.join(dim, "key").agg(F.count(F.lit(1))).collect()

    def run_salted():
        salted_join(facts, dim, key="key", disambiguator="disambig", n_salt=N_SALT).agg(
            F.count(F.lit(1))
        ).collect()

    results = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run_plain()  # warm
    results["plain shuffle join, AQE skew OFF"] = timed(run_plain)
    results["salted_join (n_salt=16), AQE skew OFF"] = timed(run_salted)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["plain shuffle join, AQE skew ON (backstop)"] = timed(run_plain)

    stamp = datetime.now(timezone.utc).isoformat()[:19]
    lines = [
        f"## Skew micro-bench ({stamp}Z)",
        "",
        f"Setup: {N_FACTS:,} fact rows on local[{cores}], ONE key owns 90% of them, "
        f"{N_KEYS:,}-key dimension, broadcast disabled (the dimension-outgrows-broadcast "
        "scenario salted_join exists for). Salt = xxhash64(key, disambiguator) % "
        f"{N_SALT} — pure row content, deterministic at any partitioning.",
        "",
        "| variant | wall-clock |",
        "|---|---|",
    ]
    for name, sec in results.items():
        lines.append(f"| {name} | {sec}s |")
    lines += [
        "",
        f"Straggler split: hot-key reducer group {plain_max:,} rows unsalted → "
        f"{salted_max:,} rows per (key, salt) group salted "
        f"(×{round(plain_max / salted_max, 1)} fan-out).",
        "",
    ]

    bench_md = os.path.join(REPO, "BENCH.md")
    text = open(bench_md).read()
    section = "\n".join(lines)
    if "## Skew micro-bench" in text:
        text = re.sub(
            r"## Skew micro-bench.*?(?=\n## |\Z)", section, text, flags=re.DOTALL
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
    print({"straggler_unsalted": plain_max, "straggler_salted": salted_max, **results})
    spark.stop()


if __name__ == "__main__":
    main()
