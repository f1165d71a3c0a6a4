"""Checkpointed, resumable runner (SURVEY.md §2.9 T1-T8, §3.1).

The reference's incremental-batch machinery — 1000-item chunks
(batch_crawl.py:48,398-424), resume from max(end) of the metrics CSV
(:85-102), the pending.json two-phase intent log (:117-216), per-batch
metrics rows (:342-366) — maps onto:

  * partition unit   = (family, bucket) where bucket = pmod(xxhash64(
    normalized key), n_buckets); seeds and pages are co-bucketed on the
    same normalized-title key, so each unit is an independent
    self-contained linkage problem (the Spark analogue of a seed chunk);
  * resume           = anti-join of pending units against the
    checkpoints table (status='done') — replaces the CSV watermark;
  * pending.json     = unnecessary: each unit commits nodes/edges/
    metrics/checkpoint through atomic snapshot commits, and the merge
    operations are idempotent, so an interrupted unit simply re-runs
    (T3's replay-idempotence without row-level intent logging);
  * metrics          = one run_metrics row per unit in the reference's
    exact column vocabulary incl. termination_reason values
    (README.md:50-56).
"""

from __future__ import annotations

import json
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgpipe.link import normalize_title
from kgpipe.materialize import Warehouse
from kgpipe.pipeline import build_graph, canonicalize_edges, triples_view


def bucket_of(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def pending_units(wh: Warehouse, spark: SparkSession, n_buckets: int) -> list[int]:
    """Resume watermark (A3/S15): units not yet checkpointed done."""
    done = {
        int(r.partition_key.split("-")[-1])
        for r in wh.checkpoints.read(spark).where(F.col("status") == "done").collect()
    }
    return [b for b in range(n_buckets) if b not in done]


def run_incremental(
    spark: SparkSession,
    corpus: DataFrame,
    seeds: DataFrame,
    warehouse_root: str,
    run_id: str = "run-1",
    n_buckets: int = 4,
    fail_buckets: set[int] | None = None,
) -> Warehouse:
    """Process pending buckets one commit at a time; re-entrant.

    ``fail_buckets`` injects a crash after processing (before the
    checkpoint commit) — used by the replay-idempotence tests to prove
    an interrupted unit re-runs to an identical result.
    """
    wh = Warehouse(warehouse_root)

    # co-bucket pages and seeds on the normalized linkage key; zidian
    # pages (no seeds) bucket on path
    is_term_page = F.col("path").startswith("chengyu/") | F.col("path").startswith("cidian/")
    page_key = F.when(
        is_term_page, normalize_title(F.element_at(F.split(F.col("path"), "/"), 2))
    ).otherwise(F.col("path"))
    corpus_b = corpus.withColumn("_bucket", bucket_of(page_key, n_buckets))
    seeds_b = seeds.withColumn("_bucket", bucket_of(normalize_title(F.col("name")), n_buckets))

    # GLOBAL composed-of dimension: a word in one bucket must still link
    # characters whose zidian page lives in another bucket. Derived from
    # the path codepoint — no parse needed, one cheap distinct projection.
    # codepoint → character natively: 4-byte big-endian UTF-32 decode
    # (Spark's char() truncates to Latin-1, useless for CJK)
    hanzi_dim = (
        corpus.where(F.col("path").startswith("zidian/"))
        .select(
            F.expr(
                "decode(unhex(lpad(hex(int(regexp_extract(path, 'zi-(\\\\d+)', 1))), 8, '0')), 'UTF-32')"
            ).alias("name")
        )
        .where(F.length("name") > 0)
        .distinct()
    )

    pending = pending_units(wh, spark, n_buckets)
    for bucket in pending:
        t0 = time.time()
        part_key = f"{run_id}-bucket-{bucket}"
        c_slice = corpus_b.where(F.col("_bucket") == bucket).drop("_bucket")
        s_slice = seeds_b.where(F.col("_bucket") == bucket).drop("_bucket")
        g = build_graph(spark, c_slice, s_slice, run_id=run_id, hanzi_dim=hanzi_dim)

        nodes_n = g.nodes.count()
        edges_n = g.edges.count()
        processed = g.family_counts["idiom_seeds"] + g.family_counts["word_seeds"]
        missing = g.family_counts["idiom_missing"] + g.family_counts["word_missing"]
        fail = g.errors.count()
        success = processed - missing

        # data first, checkpoint last: a crash between the two only means
        # the unit re-runs, and every merge below is idempotent (T3).
        # nodes use order-independent priority (crawled beats stub no
        # matter which bucket commits first)
        wh.nodes.merge_best(
            g.nodes,
            keys=["node_id"],
            priority=[F.col("crawled").desc(), F.col("url").asc_nulls_last()],
        )
        wh.edges.insert_ignore(
            g.edges, keys=["src_id", "dst_id", "rel_type"], order_by=["src_name"]
        )
        if fail > 0:
            wh.errors.append(g.errors)

        if fail_buckets and bucket in fail_buckets:
            raise RuntimeError(f"injected failure before checkpoint of bucket {bucket}")

        elapsed = round(time.time() - t0, 3)
        metrics_row = {
            "run_id": run_id,
            "batch_idx": bucket,
            "start": bucket,
            "end": bucket + 1,
            "processed": processed,
            "success": success,
            "fail": fail,
            "missing_detail_pages": missing,
            # T8 vocabulary (README.md:50-56): all_done on the last unit
            "termination_reason": "all_done" if bucket == pending[-1] else "batch_completed",
            "elapsed_seconds": elapsed,
            "insert_rate_per_sec": round(success / elapsed, 3) if elapsed > 0 else 0.0,
            "error_rate": round(fail / processed, 4) if processed > 0 else 0.0,
            "timestamp": datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S"),
        }
        wh.run_metrics.append(
            spark.createDataFrame([metrics_row], wh.run_metrics.schema)
        )
        checkpoint_row = {
            "run_id": run_id,
            "partition_key": part_key,
            "status": "done",
            "rows_in": c_slice.count(),
            "nodes_out": nodes_n,
            "edges_out": edges_n,
            "lineage": json.dumps(
                {
                    "bucket": bucket,
                    "n_buckets": n_buckets,
                    "nodes_version": wh.nodes.current_version(),
                    "edges_version": wh.edges.current_version(),
                }
            ),
            "committed_at": datetime.now(timezone.utc),
        }
        wh.checkpoints.append(
            spark.createDataFrame([checkpoint_row], wh.checkpoints.schema)
        )

    return wh


def finalize(wh: Warehouse, spark: SparkSession):
    """Global post-merge view: canonical edges + name-level triples from
    the accumulated warehouse tables (canonicalization must see the whole
    variant graph, so it cannot run per bucket)."""
    nodes = wh.nodes.read(spark)
    edges = wh.edges.read(spark)
    edges_canonical = canonicalize_edges(edges, nodes)
    return edges_canonical, triples_view(edges_canonical)
