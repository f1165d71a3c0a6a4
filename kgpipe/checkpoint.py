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


def pending_units(
    wh: Warehouse, spark: SparkSession, n_buckets: int, run_id: str | None = None
) -> list[int]:
    """Resume watermark (A3/S15): units not yet checkpointed done.

    Checkpoints are scoped to a run: only rows of THIS run_id count as
    done (a new run_id is a fresh sweep over the same warehouse — the
    idempotent merges make that safe), and a recorded n_buckets that
    differs from the requested one fails loudly — silently reusing
    bucket indices under a different modulus would skip rows forever.
    """
    rows = wh.checkpoints.read(spark).where(F.col("status") == "done")
    if run_id is not None:
        rows = rows.where(F.col("run_id") == run_id)
    done = set()
    for r in rows.collect():
        lineage = json.loads(r.lineage)
        if lineage.get("n_buckets") != n_buckets:
            raise ValueError(
                f"checkpoint {r.partition_key} was written with "
                f"n_buckets={lineage.get('n_buckets')}, resume requested "
                f"n_buckets={n_buckets}; re-bucketing an existing run is "
                f"not resumable — use a new run_id"
            )
        done.add(int(lineage["bucket"]))
    return [b for b in range(n_buckets) if b not in done]


def sweep_gaps(spark: SparkSession, present, lo: int, hi: int) -> int:
    """S7 range-driven gap accounting: how many keys in [lo, hi] have NO
    row in ``present`` (one integer column). The reference's codepoint
    loop tallies characters whose detail page never materialized
    (/root/reference/hanzi/hanyuguoxue.py:1146-1242); the Spark
    restatement is an anti-join of the expected universe against the
    observed keys — one shuffle on a dense uniform key."""
    universe = spark.range(lo, hi + 1).select(F.col("id").alias("_k"))
    observed = present.toDF("_k").distinct()
    return universe.join(observed, "_k", "left_anti").count()


#: composed-of dimension rows beyond which the runner switches the
#: dimension join from broadcast to the content-salted shuffle join.
#: The full CJK character universe (~90k) broadcasts comfortably; the
#: threshold exists for dimension tables that outgrow that budget.
SALTED_DIM_THRESHOLD = 2_000_000


def _metrics_row(
    wh: Warehouse,
    spark: SparkSession,
    run_id: str,
    batch_idx: int,
    processed: int,
    success: int,
    fail: int,
    missing: int,
    reason: str,
    elapsed: float,
) -> None:
    row = {
        "run_id": run_id,
        "batch_idx": batch_idx,
        "start": batch_idx,
        "end": batch_idx + 1,
        "processed": processed,
        "success": success,
        "fail": fail,
        "missing_detail_pages": missing,
        "termination_reason": reason,
        "elapsed_seconds": elapsed,
        "insert_rate_per_sec": round(success / elapsed, 3) if elapsed > 0 else 0.0,
        "error_rate": round(fail / processed, 4) if processed > 0 else 0.0,
        "timestamp": datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S"),
    }
    wh.run_metrics.append(spark.createDataFrame([row], wh.run_metrics.schema))


def run_incremental(
    spark: SparkSession,
    corpus: DataFrame,
    seeds: DataFrame,
    warehouse_root: str,
    run_id: str = "run-1",
    n_buckets: int = 4,
    fail_buckets: set[int] | None = None,
    sweep_range: tuple[int, int] | None = None,
    full_hanzi_properties: bool = False,
    full_term_properties: bool = False,
) -> Warehouse:
    """Process pending buckets one commit at a time; re-entrant.

    ``fail_buckets`` injects an interrupt after processing (before the
    checkpoint commit) — the stand-in for the reference's SIGINT path: a
    ``manual_exit`` metrics row is recorded (batch_crawl.py:329-340),
    then the run aborts; the replay-idempotence tests prove the
    interrupted unit re-runs to an identical result.

    ``sweep_range`` enables S7 gap accounting: after the last unit, the
    codepoint universe [lo, hi] is anti-joined against the observed
    zidian pages and the gap count recorded as a final metrics row
    (the reference's per-codepoint failure tally,
    hanyuguoxue.py:1146-1242).
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
    # the PARSED pages after the same validity gate build_graph applies
    # (error IS NULL and basic_info character present) — a path-codepoint
    # decode would admit characters the per-bucket pipeline rejects and
    # silently diverge from the single-shot result on malformed pages.
    # One global parse pass over the zidian family, pinned once and
    # reused by every bucket.
    from kgpipe.parse.udfs import make_parse_hanzi_udf

    parse_basic_udf = make_parse_hanzi_udf(("basic_info",))
    hanzi_dim = (
        corpus.where(F.col("path").startswith("zidian/"))
        .select(parse_basic_udf("content", "path").alias("parsed"))
        .where(
            F.col("parsed.error").isNull()
            & F.col("parsed.basic_info.data.character").isNotNull()
        )
        .select(F.col("parsed.basic_info.data.character").alias("name"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    composed_mode = (
        "salted" if hanzi_dim.count() > SALTED_DIM_THRESHOLD else "broadcast"
    )

    from kgpipe.session import free_cached_since, persistent_rdd_ids

    # per-bucket cache hygiene: each build_graph pins checkpoints +
    # persisted frames; release them after the unit commits, keeping the
    # shared hanzi dimension (and anything the caller pinned) alive
    keep_rdds = persistent_rdd_ids(spark.sparkContext)

    pending = pending_units(wh, spark, n_buckets, run_id=run_id)
    for bucket in pending:
        t0 = time.time()
        part_key = f"{run_id}-bucket-{bucket}"
        c_slice = corpus_b.where(F.col("_bucket") == bucket).drop("_bucket")
        s_slice = seeds_b.where(F.col("_bucket") == bucket).drop("_bucket")
        g = build_graph(
            spark, c_slice, s_slice, run_id=run_id, hanzi_dim=hanzi_dim,
            composed_mode=composed_mode,
            full_hanzi_properties=full_hanzi_properties,
            full_term_properties=full_term_properties,
        )

        rows_in = c_slice.count()
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

        elapsed = round(time.time() - t0, 3)

        if fail_buckets and bucket in fail_buckets:
            # SIGINT analogue (batch_crawl.py:329-340): record the
            # interruption, leave the unit un-checkpointed, abort
            _metrics_row(
                wh, spark, run_id, bucket, processed, success, fail, missing,
                "manual_exit", elapsed,
            )
            raise RuntimeError(f"injected failure before checkpoint of bucket {bucket}")

        # T7/T8 termination vocabulary (reference README.md:50-56),
        # mapped onto corpus-quality signals:
        #   blocked_ip      — every record in the unit failed (the batch
        #                     crawler's systematic-failure exit,
        #                     batch_crawl.py:288)
        #   network_outage  — seeds pending but no pages arrived at all
        #                     (batch_crawl.py:115)
        #   all_done        — last pending unit (batch_crawl.py:336)
        #   batch_completed — normal mid-run unit
        if fail > 0 and success == 0:
            reason = "blocked_ip"
        elif rows_in == 0 and processed > 0:
            reason = "network_outage"
        elif bucket == pending[-1]:
            reason = "all_done"
        else:
            reason = "batch_completed"

        _metrics_row(
            wh, spark, run_id, bucket, processed, success, fail, missing,
            reason, elapsed,
        )
        checkpoint_row = {
            "run_id": run_id,
            "partition_key": part_key,
            "status": "done",
            "rows_in": rows_in,
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
        free_cached_since(spark.sparkContext, keep_rdds)

    if sweep_range is not None:
        # S7: codepoints in the sweep range with no zidian page at all
        # are failures the per-bucket loop never sees. Runs regardless of
        # whether any bucket was pending — a --sweep invocation on an
        # already-checkpointed run must still record its gap accounting.
        t0 = time.time()
        lo, hi = sweep_range
        observed = corpus.where(F.col("path").startswith("zidian/")).select(
            F.regexp_extract("path", r"zi-(\d+)", 1).cast("long")
        )
        gaps = sweep_gaps(spark, observed, lo, hi)
        _metrics_row(
            wh, spark, run_id, n_buckets, hi - lo + 1, hi - lo + 1 - gaps, 0,
            gaps, "sweep_completed", round(time.time() - t0, 3),
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
