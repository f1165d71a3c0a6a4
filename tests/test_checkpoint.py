# -*- coding: utf-8 -*-
"""Checkpointed runner: resume, replay idempotence, metrics vocabulary
(SURVEY.md §2.9 T1-T8, test plan §5 item 4)."""

import pytest
from pyspark.sql import functions as F

from kgpipe.checkpoint import finalize, pending_units, run_incremental
from kgpipe.corpus import corpus_to_dataframes
from kgpipe.materialize import SnapshotTable, Warehouse
from kgpipe.pipeline import build_graph
from kgpipe.schemas import NODES_SCHEMA


@pytest.fixture()
def frames(spark, small_corpus):
    return corpus_to_dataframes(spark, small_corpus)


def _triples(wh, spark):
    _, t = finalize(wh, spark)
    return {(r.subj, r.pred, r.obj) for r in t.collect()}


def test_incremental_equals_single_shot(spark, small_corpus, frames, tmp_path):
    cdf, sdf = frames
    wh = run_incremental(spark, cdf, sdf, str(tmp_path / "wh"), n_buckets=3)
    single = build_graph(spark, cdf, sdf)
    t_incr = _triples(wh, spark)
    t_single = {(r.subj, r.pred, r.obj) for r in single.triples.collect()}
    assert t_incr == t_single
    # every bucket checkpointed done, metrics vocabulary intact
    assert pending_units(wh, spark, 3) == []
    m = wh.run_metrics.read(spark)
    assert m.count() == 3
    reasons = [r.termination_reason for r in m.orderBy("batch_idx").collect()]
    assert reasons == ["batch_completed", "batch_completed", "all_done"]
    row = m.first()
    assert row.processed == row.success + row.missing_detail_pages
    # resume watermark equivalent (A3): max(end) over metrics
    assert m.agg(F.max("end")).first()[0] == 3


def test_crash_resume_converges(spark, frames, tmp_path):
    cdf, sdf = frames
    root = str(tmp_path / "wh_crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_incremental(spark, cdf, sdf, root, n_buckets=3, fail_buckets={1})
    wh_partial = Warehouse(root)
    # bucket 0 committed, bucket 1 data written but NOT checkpointed
    assert sorted(pending_units(wh_partial, spark, 3)) == [1, 2]
    # resume: re-runs bucket 1 (replay over existing data) + bucket 2
    wh = run_incremental(spark, cdf, sdf, root, n_buckets=3)
    assert pending_units(wh, spark, 3) == []
    # converged state identical to a clean run
    clean = run_incremental(spark, cdf, sdf, str(tmp_path / "wh_clean"), n_buckets=3)
    assert _triples(wh, spark) == _triples(clean, spark)
    assert wh.nodes.read(spark).count() == clean.nodes.read(spark).count()
    assert wh.edges.read(spark).count() == clean.edges.read(spark).count()


def test_rerun_is_noop(spark, frames, tmp_path):
    cdf, sdf = frames
    root = str(tmp_path / "wh2")
    wh = run_incremental(spark, cdf, sdf, root, n_buckets=2)
    v_nodes = wh.nodes.current_version()
    wh2 = run_incremental(spark, cdf, sdf, root, n_buckets=2)
    assert wh2.nodes.current_version() == v_nodes  # nothing pending → no commits


def test_snapshot_isolation_and_truncate(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), NODES_SCHEMA)
    assert t.read(spark).count() == 0 and t.current_version() is None
    df = spark.createDataFrame(
        [(1, "Idiom", "a", None, None, True, "r", None)], NODES_SCHEMA
    )
    v1 = t.append(df)
    assert v1 == 1 and t.read(spark).count() == 1
    t.append(df.withColumn("node_id", F.lit(2)))
    assert t.read(spark).count() == 2
    # old snapshot still readable (reader isolation)
    assert spark.read.parquet(t._snapshot_dir(1)).count() == 1
    t.truncate(spark)
    assert t.read(spark).count() == 0


def test_merge_best_order_independent(spark, tmp_path):
    crawled = spark.createDataFrame(
        [(1, "Idiom", "a", "chengyu/a", "{}", True, "r", None)], NODES_SCHEMA
    )
    stub = spark.createDataFrame(
        [(1, "Idiom", "a", None, None, False, "r", None)], NODES_SCHEMA
    )
    prio = [F.col("crawled").desc(), F.col("url").asc_nulls_last()]
    t1 = SnapshotTable(str(tmp_path / "o1"), NODES_SCHEMA)
    t1.merge_best(crawled, ["node_id"], prio)
    t1.merge_best(stub, ["node_id"], prio)
    t2 = SnapshotTable(str(tmp_path / "o2"), NODES_SCHEMA)
    t2.merge_best(stub, ["node_id"], prio)
    t2.merge_best(crawled, ["node_id"], prio)
    r1, r2 = t1.read(spark).first(), t2.read(spark).first()
    assert r1.crawled and r2.crawled and r1.url == r2.url == "chengyu/a"
