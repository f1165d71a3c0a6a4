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
    assert t.read(spark, version=1).count() == 1
    t.truncate(spark)
    assert t.read(spark).count() == 0


def test_insert_ignore_commits_are_o_delta(spark, tmp_path):
    """The scale contract for the edges sink: bytes physically written per
    commit must track the DELTA size, not the table size (manifest reuse
    of existing files — an O(table) copy-on-write would grow linearly)."""
    from kgpipe.schemas import EDGES_SCHEMA

    t = SnapshotTable(
        str(tmp_path / "edges"), EDGES_SCHEMA,
        bucket_keys=["src_id", "dst_id", "rel_type"], n_buckets=8,
    )
    batch_rows = 500
    deltas = []
    for i in range(5):
        rows = [
            (i * batch_rows + j, j, "synonym", f"s{i}-{j}", f"d{j}", None, "r")
            for j in range(batch_rows)
        ]
        v = t.insert_ignore(
            spark.createDataFrame(rows, EDGES_SCHEMA),
            keys=["src_id", "dst_id", "rel_type"],
            order_by=["src_name"],
        )
        deltas.append(t.commit_delta_bytes(v))
    assert t.read(spark).count() == 5 * batch_rows
    # equal-size disjoint batches → commit write volume must stay flat
    # (2x headroom for parquet metadata variance), not grow ~5x
    assert max(deltas) <= 2 * min(deltas), deltas
    # replaying a batch adds (near-)zero data files
    v = t.insert_ignore(
        spark.createDataFrame(
            [(0 * batch_rows + j, j, "synonym", f"s0-{j}", f"d{j}", None, "r")
             for j in range(batch_rows)],
            EDGES_SCHEMA,
        ),
        keys=["src_id", "dst_id", "rel_type"],
        order_by=["src_name"],
    )
    assert t.read(spark).count() == 5 * batch_rows
    assert t.commit_delta_bytes(v) < min(deltas) / 2


def test_merge_best_rewrites_only_colliding_buckets(spark, tmp_path):
    """nodes-sink scale contract: a merge touching few keys must carry the
    untouched buckets over by reference, not rewrite the table."""
    from kgpipe.schemas import NODES_SCHEMA

    t = SnapshotTable(
        str(tmp_path / "nodes"), NODES_SCHEMA, bucket_keys=["node_id"], n_buckets=8
    )
    base = [(j, "Hanzi", f"n{j}", None, None, False, "r", None) for j in range(2000)]
    t.merge_best(
        spark.createDataFrame(base, NODES_SCHEMA),
        keys=["node_id"],
        priority=[F.col("crawled").desc(), F.col("url").asc_nulls_last()],
    )
    full_write = t.commit_delta_bytes(1)
    # upsert ONE key → at most 1/8 of the buckets rewritten
    v = t.merge_best(
        spark.createDataFrame(
            [(7, "Hanzi", "n7", "zidian/7", "{}", True, "r", None)], NODES_SCHEMA
        ),
        keys=["node_id"],
        priority=[F.col("crawled").desc(), F.col("url").asc_nulls_last()],
    )
    assert t.commit_delta_bytes(v) < full_write / 2
    assert t.read(spark).count() == 2000
    assert t.read(spark).where("node_id = 7").first().crawled is True


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
