"""Structured Streaming ingest: the crawler-as-a-stream restatement.

The reference is a long-running incremental batch job (SURVEY.md §2.9);
its streaming-ish semantics (fixed-size chunks, resume, replay-safe
writes) map onto Structured Streaming directly:

  * file-source corpus directory  = arriving crawl batches (T1),
  * checkpointLocation            = resume watermark (T2),
  * dropDuplicates on path        = pending-set / INSERT IGNORE replay
                                    protection (T3),
  * foreachBatch merge            = idempotent upsert sink (S9-S11).

The hot path reuses the exact same Arrow-batched parse UDFs and edge
derivations as the batch pipeline — one code path, two execution modes.
Stateless transformations only (parse, explode, project) run in the
stream itself; stateful merge happens in foreachBatch against the
snapshot tables, which keeps the streaming state store empty and the
sink idempotent (replayed micro-batches re-merge to the same result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgpipe import link as L
from kgpipe import triples as T
from kgpipe.parse.udfs import parse_chengyu_udf, parse_ciyu_udf
from kgpipe.schemas import CORPUS_SCHEMA


def stream_corpus(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over an arriving corpus directory (parquet)."""
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def streaming_mention_edges(corpus_stream: DataFrame) -> DataFrame:
    """Stateless stream: parse term pages → tagged mention edges.

    Emits canonical undirected (src/dst, rel_type) rows per micro-batch;
    global dedup happens at the merge sink (idempotent insert_ignore), so
    no streaming state is held here.
    """
    chengyu = corpus_stream.where(F.col("path").startswith("chengyu/")).withColumn(
        "parsed", parse_chengyu_udf("content", "path")
    )
    cidian = corpus_stream.where(F.col("path").startswith("cidian/")).withColumn(
        "parsed", parse_ciyu_udf("content", "path")
    )

    def mentions(parsed: DataFrame, name_field: str, entity_type: str) -> DataFrame:
        base = parsed.select(
            F.col(f"parsed.data.{name_field}").alias("name"),
            F.coalesce(F.col("parsed.data.synonyms"), F.array()).alias("synonyms"),
            F.coalesce(F.col("parsed.data.antonyms"), F.array()).alias("antonyms"),
            "path",
        ).where(F.col("name").isNotNull())
        m = L.extract_mentions(base, "name", "synonyms", "antonyms")
        return T.undirected_by_name(m, entity_type)

    return mentions(chengyu, "chengyu", "Idiom").unionByName(
        mentions(cidian, "word", "Word")
    )


def streaming_windowed_metrics(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """A1/A2 restated for streams: per-(event-time window, event_type)
    counters with late-data tolerance.

    The reference emits one metrics row per completed batch
    (batch_crawl.py:342-366) — wall-clock-batch bucketing. The streaming
    restatement buckets by EVENT time: a watermark bounds how late a row
    may arrive and lets the state store finalize (and evict) windows —
    without it, windowed state grows forever. The aggregation itself is
    the same map-side-combining hash count as the batch path, so a
    replayed micro-batch converges to identical totals.
    """
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("processed"),
            F.count(F.when(F.col("value") > 50, 1)).alias("success"),
            F.count(F.when(F.col("value") <= 50, 1)).alias("fail"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "processed",
            "success",
            "fail",
        )
    )


def streaming_stateful_dedup(
    df: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): emit only the
    FIRST occurrence of each key across micro-batches — the streaming
    form of INSERT IGNORE, holding the seen-set in the state store
    instead of re-reading the sink table per batch.

    State is one flag per distinct key, partitioned by the groupBy hash —
    the same footprint Structured Streaming's own dropDuplicates keeps,
    but with an explicit deterministic within-batch winner (min
    ``order_col``), matching the batch dedup's first-writer-wins
    formalization (kgpipe.triples.dedup_edges). Arrow-batched
    (FlatMapGroupsInPandasWithState) — no row-at-a-time Python.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = df.schema

    def first_writer(key, pdfs, state: GroupState):
        if state.exists:
            return
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(order_col, kind="mergesort").iloc[:1]
            if best is None or cand.iloc[0][order_col] < best.iloc[0][order_col]:
                best = cand
        if best is not None:
            state.update((1,))
            yield best

    return df.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        first_writer,
        outputStructType=out_schema,
        stateStructType="seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_graph_stream(
    spark: SparkSession,
    source_dir: str,
    seeds: DataFrame,
    warehouse_root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
    full_hanzi_properties: bool = False,
    full_term_properties: bool = False,
) -> None:
    """Full-graph streaming ingest: every edge family, not just mentions.

    Each micro-batch IS the batch pipeline applied to the arriving pages
    (build_graph) followed by the same idempotent warehouse merges the
    bucket runner uses — streaming mode and incremental mode are the one
    code path driven by different arrival orders.

    composed-of semantics match the reference's INSERT-time behavior
    (chengyu_mysql.py:197-221: a term links only characters already in
    the DB): the dimension for a micro-batch is the dedicated hanzi_dim
    table — seeded once from the warehouse's crawled Hanzi nodes when it
    is empty but nodes exist (a warehouse populated by the batch runner,
    or by a stream run that predates hanzi_dim) — UNION the batch's own
    valid characters. A term page that arrives before its characters
    misses those edges exactly as the reference's crawler does;
    re-driving the term (retry / new run) picks them up.

    Drain → finalize contract: the per-batch merges record RAW edges;
    global variant-cluster canonicalization needs the COMPLETE edge set
    (pipeline.canonicalize_edges — clusters can span micro-batches), so a
    drained stream is finished exactly like the batch runner: call
    ``kgpipe.checkpoint.finalize(wh, spark)`` after ``awaitTermination``
    returns. A variant chain split across micro-batches canonicalizes
    identically to the batch pipeline (tested:
    test_full_graph_stream_matches_batch isolates a chain head in its own
    micro-batch).
    """
    import os

    from pyspark.sql import functions as _F

    from kgpipe import schemas
    from kgpipe.materialize import SnapshotTable, Warehouse
    from kgpipe.parse.udfs import make_parse_hanzi_udf
    from kgpipe.pipeline import build_graph
    from kgpipe.session import free_cached_since, persistent_rdd_ids

    wh = Warehouse(warehouse_root)
    # Incremental composed-of dimension: a dedicated append-only snapshot
    # table of crawled Hanzi names. Re-reading the full nodes table per
    # micro-batch (the previous design) makes ingest cost grow
    # O(batches × nodes-table) — a quadratic read at stream scale. The
    # dim table holds ONE narrow column and only ever grows by the
    # batch's new characters, so the per-batch read stays O(|alphabet|),
    # independent of how many term/stub nodes accumulate.
    hanzi_dim_table = SnapshotTable(
        os.path.join(warehouse_root, "hanzi_dim"), schemas.HANZI_DIM_SCHEMA
    )
    # one-time backfill: a warehouse that predates hanzi_dim (batch-runner
    # populated, or streamed before the dim table existed) has crawled
    # Hanzi nodes but an empty dim — without seeding, term pages arriving
    # after those characters would PERMANENTLY miss composed-of edges.
    # One O(nodes) read, only when the dim is empty; thereafter the
    # per-batch dim read stays O(|alphabet|).
    if hanzi_dim_table.read(spark).first() is None:
        crawled_hanzi = (
            wh.nodes.read(spark)
            .where((_F.col("entity_type") == "Hanzi") & _F.col("crawled"))
            .select("name")
            .distinct()
        )
        if crawled_hanzi.first() is not None:
            hanzi_dim_table.append(crawled_hanzi)
    parse_basic = make_parse_hanzi_udf(("basic_info",))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # per-batch cache hygiene: build_graph pins localCheckpoint/persist
        # blocks; release them after the merges or a long stream grows the
        # block store unboundedly (same fix as the bucket runner)
        keep_rdds = persistent_rdd_ids(spark.sparkContext)
        batch_df = batch_df.dropDuplicates(["path"])
        known = hanzi_dim_table.read(spark)
        batch_chars = (
            batch_df.where(_F.col("path").startswith("zidian/"))
            .select(parse_basic("content", "path").alias("p"))
            .where(
                _F.col("p.error").isNull()
                & _F.col("p.basic_info.data.character").isNotNull()
            )
            .select(_F.col("p.basic_info.data.character").alias("name"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        dim = known.unionByName(batch_chars).distinct()
        g = build_graph(
            spark, batch_df, seeds, run_id=f"stream-{batch_id}", hanzi_dim=dim,
            full_hanzi_properties=full_hanzi_properties,
            full_term_properties=full_term_properties,
        )
        wh.nodes.merge_best(
            g.nodes,
            keys=["node_id"],
            priority=[_F.col("crawled").desc(), _F.col("url").asc_nulls_last()],
        )
        wh.edges.insert_ignore(
            g.edges, keys=["src_id", "dst_id", "rel_type"], order_by=["src_name"]
        )
        if g.errors.count() > 0:
            wh.errors.append(g.errors)
        # append only the batch's genuinely-new characters (idempotent on
        # micro-batch replay) — the dim commit is O(batch), not O(table)
        new_chars = batch_chars.join(known, "name", "left_anti")
        hanzi_dim_table.append(new_chars)
        free_cached_since(spark.sparkContext, keep_rdds)

    (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_stream_to_warehouse(
    spark: SparkSession,
    source_dir: str,
    warehouse_root: str,
    checkpoint_dir: str,
) -> None:
    """availableNow streaming run: drain the source, merge each micro-batch
    idempotently into the edges snapshot table, stop."""
    from kgpipe.materialize import Warehouse

    wh = Warehouse(warehouse_root)
    edges_stream = streaming_mention_edges(stream_corpus(spark, source_dir))

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        deduped = (
            T.dedup_edges(batch_df)
            .drop("lineage")
            .withColumn("run_id", F.lit("stream"))
        )
        wh.edges.insert_ignore(
            deduped, keys=["src_id", "dst_id", "rel_type"], order_by=["src_name"]
        )

    (
        edges_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
