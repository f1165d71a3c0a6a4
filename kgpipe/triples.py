"""Edge/triple derivation and deduplication (SURVEY.md §2.5, §2.11).

Predicate vocabulary (evidence in SURVEY.md §2.11):
  synonym / antonym    — undirected, Idiom↔Idiom / Word↔Word
  composed-of          — Word|Idiom → Hanzi (surface-form decomposition)
  radical-of           — Radical → Hanzi
  variant-of           — Hanzi ↔ Hanzi (异体字 alias edges; CC input)
  has-pinyin           — entity → Pinyin
  translation-of       — entity → Translation ("lang: text")

Undirected canonicalization: the reference stores undirected pairs as
(min_id, max_id) over AUTO_INCREMENT ids (chengyu_mysql.py:235-237) —
arrival-order-dependent. We canonicalize by *name* order instead
(deterministic under any parallelism); the edge set is identical because
an undirected edge is a set, only the stored orientation differs.

Dedup: the reference's ``UNIQUE KEY uniq_relation (min_id,max_id,
relation_type)`` + INSERT IGNORE (create_table_chengyu.py:50,
chengyu_mysql.py:239-241) is first-writer-wins in DB-arrival order. The
Spark formalization is a window over the edge hash ordered by a
deterministic lineage key — ``row_number() = 1`` — so replays and
different cluster sizes elect the same winner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgpipe.ids import node_id


def undirected_by_name(
    mentions: DataFrame, entity_type: str
) -> DataFrame:
    """(src_name, mention, rel_type, lineage) → canonical undirected edges.

    Self-loops dropped (chengyu_mysql.py:233-234 ``rid == main_id``).
    """
    a = F.least("src_name", "mention")
    b = F.greatest("src_name", "mention")
    return (
        mentions.where(F.col("src_name") != F.col("mention"))
        .select(
            node_id(F.lit(entity_type), a).alias("src_id"),
            node_id(F.lit(entity_type), b).alias("dst_id"),
            "rel_type",
            a.alias("src_name"),
            b.alias("dst_name"),
            F.lit(None).cast("string").alias("properties"),
            F.col("lineage"),
        )
    )


def directed(
    df: DataFrame,
    src_type: str,
    src_name: str,
    dst_type: str,
    dst_name: str,
    rel_type: str,
    lineage: str = "lineage",
    properties=None,
) -> DataFrame:
    return df.select(
        node_id(F.lit(src_type), F.col(src_name)).alias("src_id"),
        node_id(F.lit(dst_type), F.col(dst_name)).alias("dst_id"),
        F.lit(rel_type).alias("rel_type"),
        F.col(src_name).alias("src_name"),
        F.col(dst_name).alias("dst_name"),
        (properties if properties is not None else F.lit(None).cast("string")).alias(
            "properties"
        ),
        F.col(lineage).alias("lineage"),
    )


def dedup_edges(edges: DataFrame) -> DataFrame:
    """Window-over-hash dedup with deterministic first-writer-wins.

    Partitioning by the 64-bit edge hash (not the composite key) keeps the
    shuffle key narrow and uniformly distributed; the full key appears in
    the window ordering only through lineage because identical keys hash
    identically. Hash collisions across distinct keys are broken by the
    composite key in the partition spec below (belt and braces).
    """
    w = (
        Window.partitionBy(
            F.xxhash64("src_id", "dst_id", "rel_type"), "src_id", "dst_id", "rel_type"
        ).orderBy(F.col("lineage").asc_nulls_last())
    )
    return (
        edges.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def composed_of(terms: DataFrame, hanzi_dim: DataFrame, entity_type: str) -> DataFrame:
    """Word/Idiom → constituent Hanzi edges.

    Decomposition is a native expression (no UDF): transform over a char
    sequence. Only characters that exist as zidian corpus rows survive
    (FIXTURES.md §3.2) — enforced with a broadcast semi-join against the
    hanzi dimension, which also makes the head-skew keys (一/不)
    shuffle-free (see kgpipe.link docstring).
    """
    chars = terms.select(
        F.col("name").alias("src_name"),
        F.explode(
            F.expr("transform(sequence(1, char_length(name)), i -> substring(name, i, 1))")
        ).alias("char"),
        F.col("path").alias("lineage"),
    ).distinct()
    present = chars.join(
        F.broadcast(hanzi_dim.select(F.col("name").alias("char"))), "char", "left_semi"
    )
    return directed(present, entity_type, "src_name", "Hanzi", "char", "composed-of")
