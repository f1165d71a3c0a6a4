"""Mention detection & entity linking (SURVEY.md J1-J3, §2.2 P13-P15).

The reference resolves each seed name via a live search request and
validates the hit by whitespace-normalized <h1> equality
(/root/reference/chengyu/extract_chengyu.py:26-48). Here that becomes a
distributed equi-join of the seed universe against parsed page titles on
the normalized name; seeds with no surviving match are the
``missing_detail_pages`` population (batch_crawl.py:253-256).

Skew note (north_star): mention keys are head-skewed — 一/不 appear in a
large fraction of composed-of mentions. Two mitigations, used by callers:

  * ``dim_broadcast_join`` — when the dimension (entity→id) fits the
    broadcast threshold there is no shuffle at all, so key skew cannot
    concentrate on one reducer. This is the default path: even at full
    scale the hanzi dimension is ≤ ~90k rows and the term dimension is
    bounded by the seed universe.
  * ``salted_join`` — explicit salting for the case where the dimension
    outgrows broadcast: the fact side gets a uniform salt in [0, n), the
    dimension side is exploded ×n, and the join key becomes (key, salt),
    splitting each hot key across n reducers. AQE skew-join remains on
    as a backstop (session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_title(col: Column | str) -> Column:
    """P13: whitespace-stripped equality key (extract_chengyu.py:48)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, " ", "")


def link_seeds_to_pages(
    seeds: DataFrame, parsed: DataFrame, name_col: str
) -> tuple[DataFrame, DataFrame]:
    """J2: seed names ⋈ parsed page titles on the normalized form.

    Returns (linked, missing): ``linked`` carries every seed column plus
    the page's parse struct; ``missing`` is the seeds that found no valid
    detail page (the reference's missing_detail_pages path).

    Join strategy is left to Catalyst + AQE deliberately: when the seed
    universe is small it broadcasts (runtime-converted by AQE from actual
    sizes); when seeds scale with the corpus (the 10^12-file case — and
    the bench corpus, where ~1M seeds once cost two driver-serial
    broadcast builds per run), both sides shuffle on the uniform
    normalized-title key. Never force-broadcast a relation that grows
    with the input.
    """
    s = seeds.withColumn("_k", normalize_title("name"))
    p = parsed.withColumn("_k", normalize_title(F.col(name_col)))
    linked = s.join(p, "_k", "inner").drop("_k")
    missing = s.join(p.select("_k"), "_k", "left_anti").drop("_k")
    return linked, missing


def dim_broadcast_join(
    facts: DataFrame, dim: DataFrame, key: str, how: str = "inner"
) -> DataFrame:
    """J1/J3: facts ⋈ broadcast(dimension) on an equality key.

    The reference does 2-4 per-record SELECT round-trips for the same
    lookup (chengyu_mysql.py:197-221); one broadcast join replaces all of
    them per batch.
    """
    return facts.join(F.broadcast(dim), key, how)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    disambiguator: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle join: salt the fact side, explode the dim side ×n.

    Used when ``dim`` exceeds the broadcast threshold (the composed-of
    path wires this in when the hanzi dimension outgrows the broadcast
    budget — kgpipe.triples.composed_of(mode='salted')). The salt is a
    pure function of ROW CONTENT — xxhash64(key, disambiguator) — so it
    is deterministic under any physical partitioning (never
    spark_partition_id, which varies with input layout). A hot key (一/不
    in composed-of mentions) fans across n_salt reducers because its
    rows differ in the disambiguator column.
    """
    salt = (
        F.pmod(F.xxhash64(F.col(key), F.col(disambiguator)), F.lit(n_salt))
    ).cast("int")
    f = facts.withColumn("_salt", salt)
    d = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    return f.join(d, [key, "_salt"], how).drop("_salt")


def extract_mentions(
    linked: DataFrame,
    name_col: str,
    syn_col: str,
    ant_col: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """U1 + A5: tagged explode of synonym/antonym lists, normalized.

    Keeps rel_type per mention *before* the union (the reference tags
    each relation tuple — chengyu_mysql.py:127-129), then trims and drops
    empties (normalize_term — chengyu_mysql.py:207-210). Output columns:
    (src_name, mention, rel_type, lineage, *carry_cols).

    ``carry_cols`` rides source columns (e.g. entity_type) through the
    explode — a narrow projection, NOT a join-back; keeping this
    shuffle-free matters because every edge family fans out from it.
    """
    def one(col: str, rel: str) -> DataFrame:
        return (
            linked.select(
                F.col(name_col).alias("src_name"),
                F.explode_outer(F.col(col)).alias("mention"),
                F.col("path").alias("lineage"),
                *[F.col(c) for c in carry_cols],
            )
            .withColumn("mention", F.trim("mention"))
            .where(F.col("mention").isNotNull() & (F.length("mention") > 0))
            .withColumn("rel_type", F.lit(rel))
        )

    return one(syn_col, "synonym").unionByName(one(ant_col, "antonym"))
