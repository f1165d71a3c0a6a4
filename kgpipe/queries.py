"""Driver-contract query registry: one entry per operator family from
SURVEY.md §2 plus the training-data ops (dedup / similarity / text /
multimodal), each mapped onto the standard testdata tables with an exact
DuckDB oracle where the semantics are SQL-expressible.

Engine-parity rules used throughout (verified against DuckDB 1.0):
  * hashes: md5 / sha2-256 (identical hex in both engines),
  * hex→int: Spark conv(x,16,10)::long ≡ DuckDB CAST('0x'||x AS BIGINT),
  * money aggregation: per-row cast to DECIMAL, exact sum, final cast to
    DOUBLE (immune to double partial-sum reordering),
  * ratios: both engines divide the same doubles and round half-away —
    identical results,
  * array folds (aggregate/list_sum) are sequential left-to-right in both
    engines → deterministic doubles,
  * every aggregate/computed column aliased identically in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgpipe.ops import textops, vectorops

QUERIES: dict = {}
ORACLES: dict[str, str] = {}
#: oracle SQL built on demand (golden VALUES tables computed by the
#: independent pure-Python oracle — cheap, but not free at import time)
LAZY_ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def register(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return register


def _lazy_oracle(name: str):
    def register(fn):
        LAZY_ORACLES[name] = fn
        return fn

    return register


def all_oracles() -> dict[str, str]:
    """Static + lazily-built oracle SQL, one entry per oracle-checkable
    query (the driver contract's ``oracle_sql()``)."""
    out = dict(ORACLES)
    for name, fn in LAZY_ORACLES.items():
        out[name] = fn()
    return out


def _sq(s: str) -> str:
    """SQL single-quoted string literal."""
    return "'" + s.replace("'", "''") + "'"


def _values_table(rows, columns: list[str]) -> str:
    """``SELECT * FROM (VALUES ...) t(cols)`` over pre-rendered SQL rows."""
    vals = ", ".join("(" + ", ".join(r) + ")" for r in rows)
    return f"SELECT * FROM (VALUES {vals}) AS t({', '.join(columns)})"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ===========================================================================
# scans / filters / projections / limits  (SURVEY §2.1, §2.6)
# ===========================================================================

# REGISTRY FOLDS (round 6): the driver's correctness artifact samples at
# most 50 entries, so trivially-related entries are folded into composed
# queries — each folded entry names the r05 entries (and SURVEY §2
# components) it carries, and every underlying operator keeps its own
# pytest coverage. Registry total: 49.


@_q(
    "scan_point_lookup",
    "SELECT doc_id, n_chars, upper(source) AS attr, 'scan' AS side "
    "FROM documents WHERE lang = 'en' "
    "UNION ALL SELECT doc_id, n_chars, lang AS attr, 'point' AS side "
    "FROM documents WHERE doc_id = 42",
)
def scan_point_lookup(spark, sf):
    # folds r05 entries scan_filter_project + point_lookup (J6,
    # check_word.py:17): each union branch keeps its own filter pushdown
    # (plan-asserted in test_plans_and_streaming)
    d = _t(spark, sf, "documents")
    scan = d.where(F.col("lang") == "en").select(
        "doc_id", "n_chars", F.upper("source").alias("attr"),
        F.lit("scan").alias("side"),
    )
    point = d.where(F.col("doc_id") == 42).select(
        "doc_id", "n_chars", F.col("lang").alias("attr"),
        F.lit("point").alias("side"),
    )
    return scan.unionByName(point)


@_q(
    "limit_scans",
    "SELECT * FROM (SELECT c_custkey AS key, c_name AS name, "
    "CAST(NULL AS DOUBLE) AS total, 'seed' AS side FROM customer "
    "WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey LIMIT 50) "
    "UNION ALL SELECT * FROM (SELECT o_orderkey AS key, "
    "CAST(NULL AS VARCHAR) AS name, round(o_totalprice, 2) AS total, "
    "'top' AS side FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)",
)
def limit_scans(spark, sf):
    # folds r05 entries seed_scan_limit (S1/S2 + O2,
    # chengyu_neo4j.py:31-32) + order_limit_desc (O1, db_inspect.py:43):
    # both branches stay TakeOrderedAndProject — no full sort
    seed = (
        _t(spark, sf, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .orderBy("c_custkey")
        .limit(50)
        .select(
            F.col("c_custkey").alias("key"), F.col("c_name").alias("name"),
            F.lit(None).cast("double").alias("total"), F.lit("seed").alias("side"),
        )
    )
    top = (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("key"),
            F.lit(None).cast("string").alias("name"),
            F.round("o_totalprice", 2).alias("total"), F.lit("top").alias("side"),
        )
    )
    return seed.unionByName(top)


# ===========================================================================
# joins  (SURVEY §2.3)
# ===========================================================================

@_q(
    "dim_join_counts",
    "SELECT r_name, count(*) AS cnt FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name",
)
def dim_join_counts(spark, sf):
    # J1: broadcast dimension join chain (both dims tiny → broadcast)
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@_q(
    "left_join_missing",
    "SELECT c_mktsegment, count(*) AS missing FROM customer "
    "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
    "  WHERE o_orderdate >= TIMESTAMP '2001-01-01') GROUP BY c_mktsegment",
)
def left_join_missing(spark, sf):
    # J2 linkage-miss population = missing_detail_pages (batch_crawl.py:253-256)
    c = _t(spark, sf, "customer")
    o = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderdate") >= "2001-01-01")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        c.join(o, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("missing"))
    )


@_q(
    "membership_joins",
    "SELECT c_custkey AS key, 'anti' AS side FROM customer WHERE c_custkey NOT IN "
    "(SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01') "
    "UNION ALL SELECT p_partkey AS key, 'semi' AS side FROM part "
    "WHERE p_partkey IN (SELECT l_partkey FROM lineitem)",
)
def membership_joins(spark, sf):
    # folds r05 entries anti_join_pending (J5/U2, batch_crawl.py:311-315)
    # + semi_join_members (U2): one left_anti and one left_semi branch,
    # side-tagged
    c = _t(spark, sf, "customer")
    o = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderdate") >= "2001-01-01")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    anti = c.join(o, "c_custkey", "left_anti").select(
        F.col("c_custkey").alias("key"), F.lit("anti").alias("side")
    )
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    semi = p.join(li, "p_partkey", "left_semi").select(
        F.col("p_partkey").alias("key"), F.lit("semi").alias("side")
    )
    return anti.unionByName(semi)


@_q(
    "relation_display_join",
    "SELECT l.l_orderkey, l.l_linenumber, p.p_name, s.s_name FROM "
    "(SELECT * FROM lineitem ORDER BY l_orderkey DESC, l_linenumber LIMIT 10) l "
    "LEFT JOIN part p ON l.l_partkey = p.p_partkey "
    "LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey",
)
def relation_display_join(spark, sf):
    # J4: the reference's only literal SQL join (db_inspect.py:91)
    li = (
        _t(spark, sf, "lineitem")
        .orderBy(F.col("l_orderkey").desc(), F.col("l_linenumber"))
        .limit(10)
    )
    p = _t(spark, sf, "part")
    s = _t(spark, sf, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left")
        .select("l_orderkey", "l_linenumber", "p_name", "s_name")
    )


# ===========================================================================
# aggregations  (SURVEY §2.4)
# ===========================================================================

@_q(
    "batch_metrics_agg",
    "SELECT event_type, count(*) AS processed, "
    "count(*) FILTER (WHERE value > 50) AS success, "
    "count(*) FILTER (WHERE value <= 50) AS fail, "
    "round((count(*) FILTER (WHERE value <= 50)) * 1.0 / count(*), 4) AS error_rate, "
    "(SELECT max(event_id) FROM events) AS watermark "
    "FROM events GROUP BY event_type",
)
def batch_metrics_agg(spark, sf):
    # A1/A2: the reference's per-batch counters + derived rates
    # (batch_crawl.py:342-357), rounding preserved; the watermark column
    # folds r05 entry resume_watermark (A3/S15, batch_crawl.py:85-102)
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("processed"),
        F.count(F.when(F.col("value") > 50, 1)).alias("success"),
        F.count(F.when(F.col("value") <= 50, 1)).alias("fail"),
        F.round(
            F.count(F.when(F.col("value") <= 50, 1)) * 1.0 / F.count(F.lit(1)), 4
        ).alias("error_rate"),
    ).crossJoin(F.broadcast(e.agg(F.max("event_id").alias("watermark"))))


@_q(
    "distinct_normalize_terms",
    "SELECT token, count(*) AS cnt FROM ("
    "  SELECT trim(unnest(string_split(p_type, ' '))) AS token FROM part"
    ") WHERE token <> '' GROUP BY token",
)
def distinct_normalize_terms(spark, sf):
    # A5: explode → trim → drop empties → counted (chengyu_mysql.py:122,213)
    p = _t(spark, sf, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("token"))
        .select(F.trim("token").alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@_q(
    "json_props_sum",
    # outer cast: DuckDB sum(BIGINT) yields HUGEINT while Spark yields LONG —
    # values identical, hash representation not (CORRECTNESS_r01 mismatch)
    "SELECT event_type, CAST(sum(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS k_sum "
    "FROM events GROUP BY event_type",
)
def json_props_sum(spark, sf):
    # JSON side-channel parsing (the reference stores JSON blobs; §2.8)
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_sum")
    )


# ===========================================================================
# windows / dedup  (SURVEY §2.5)
# ===========================================================================

@_q(
    "window_dedup_latest",
    "SELECT user_id, event_id AS latest_event FROM ("
    "  SELECT user_id, event_id, row_number() OVER ("
    "    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events"
    ") WHERE rn = 1",
)
def window_dedup_latest(spark, sf):
    # window-over-key dedup with deterministic first-writer-wins.
    # rn=1 over (ts DESC, event_id DESC) selects exactly the row with the
    # lexicographically largest (ts, event_id) — expressed as max_by so the
    # aggregation gets MAP-SIDE PARTIAL combining (guide §2.3): the shuffle
    # carries one row per (user, partition) instead of every event, and the
    # per-partition sort the window needed disappears (1.50s → 0.90s at
    # sf1.0 local[32]; oracle SQL unchanged, rows + schema identical —
    # (ts, event_id) is unique per user, so the elected row is the same).
    e = _t(spark, sf, "events")
    return (
        e.groupBy("user_id")
        .agg(F.max_by("event_id", F.struct("ts", "event_id")).alias("latest_event"))
        .select("user_id", "latest_event")
    )


@_q(
    "edge_canonicalize_pairs",
    "SELECT DISTINCT least(l_partkey, l_suppkey) AS a, "
    "greatest(l_partkey, l_suppkey) AS b FROM lineitem",
)
def edge_canonicalize_pairs(spark, sf):
    # U3: undirected-pair canonicalization (chengyu_mysql.py:235-237)
    li = _t(spark, sf, "lineitem")
    return li.select(
        F.least("l_partkey", "l_suppkey").alias("a"),
        F.greatest("l_partkey", "l_suppkey").alias("b"),
    ).distinct()


@_q(
    "window_topn_per_group",
    "SELECT o_custkey, o_orderkey, rn FROM ("
    "  SELECT o_custkey, o_orderkey, row_number() OVER ("
    "    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders"
    ") WHERE rn <= 3",
)
def window_topn_per_group(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


# ===========================================================================
# string / regex / scalar functions  (SURVEY §2.8)
# ===========================================================================

@_q(
    "sweep_gap_count",
    # universe = [0, max(o_orderkey)] (dense in the testdata); observed =
    # the URGENT subset — gaps are the universe members never fetched
    "SELECT CAST((SELECT max(o_orderkey) + 1 FROM orders) - "
    "(SELECT count(DISTINCT o_orderkey) FROM orders "
    " WHERE o_orderpriority LIKE '1-%') AS BIGINT) AS missing",
)
def sweep_gap_count(spark, sf):
    # S7 range-driven gap accounting (hanyuguoxue.py:1146-1242): members
    # of the expected key universe with no observed row — the same
    # anti-join the incremental runner records as sweep_completed.
    from kgpipe.checkpoint import sweep_gaps

    o = _t(spark, sf, "orders")
    hi = o.agg(F.max("o_orderkey")).first()[0]
    observed = o.where(F.col("o_orderpriority").startswith("1-")).select("o_orderkey")
    n = sweep_gaps(spark, observed, 0, int(hi))
    return spark.createDataFrame([(n,)], "missing long")


@_q(
    "orders_string_buckets",
    "SELECT regexp_extract(o_orderpriority, '^(\\d+)', 1) AS pri, "
    "strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS cnt "
    "FROM orders GROUP BY pri, ym",
)
def orders_string_buckets(spark, sf):
    # folds r05 entries regexp_extract_priority (P12-style capture,
    # hanyuguoxue.py:18-21) + date_format_buckets (time formatting,
    # batch_crawl.py:358) into one two-key bucket count
    o = _t(spark, sf, "orders")
    return (
        o.select(
            F.regexp_extract("o_orderpriority", r"^(\d+)", 1).alias("pri"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        )
        .groupBy("pri", "ym")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@_q(
    "normalize_sha_rows",
    "SELECT CAST(p_partkey AS BIGINT) AS id, replace(p_name, ' ', '') AS val, "
    "'norm' AS side FROM part "
    "UNION ALL SELECT doc_id AS id, sha256(text) AS val, 'sha' AS side FROM documents",
)
def normalize_sha_rows(spark, sf):
    # folds r05 entries title_normalize (P13 whitespace-stripped equality
    # key, extract_chengyu.py:48) + sha256_rows (input_hint row
    # invariant sha256(content)) — both row-local scalar projections
    norm = _t(spark, sf, "part").select(
        F.col("p_partkey").cast("long").alias("id"),
        F.regexp_replace("p_name", " ", "").alias("val"),
        F.lit("norm").alias("side"),
    )
    sha = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("id"), F.sha2("text", 256).alias("val"),
        F.lit("sha").alias("side"),
    )
    return norm.unionByName(sha)


# ===========================================================================
# TPC-H-style analytics (pushdown / partial-agg showcase)
# ===========================================================================

@_q(
    "tpch_q1_pricing",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price, "
    "count(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus",
)
def tpch_q1_pricing(spark, sf):
    # exact decimal aggregation carried as SCALED LONGS (guide §2.3,
    # narrower types): sum(decimal(18,2)) keeps a non-compact decimal
    # buffer per group; sum over the exactly-scaled integers is the same
    # rational value (qty < 10^16/10^2, price < 10^14/10^4 per row — far
    # beyond TPC-H ranges — keeps every sum inside int64), and the final
    # decimal division + double cast reproduces the oracle's value
    # bit-for-bit. 1.24s → 0.94s at sf1.0; rows+schema verified equal at
    # sf0.01 and sf1.0.
    li = _t(spark, sf, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    qty = (F.col("l_quantity").cast("decimal(18,2)") * F.lit(100).cast("decimal(3,0)")).cast("long")
    price = (F.col("l_extendedprice").cast("decimal(18,4)") * F.lit(10000).cast("decimal(5,0)")).cast("long")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(qty).cast("decimal(38,0)") / F.lit(100).cast("decimal(3,0)"))
        .cast("double")
        .alias("sum_qty"),
        (F.sum(price).cast("decimal(38,0)") / F.lit(10000).cast("decimal(5,0)"))
        .cast("double")
        .alias("sum_base_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_q(
    "tpch_q3_revenue",
    "SELECT l_orderkey, CAST(round(sum("
    "  CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))"
    "), 2) AS DOUBLE) AS revenue "
    "FROM lineitem GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10",
)
def tpch_q3_revenue(spark, sf):
    # revenue product/sum as SCALED LONGS (guide §2.3): each factor is the
    # exact decimal(18,4) value × 10^4 (fits int64: price < 10^14/10^4,
    # discount factor ≤ 10), the product is the exact revenue × 10^8, and
    # sum(long) replaces the decimal(38,8) buffer. The final decimal
    # division + round + double cast is value-identical to the oracle
    # (verified: zero mismatches over ALL 1.5M groups at sf1.0, and
    # rows+schema equal at sf0.01/sf1.0). 2.45s → 2.12s at sf1.0.
    li = _t(spark, sf, "lineitem")
    pl = (F.col("l_extendedprice").cast("decimal(18,4)") * F.lit(10000).cast("decimal(5,0)")).cast("long")
    ql = ((F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)") * F.lit(10000).cast("decimal(5,0)")).cast("long")
    srev = F.sum(pl * ql)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.round(
                srev.cast("decimal(38,8)") / F.lit(100000000).cast("decimal(9,0)"), 2
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ===========================================================================
# dedup family (documents)
# ===========================================================================

@_q(
    "dedup_exact",
    "SELECT min(doc_id) AS doc_id, md5(text) AS content_hash, count(*) AS dup_count "
    "FROM documents GROUP BY md5(text)",
)
def dedup_exact(spark, sf):
    return textops.dedup_exact(_t(spark, sf, "documents"))


# round-7 hash family (textops.MINHASH_A/B/P): one md5 base per shingle
# (hex-prefix → bigint; DuckDB casts '0x…' literals, Spark uses conv),
# per-seed mixing by multiply-add-mod — mirrored verbatim from textops
from kgpipe.ops.textops import MINHASH_A, MINHASH_B, MINHASH_P

_MINHASH_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id,
    unnest([substr(text, i, 5) FOR i IN range(1, greatest(len(text) - 4, 1) + 1)]) AS shingle
  FROM documents
), based AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) % {p} AS h
  FROM sh
), sig AS (
  SELECT doc_id,
    {mins}
  FROM based GROUP BY doc_id
), banded AS (
  {bands}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
""".format(
    p=MINHASH_P,
    mins=", ".join(
        f"min((h * {MINHASH_A[j]} + {MINHASH_B[j]}) % {MINHASH_P}) AS mh{j}"
        for j in range(8)
    ),
    bands=" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(CAST(mh{2 * b} AS VARCHAR) || '|' || CAST(mh{2 * b + 1} AS VARCHAR)) AS bh FROM sig"
        for b in range(4)
    ),
)


@_q("dedup_minhash_lsh", _MINHASH_ORACLE)
def dedup_minhash_lsh(spark, sf):
    return textops.dedup_minhash_lsh(_t(spark, sf, "documents"))


_CLUSTER_ORACLE = (
    "WITH RECURSIVE pairs AS (" + _MINHASH_ORACLE + "), "
    """
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
walk(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT w.a, e.b FROM walk w JOIN edges e ON w.b = e.a
),
reach AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM walk GROUP BY a)
SELECT d.doc_id,
  coalesce(r.cluster_id, d.doc_id) AS cluster_id,
  coalesce(r.cluster_id, d.doc_id) = d.doc_id AS is_survivor
FROM documents d LEFT JOIN reach r ON r.doc_id = d.doc_id
"""
)


@_q("dedup_clusters", _CLUSTER_ORACLE)
def dedup_clusters(spark, sf):
    # transitive near-dup resolution: LSH pairs -> connected components ->
    # deterministic survivor (oracle: recursive-CTE transitive closure)
    return textops.dedup_clusters(_t(spark, sf, "documents"))


_JACCARD_ORACLE = """
WITH pairs AS (
  SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b
  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
), sh AS (
  SELECT DISTINCT doc_id,
    unnest([substr(text, i, 5) FOR i IN range(1, greatest(len(text) - 4, 1) + 1)]) AS shingle
  FROM documents
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM pairs p JOIN sh a ON a.doc_id = p.doc_a JOIN sh b
    ON b.doc_id = p.doc_b AND b.shingle = a.shingle
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b, round(i.i * 1.0 / (sa.n + sb.n - i.i), 4) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b
"""


@_q("ngram_jaccard_consecutive", _JACCARD_ORACLE)
def ngram_jaccard_consecutive(spark, sf):
    docs = _t(spark, sf, "documents")
    d2 = docs.select((F.col("doc_id") - 1).alias("doc_a"), F.col("doc_id").alias("doc_b"))
    pairs = docs.select(F.col("doc_id").alias("doc_a")).join(d2, "doc_a")
    return textops.ngram_jaccard(docs, pairs)


def _duck_ngrams(n: int) -> str:
    """DuckDB port of textops._word_ngram_hashes: tk[i:i+n-1] is the
    1-based inclusive n-element slice."""
    return (
        f"[md5(array_to_string(tk[i:i+{n - 1}], ' ')) "
        f"FOR i IN range(1, greatest(len(tk) - {n - 1}, 0) + 1)]"
    )


_DUP_SPANS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), grams AS (
  SELECT doc_id, i AS start, md5(array_to_string(tk[i:i+7], ' ')) AS gram_hash
  FROM toks, unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS r(i)
), dup AS (
  SELECT gram_hash, count(DISTINCT doc_id) AS n_docs FROM grams
  GROUP BY gram_hash HAVING count(DISTINCT doc_id) >= 2
)
SELECT g.doc_id, CAST(g.start AS INT) AS start, g.gram_hash, dup.n_docs
FROM grams g JOIN dup USING (gram_hash)
"""


@_q("duplicate_ngram_spans", _DUP_SPANS_ORACLE)
def duplicate_ngram_spans(spark, sf):
    # exact substring-duplication spans (Lee et al. 2022 shape): word
    # 8-grams shared by >= 2 distinct documents
    return textops.duplicate_ngram_spans(_t(spark, sf, "documents"), n=8, min_docs=2)


_SPAN_REMOVAL_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), grams AS (
  SELECT doc_id, i AS start, md5(array_to_string(tk[i:i+7], ' ')) AS gram_hash
  FROM toks, unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS r(i)
), dup AS (
  SELECT gram_hash FROM grams GROUP BY gram_hash HAVING count(DISTINCT doc_id) >= 2
), sp AS (
  SELECT g.doc_id, list(DISTINCT g.start) AS starts
  FROM grams g JOIN dup USING (gram_hash) GROUP BY g.doc_id
), cut AS (
  SELECT t.doc_id, tk,
    [tk[i] FOR i IN range(1, len(tk) + 1)
     IF len(list_filter(coalesce(sp.starts, []), s -> i >= s AND i <= s + 7)) = 0] AS kept
  FROM toks t LEFT JOIN sp ON sp.doc_id = t.doc_id
)
SELECT doc_id,
  CAST(len(tk) AS INT) AS n_tokens,
  CAST(len(tk) - len(kept) AS INT) AS removed_tokens,
  coalesce(array_to_string(kept, ' '), '') AS cleaned_text
FROM cut
"""


# (duplicate_span_removal is registered below, after the keep-first
# oracle constant it composes)


_SPAN_REMOVAL_KEEP_FIRST_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), grams AS (
  SELECT doc_id, i AS start, md5(array_to_string(tk[i:i+7], ' ')) AS gram_hash
  FROM toks, unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS r(i)
), dup AS (
  SELECT gram_hash FROM grams GROUP BY gram_hash HAVING count(DISTINCT doc_id) >= 2
), keepers AS (
  SELECT gram_hash, min(doc_id) AS keeper FROM grams JOIN dup USING (gram_hash)
  GROUP BY gram_hash
), sp AS (
  SELECT g.doc_id, list(DISTINCT g.start) AS starts
  FROM grams g JOIN keepers k USING (gram_hash)
  WHERE g.doc_id <> k.keeper GROUP BY g.doc_id
), cut AS (
  SELECT t.doc_id, tk,
    [tk[i] FOR i IN range(1, len(tk) + 1)
     IF len(list_filter(coalesce(sp.starts, []), s -> i >= s AND i <= s + 7)) = 0] AS kept
  FROM toks t LEFT JOIN sp ON sp.doc_id = t.doc_id
)
SELECT doc_id,
  CAST(len(tk) AS INT) AS n_tokens,
  CAST(len(tk) - len(kept) AS INT) AS removed_tokens,
  coalesce(array_to_string(kept, ' '), '') AS cleaned_text
FROM cut
"""


@_q(
    "duplicate_span_removal",
    f"SELECT a.*, 'cut_all' AS policy FROM ({_SPAN_REMOVAL_ORACLE}) a "
    "UNION ALL "
    f"SELECT b.*, 'keep_first' AS policy FROM ({_SPAN_REMOVAL_KEEP_FIRST_ORACLE}) b",
)
def duplicate_span_removal(spark, sf):
    # the dedup OUTPUT stage: cut every duplicated 8-gram range, rejoin
    # the surviving tokens (Lee et al. 2022's actual transformation);
    # folds r05 entry duplicate_span_removal_keep_first (the paper's
    # keep-lowest-doc_id policy) — both keep policies run side-tagged
    d = _t(spark, sf, "documents")
    cut_all = textops.remove_duplicate_spans(d, n=8, min_docs=2).withColumn(
        "policy", F.lit("cut_all")
    )
    keep_first = textops.remove_duplicate_spans(
        d, n=8, min_docs=2, keep_first=True
    ).withColumn("policy", F.lit("keep_first"))
    return cut_all.unionByName(keep_first)


_STRATIFIED_SPLIT_ORACLE = """
SELECT doc_id,
  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


# (corpus_stratified_split is folded into doc_sampling_split below,
# registered after the weighted-sample oracle constant it composes)
def _corpus_stratified_split(spark, sf):
    # deterministic hash-stratified train/val/test assignment — stable
    # under corpus growth and repartitioning, identical on any engine
    return textops.stratified_split(_t(spark, sf, "documents"))


_CONTAMINATION_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), grams AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(tk) < 8 THEN []
         ELSE [md5(array_to_string(tk[i:i+7], ' ')) FOR i IN range(1, len(tk) - 6)] END
  ) AS garr FROM toks
), corpus_g AS (SELECT doc_id, unnest(garr) AS gram_hash FROM grams),
probe_g AS (
  SELECT doc_id + 10000000 AS probe_id, unnest(garr) AS gram_hash
  FROM grams WHERE doc_id % 97 = 0
)
SELECT c.doc_id, p.probe_id, count(*) AS shared_grams
FROM corpus_g c JOIN probe_g p USING (gram_hash)
WHERE c.doc_id <> p.probe_id
GROUP BY c.doc_id, p.probe_id
"""


@_q("ngram_contamination", _CONTAMINATION_ORACLE)
def ngram_contamination(spark, sf):
    # benchmark decontamination: every 97th document, re-keyed into a
    # DISJOINT id space (+1e7 — an external benchmark table with its own
    # ids), stands in for the eval/benchmark probe set. Each probe's
    # source document is a guaranteed contamination hit, so the gate
    # checks real (corpus doc, probe) pairs rather than vacuously
    # matching on an empty result.
    docs = _t(spark, sf, "documents")
    probes = docs.where(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    return textops.ngram_contamination(docs, probes, n=8)


_PACK_ORACLE = """
WITH staged AS (
  SELECT doc_id,
    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 8 AS INT) AS bucket,
    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0)) AS INT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, bucket, n_tokens,
    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) - n_tokens AS BIGINT) AS tok_offset
  FROM staged
)
SELECT doc_id, bucket, n_tokens, tok_offset,
  CAST(floor(tok_offset / 64.0) AS BIGINT) AS start_seq,
  CAST(floor((tok_offset + greatest(n_tokens - 1, 0)) / 64.0) AS BIGINT) AS end_seq
FROM cum
"""


@_q("pack_sequences", _PACK_ORACLE)
def pack_sequences(spark, sf):
    # concat-then-chunk training-sequence packing manifest: 64-token
    # sequences over 8 independent hash-bucketed streams
    return textops.pack_sequences(
        _t(spark, sf, "documents"), seq_len=64, n_buckets=8
    )


_PACK_PRETOK_ORACLE = """
WITH staged AS (
  SELECT doc_id,
    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 8 AS INT) AS bucket,
    CAST(ceil(length(text) / 4.0) AS INT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, bucket, n_tokens,
    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) - n_tokens AS BIGINT) AS tok_offset
  FROM staged
)
SELECT doc_id, bucket, n_tokens, tok_offset,
  CAST(floor(tok_offset / 64.0) AS BIGINT) AS start_seq,
  CAST(floor((tok_offset + greatest(n_tokens - 1, 0)) / 64.0) AS BIGINT) AS end_seq
FROM cum
"""


@_q("pack_pretokenized", _PACK_PRETOK_ORACLE)
def pack_pretokenized(spark, sf):
    # the tokenizer hook: a pre-computed token count (here a BPE-ish
    # chars/4 proxy, deterministic in both engines) flows through the
    # packing manifest instead of the default whitespace re-split —
    # exercising n_tokens_col end-to-end against the oracle
    docs = _t(spark, sf, "documents").withColumn(
        "bpe_n", F.ceil(F.char_length("text") / 4).cast("int")
    )
    return textops.pack_sequences(docs, seq_len=64, n_buckets=8, n_tokens_col="bpe_n")


def _pii_augmented_sql(engine: str) -> str:
    """Both sides synthesize the SAME deterministic PII into the corpus
    text (the synthetic documents carry none), so the gate checks real
    redactions instead of a no-op pass-through — plus the VERDICT-r5
    negative traps (year, space-separated date, ISBN, 16-digit id, hex
    id) that the tightened phone rules must leave untouched."""
    cast = "VARCHAR" if engine == "duckdb" else "STRING"
    return (
        f"concat(text, ' contact user', CAST(doc_id AS {cast}), "
        "'@example.com at 10.0.0.1 or +12 3456 7890 or (555) 123-4567 "
        "(year 2026, logged 2026 08 17 12 00, isbn 978-0-306-40615-7, "
        "id 1234567890123456, ref deadbeef1234567)')"
    )


def _pii_oracle_sql() -> str:
    """Render the staged redaction CTE chain FROM PII_RULES so the
    DuckDB oracle can never drift from the rule set the operator
    applies: one CTE per rule, each counting matches on the text as
    already scrubbed by the earlier rules — exactly pii_scrub's
    sequential semantics."""
    from kgpipe.ops.textops import PII_RULES

    ctes = [f"aug AS (SELECT doc_id, {_pii_augmented_sql('duckdb')} AS text FROM documents)"]
    prev_t, prev_cs = "text", []
    for i, (pat, repl) in enumerate(PII_RULES, start=1):
        lit = pat.replace("'", "''")
        carry = "".join(f"{c}, " for c in prev_cs)
        ctes.append(
            f"s{i} AS (\n  SELECT doc_id, {carry}"
            f"len(regexp_extract_all({prev_t}, '{lit}')) AS c{i},\n"
            f"    regexp_replace({prev_t}, '{lit}', '{repl}', 'g') AS t{i}\n"
            f"  FROM {'aug' if i == 1 else f's{i - 1}'})"
        )
        prev_t, prev_cs = f"t{i}", prev_cs + [f"c{i}"]
    total = " + ".join(prev_cs)
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT doc_id, {prev_t} AS scrubbed_text, "
        f"CAST({total} AS INT) AS n_redactions FROM s{len(PII_RULES)}"
    )


_PII_ORACLE = _pii_oracle_sql()


@_q("pii_scrub", _PII_ORACLE)
def pii_scrub(spark, sf):
    # PII redaction gate over deterministically-injected emails/IPs/
    # phones (the synthetic corpus carries none of its own)
    docs = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_pii_augmented_sql("spark")).alias("text")
    )
    return textops.pii_scrub(docs)


_WEIGHTED_SAMPLE_ORACLE = """
SELECT doc_id, source FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0
  < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.25 ELSE 0.1 END)
"""


@_q(
    "doc_sampling_split",
    f"WITH sp AS ({_STRATIFIED_SPLIT_ORACLE}), ws AS ({_WEIGHTED_SAMPLE_ORACLE}) "
    "SELECT sp.doc_id, sp.bucket, sp.split, ws.source AS sampled_source "
    "FROM sp LEFT JOIN ws USING (doc_id)",
)
def doc_sampling_split(spark, sf):
    # folds r05 entries corpus_stratified_split + weighted_sample: the
    # two deterministic id-hash document-assignment operators — a
    # train/val/test split for every document, plus the domain-mixture
    # sampling decision (keep 100% of src0, 50% of src1, 25% of src2,
    # 10% of the long tail) as a nullable sampled_source column; both
    # reproducible at any parallelism and stable as the corpus grows
    d = _t(spark, sf, "documents")
    sampled = textops.weighted_sample(
        d, rates={"src0": 1.0, "src1": 0.5, "src2": 0.25}, default_rate=0.1
    ).select("doc_id", F.col("source").alias("sampled_source"))
    return _corpus_stratified_split(spark, sf).join(sampled, "doc_id", "left")


_SOURCE_STATS_ORACLE = """
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0))) AS BIGINT) AS total_tokens,
  round(avg(len(text)), 2) AS mean_chars,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents GROUP BY source
"""


@_q("corpus_source_stats", _SOURCE_STATS_ORACLE)
def corpus_source_stats(spark, sf):
    # the dataset-card summary table: per-source doc/token/length/lang
    # aggregates in one map-side-combined hash-agg
    return textops.corpus_source_stats(_t(spark, sf, "documents"))


_VOCAB_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0)) AS token
  FROM documents
)
SELECT token, count(*) AS total_count, count(DISTINCT doc_id) AS doc_freq
FROM toks GROUP BY token ORDER BY total_count DESC, token ASC LIMIT 100
"""


@_q("token_vocabulary_topk", _VOCAB_ORACLE)
def token_vocabulary_topk(spark, sf):
    # vocabulary induction counting pass (BPE/tokenizer prep): top-100
    # tokens by corpus count with document frequency
    return textops.token_vocabulary(_t(spark, sf, "documents"), k=100)


_REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), grams AS (
  SELECT doc_id, CASE WHEN len(tk) < 3 THEN [] ELSE {_duck_ngrams(3)} END AS garr FROM toks
)
SELECT doc_id,
  CAST(len(garr) AS INT) AS total_ngrams,
  CAST(len(list_distinct(garr)) AS INT) AS distinct_ngrams,
  CASE WHEN len(garr) = 0 THEN 0.0
       ELSE round(1.0 - len(list_distinct(garr)) * 1.0 / len(garr), 4) END AS repetition_ratio
FROM grams
"""


@_q("text_repetition_stats", _REPETITION_ORACLE)
def text_repetition_stats(spark, sf):
    # within-document repetition ratio (Gopher-style quality signal)
    return textops.repetition_stats(_t(spark, sf, "documents"), n=3)


_SIMHASH_ORACLE = """
WITH toks AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
  ) WHERE len(tok) > 0
), sums AS (
  SELECT doc_id, {sums} FROM toks GROUP BY doc_id
)
SELECT doc_id, CAST({recon} AS BIGINT) AS simhash FROM sums
""".format(
    sums=", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(32)
    ),
    recon=" + ".join(f"(CASE WHEN b{i} > 0 THEN {2 ** i} ELSE 0 END)" for i in range(32)),
)


@_q("simhash32", _SIMHASH_ORACLE)
def simhash32(spark, sf):
    return textops.simhash(_t(spark, sf, "documents"))


# ===========================================================================
# text analysis (documents)
# ===========================================================================

_STOP_SQL = "string_split('" + textops._EN_STOPWORDS + "', ',')"

_LANGID_ORACLE = f"""
SELECT doc_id,
  CASE
    WHEN (len(text) - len(regexp_replace(text, '[\\x{{4e00}}-\\x{{9fff}}]', '', 'g'))) * 2 > len(text) THEN 'zh'
    WHEN len(string_split_regex(trim(text), '\\s+')) > 0
     AND len(list_filter(string_split_regex(trim(text), '\\s+'),
             t -> list_contains({_STOP_SQL}, lower(t)))) * 5
         >= len(string_split_regex(trim(text), '\\s+')) THEN 'en'
    ELSE 'other'
  END AS lang_pred
FROM documents
"""


_TOKEN_COUNTS_ORACLE = """
SELECT doc_id,
len(list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0)) AS ws_tokens,
len(list_filter(string_split_regex(text, '[^A-Za-z0-9\\x{4e00}-\\x{9fff}]+'),
t -> len(t) > 0)) AS word_tokens FROM documents
"""


@_q(
    "text_tokens_langid",
    f"WITH tc AS ({_TOKEN_COUNTS_ORACLE}), li AS ({_LANGID_ORACLE}) "
    "SELECT tc.doc_id, tc.ws_tokens, tc.word_tokens, li.lang_pred "
    "FROM tc JOIN li USING (doc_id)",
)
def text_tokens_langid(spark, sf):
    # folds r05 entries token_counts + text_language_id — two row-local
    # per-document projections joined on doc_id
    d = _t(spark, sf, "documents")
    return textops.token_counts(d).join(textops.language_id(d), "doc_id")


_QUALITY_ORACLE = f"""
SELECT doc_id,
  len(text) AS n_chars_measured,
  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
  round((len(text) - len(regexp_replace(text, '[.,;:!?''"()]', '', 'g'))) * 1.0
        / greatest(len(text), 1), 4) AS punct_ratio,
  round(len(list_filter(string_split_regex(trim(text), '\\s+'),
        t -> list_contains({_STOP_SQL}, lower(t)))) * 1.0
        / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4) AS stopword_ratio,
  round(len(regexp_replace(text, '\\s+', '', 'g')) * 1.0
        / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4) AS mean_token_len,
  round(
    least(len(string_split_regex(trim(text), '\\s+')) / 100.0, 1.0) * 0.4
    + round(len(list_filter(string_split_regex(trim(text), '\\s+'),
        t -> list_contains({_STOP_SQL}, lower(t)))) * 1.0
        / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4) * 0.4
    + (1.0 - least(round((len(text) - len(regexp_replace(text, '[.,;:!?''"()]', '', 'g'))) * 1.0
        / greatest(len(text), 1), 4) * 5, 1.0)) * 0.2,
  4) AS quality
FROM documents
"""


@_q("text_quality_score", _QUALITY_ORACLE)
def text_quality_score(spark, sf):
    return textops.quality_score(_t(spark, sf, "documents"))


@_q(
    "doc_fingerprint",
    "SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9\\x{4e00}-\\x{9fff}]', '', 'g')) "
    "AS fingerprint FROM documents",
)
def doc_fingerprint(spark, sf):
    return textops.fingerprint(_t(spark, sf, "documents"))


_DECISIONS_CACHE: dict = {}


def _clean_decisions(spark, sf):
    """clean_corpus decisions shared by the two gate entries that need
    them (corpus_clean_decisions, prepare_training_corpus) — same
    session-scoped reuse pattern as _kg_graph: the LSH + CC + fused
    signal lineage is the expensive part of both, and the driver gate
    runs every entry back-to-back. Pinned with a lazy localCheckpoint so
    it materializes once at the first consuming action."""
    key = (spark.sparkContext.applicationId, sf)
    hit = _DECISIONS_CACHE.get(key)
    if hit is None:
        hit = textops.clean_corpus(_t(spark, sf, "documents")).localCheckpoint(
            eager=False
        )
        _DECISIONS_CACHE[key] = hit
    return hit


def _corpus_clean_decisions_oracle() -> str:
    """Composes the three stage oracles (each already hash-verified on
    its own) into the same join + decision — the recursive-CTE cluster
    closure nests as a derived table."""
    return f"""
WITH ql AS ({_QUALITY_ORACLE}),
rep AS ({_REPETITION_ORACLE}),
clus AS (SELECT * FROM ({_CLUSTER_ORACLE}))
SELECT ql.doc_id, ql.quality, rep.repetition_ratio, clus.is_survivor,
  (ql.quality >= 0.3 AND rep.repetition_ratio <= 0.5 AND clus.is_survivor) AS keep
FROM ql JOIN rep USING (doc_id) JOIN clus USING (doc_id)
"""


@_q("prepare_training_corpus")
def prepare_training_corpus(spark, sf):
    # the full corpus-prep product: filter (quality + repetition +
    # near-dup survivorship) -> keep-first span cut among survivors ->
    # hash-stratified split; the frame a tokenizer/trainer consumes.
    # reuses the session-cached decisions frame (decisions= parameter).
    # folds r05 entry corpus_clean_decisions: the per-document decision
    # columns ride along via a left join, NULL product columns marking
    # the filtered-out documents
    decisions = _clean_decisions(spark, sf)
    prep = textops.prepare_training_corpus(
        _t(spark, sf, "documents"), decisions=decisions
    )
    return decisions.join(prep, "doc_id", "left")


@_lazy_oracle("prepare_training_corpus")
def _prepare_training_corpus_oracle() -> str:
    """Composes the (already individually hash-verified) clean-corpus
    oracle with the keep-first span-removal and split oracles, scoped to
    the surviving documents; the decision columns of every document ride
    along (r05's corpus_clean_decisions entry, folded)."""
    clean = _corpus_clean_decisions_oracle()
    product = f"""
WITH clean AS (SELECT * FROM ({clean}) cc),
kept AS (
  SELECT d.doc_id, d.text FROM documents d JOIN clean USING (doc_id) WHERE clean.keep
), toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0) AS tk
  FROM kept
), grams AS (
  SELECT doc_id, i AS start, md5(array_to_string(tk[i:i+7], ' ')) AS gram_hash
  FROM toks, unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS r(i)
), dup AS (
  SELECT gram_hash FROM grams GROUP BY gram_hash HAVING count(DISTINCT doc_id) >= 2
), keepers AS (
  SELECT gram_hash, min(doc_id) AS keeper FROM grams JOIN dup USING (gram_hash)
  GROUP BY gram_hash
), sp AS (
  SELECT g.doc_id, list(DISTINCT g.start) AS starts
  FROM grams g JOIN keepers kp USING (gram_hash)
  WHERE g.doc_id <> kp.keeper GROUP BY g.doc_id
), cut AS (
  SELECT t.doc_id, tk,
    [tk[i] FOR i IN range(1, len(tk) + 1)
     IF len(list_filter(coalesce(sp.starts, []), s -> i >= s AND i <= s + 7)) = 0] AS kept_toks
  FROM toks t LEFT JOIN sp ON sp.doc_id = t.doc_id
)
SELECT c.doc_id,
  CASE WHEN substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       WHEN substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       ELSE 'test' END AS split,
  CAST(len(tk) AS INT) AS n_tokens,
  CAST(len(tk) - len(kept_toks) AS INT) AS removed_tokens,
  coalesce(array_to_string(kept_toks, ' '), '') AS cleaned_text
FROM cut c
"""
    return f"""
WITH dec AS ({clean}), prod AS ({product})
SELECT dec.doc_id, dec.quality, dec.repetition_ratio, dec.is_survivor, dec.keep,
  prod.split, prod.n_tokens, prod.removed_tokens, prod.cleaned_text
FROM dec LEFT JOIN prod USING (doc_id)
"""


# ===========================================================================
# similarity search (embeddings)
# ===========================================================================

@_q(
    "embedding_l2_norm",
    "SELECT vec_id, round(sqrt(list_sum(list_transform(embedding, "
    "x -> x::DOUBLE * x::DOUBLE))), 4) AS l2_norm FROM embeddings",
)
def embedding_l2_norm(spark, sf):
    return vectorops.l2_norms(_t(spark, sf, "embeddings"))


_COSINE_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round(
  list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))
  / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE * x::DOUBLE)))), 4) AS cosine
FROM embeddings e, q ORDER BY cosine DESC, e.vec_id LIMIT 10
"""


@_q("ann_cosine_topk", _COSINE_ORACLE)
def ann_cosine_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    return vectorops.cosine_topk(emb, qvec, k=10)


_NEAR_DUP_ORACLE = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round(
  list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
  / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(
  list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
  / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4) >= 0.3
"""


@_q("dedup_embedding_cosine", _NEAR_DUP_ORACLE)
def dedup_embedding_cosine(spark, sf):
    # near-dup by embedding cosine with an EXPLICIT block column (a
    # pre-existing cluster/label key); the default LSH-bucketed blocking
    # is exercised by dedup_embedding_lsh_blocked below
    return vectorops.cosine_near_dup(
        _t(spark, sf, "embeddings"), threshold=0.3, block_col="label"
    )


def _lsh_bucket_sql(n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB port of vectorops.hyperplane_bucket: plane coordinates are
    md5-derived constants, inlined as DOUBLE list literals."""
    import hashlib

    def plane(p: int) -> str:
        coords = [
            "1.0" if hashlib.md5(f"{p}|{c}".encode()).hexdigest()[0] >= "8" else "-1.0"
            for c in range(dim)
        ]
        return "[" + ", ".join(coords) + "]"

    return " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {plane(p)}) >= 0 "
        f"THEN {2 ** p} ELSE 0 END)"
        for p in range(n_planes)
    )


@_q("dedup_embedding_lsh_blocked")
def dedup_embedding_lsh_blocked(spark, sf):
    # the DEFAULT blocking path: candidates share a deterministic
    # random-hyperplane LSH bucket — the key that exists on any embedding
    # corpus (no label column required), computed as a zero-shuffle
    # projection. n_planes is PINNED here so the oracle SQL (which
    # inlines the 8 plane constants) matches at any sf; production calls
    # omit it and get the size-aware default (vectorops.derive_n_planes)
    return vectorops.cosine_near_dup(
        _t(spark, sf, "embeddings"), threshold=0.2, n_planes=8
    )


@_lazy_oracle("dedup_embedding_lsh_blocked")
def _dedup_embedding_lsh_blocked_oracle() -> str:
    cos = _duck_cos("a.embedding", "b.embedding", 4)
    return f"""
WITH sigs AS (SELECT vec_id, embedding, {_lsh_bucket_sql()} AS bucket FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= 0.2
"""


def _duck_cos(a: str, b: str, dp: int) -> str:
    return (
        f"round(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])) / "
        f"(sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))) * "
        f"sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))), {dp})"
    )


_IVF_ORACLE = f"""
WITH cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
assigned AS (
  SELECT e.vec_id, e.embedding, c.cid, row_number() OVER (
    PARTITION BY e.vec_id
    ORDER BY {_duck_cos('e.embedding', 'c.cvec', 6)} DESC, c.cid ASC) AS rn
  FROM embeddings e CROSS JOIN cents c
),
best AS (SELECT vec_id, embedding, cid FROM assigned WHERE rn = 1),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qprobe AS (
  SELECT c.cid FROM cents c, q
  ORDER BY {_duck_cos('q.qe', 'c.cvec', 6)} DESC, c.cid LIMIT 2
)
SELECT b.vec_id, {_duck_cos('b.embedding', 'q.qe', 4)} AS cosine
FROM best b, q WHERE b.cid IN (SELECT cid FROM qprobe)
ORDER BY cosine DESC, b.vec_id LIMIT 10
"""


@_q("ann_ivf_topk", _IVF_ORACLE)
def ann_ivf_topk(spark, sf):
    # IVF scale path: coarse-quantize, probe 2 of 8 cells, exact top-k
    # within. Centroids = first 8 vectors (deterministic k-means stand-in).
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    return vectorops.ann_ivf_topk(emb, qvec, k=10, n_centroids=8, n_probe=2)


@_q("ann_lsh_topk")
def ann_lsh_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    return vectorops.ann_lsh_topk(emb, qvec, k=10)


@_lazy_oracle("ann_lsh_topk")
def _ann_lsh_topk_oracle() -> str:
    """Direct SQL port of the md5-hyperplane signature (_lsh_bucket_sql);
    the multi-probe scans buckets within Hamming distance 2 of the
    query's bucket — identical candidate set by construction."""
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, {_lsh_bucket_sql()} AS bucket FROM embeddings
), q AS (SELECT embedding AS qe, bucket AS qb FROM sigs WHERE vec_id = 0)
SELECT s.vec_id, round(
  list_dot_product(CAST(s.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))
  / (sqrt(list_sum(list_transform(s.embedding, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE * x::DOUBLE)))), 4) AS cosine
FROM sigs s, q WHERE bit_count(xor(CAST(s.bucket AS BIGINT), CAST(q.qb AS BIGINT))) <= 2
ORDER BY cosine DESC, s.vec_id LIMIT 10
"""


# ===========================================================================
# KG pipeline — oracled by the independent pure-Python golden computation
# (kgpipe/golden.py) rendered as a DuckDB VALUES table: the corpus is
# deterministic (seed=42), so the expected triple/node/component sets are
# computable without Spark and compared value-for-value by the driver.
# ===========================================================================

_KG_CORPUS_PARAMS = dict(n_hanzi=30, n_words=40, n_idioms=30, seed=42)


def _kg_corpus(spark):
    from kgpipe.corpus import corpus_to_dataframes, generate_corpus

    return corpus_to_dataframes(spark, generate_corpus(**_KG_CORPUS_PARAMS))


_KG_GRAPH_CACHE: dict = {}


def _kg_graph(spark):
    """ONE ``build_graph`` shared by the five kg_* driver-gate queries
    (kg_triples, kg_nodes, hanzi_section_fidelity, kg_edge_endpoints_
    resolve, kg_variant_components). The correctness gate runs every
    entry back-to-back in one session, and each of these used to rebuild
    the full pipeline from the same deterministic corpus — the dominant
    per-entry cost, and the likely reason the round-4 driver sampler
    dropped entries. ONE build serves every mode: full-section parsing
    only enriches the node ``properties`` JSON (S11) — triples, edges
    and the projected node columns are identical either way (the five
    oracles verify exactly that) — so the cache always builds with
    ``full_hanzi_properties=True``. Keyed by applicationId so a repeat
    call in the same Spark application reuses the first build; the
    result frames are pinned with lazy localCheckpoints so each
    materializes once at its first consuming action and every later
    query reads the blocks. The cache holds ONE tiny fixed-size corpus
    graph (100 entities) — not a scale concern."""
    key = spark.sparkContext.applicationId
    hit = _KG_GRAPH_CACHE.get(key)
    if hit is not None:
        return hit
    from kgpipe.pipeline import build_graph

    cdf, sdf = _kg_corpus(spark)
    g = build_graph(
        spark, cdf, sdf, full_hanzi_properties=True, full_term_properties=True
    )
    g.triples = g.triples.localCheckpoint(eager=False)
    g.nodes = g.nodes.localCheckpoint(eager=False)
    g.edges = g.edges.localCheckpoint(eager=False)
    g.edges_canonical = g.edges_canonical.localCheckpoint(eager=False)
    _KG_GRAPH_CACHE[key] = g
    return g


def _golden():
    """The independent pure-Python oracle lives IN the package
    (kgpipe.golden) so oracle_sql() works from an executor zip or an
    installed wheel — library code must not reach into the tests tree."""
    from kgpipe import golden as mod
    from kgpipe.corpus import generate_corpus

    return mod, generate_corpus(**_KG_CORPUS_PARAMS)


@_q("kg_triples")
def kg_triples(spark, sf):
    return _kg_graph(spark).triples


@_lazy_oracle("kg_triples")
def _kg_triples_oracle() -> str:
    mod, corpus = _golden()
    rows = [
        (_sq(s), _sq(p), _sq(o)) for s, p, o in sorted(mod.golden_triples(corpus))
    ]
    return _values_table(rows, ["subj", "pred", "obj"])


@_q("kg_nodes")
def kg_nodes(spark, sf):
    # node_id is xxhash64(entity_type, name) — a pure function of the two
    # projected columns (uniqueness is pytest-asserted), so the name-level
    # projection is the oracle-comparable surface
    return _kg_graph(spark).nodes.select("entity_type", "name", "crawled")


@_lazy_oracle("kg_nodes")
def _kg_nodes_oracle() -> str:
    mod, corpus = _golden()
    rows = [
        (_sq(et), _sq(n), "TRUE" if c else "FALSE")
        for et, n, c in sorted(mod.golden_nodes(corpus))
    ]
    return _values_table(rows, ["entity_type", "name", "crawled"])


@_q("hanzi_section_fidelity")
def hanzi_section_fidelity(spark, sf):
    """S11 full fidelity: build the graph in full-section mode, then read
    the per-section item counts back OUT of the materialized node
    ``properties`` JSON — proving the warehouse actually persists all
    seven section blobs (reference hanyuguoxue.py:1411-1439), not that
    the parsers merely ran. Oracle = the independent pure-Python parse."""
    g = _kg_graph(spark)  # cache always builds full-section (see _kg_graph)
    nodes = g.nodes.where((F.col("entity_type") == "Hanzi") & F.col("crawled"))

    def arr_len(path: str):
        return F.coalesce(
            F.json_array_length(F.get_json_object("properties", path)), F.lit(0)
        ).cast("long")

    return nodes.select(
        "name",
        arr_len("$.gaishu_info.data.summary_info").alias("n_gaishu"),
        arr_len("$.yisi_info.data.explanations").alias("n_yisi"),
        arr_len("$.guoyu_info.data.main_content").alias("n_guoyu"),
        arr_len("$.liangan_info.data.main_content").alias("n_liangan"),
        arr_len("$.evolution_data").alias("n_evolution"),
    )


@_lazy_oracle("hanzi_section_fidelity")
def _hanzi_section_fidelity_oracle() -> str:
    mod, corpus = _golden()
    rows = [
        (
            _sq(name),
            f"CAST({g} AS BIGINT)",
            f"CAST({y} AS BIGINT)",
            f"CAST({gu} AS BIGINT)",
            f"CAST({li} AS BIGINT)",
            f"CAST({e} AS BIGINT)",
        )
        for name, g, y, gu, li, e in sorted(mod.golden_hanzi_sections(corpus))
    ]
    return _values_table(
        rows, ["name", "n_gaishu", "n_yisi", "n_guoyu", "n_liangan", "n_evolution"]
    )


@_q("kg_edge_endpoints_resolve", "SELECT CAST(0 AS BIGINT) AS dangling")
def kg_edge_endpoints_resolve(spark, sf):
    """Referential integrity as a driver-gated query: every edge endpoint
    (raw AND canonicalized) must resolve to a node row — the pipeline
    mints a stub node for every mention/radical/pinyin/translation
    endpoint (pipeline.py endpoint_stubs), so the dangling count is 0 by
    construction; this gate catches any regression in that invariant."""
    g = _kg_graph(spark)
    ids = g.nodes.select("node_id")
    dangling = 0
    for edges in (g.edges, g.edges_canonical):
        for endpoint in ("src_id", "dst_id"):
            dangling += edges.join(
                ids.withColumnRenamed("node_id", endpoint), endpoint, "left_anti"
            ).count()
    return spark.createDataFrame([(dangling,)], "dangling long")


@_q("kg_variant_components")
def kg_variant_components(spark, sf):
    from kgpipe.canon import canonical_mapping

    g = _kg_graph(spark)
    variant = g.edges.where(F.col("rel_type") == "variant-of")
    mapping = canonical_mapping(variant, g.nodes)
    # name-level projection (ids are hashes of the names; see kg_nodes)
    members = g.nodes.where(F.col("entity_type") == "Hanzi").select("node_id", "name")
    return mapping.join(members, "node_id").select("name", "canonical_name")


@_lazy_oracle("kg_variant_components")
def _kg_variant_components_oracle() -> str:
    mod, corpus = _golden()
    rows = [
        (_sq(n), _sq(c)) for n, c in sorted(mod.golden_variant_members(corpus))
    ]
    return _values_table(rows, ["name", "canonical_name"])


# ===========================================================================
# code-KG family — triples over the BASELINE.json input_hint table shape
# (repo, path, commit, lang, content); oracled by an independent
# pure-Python re-application of the same patterns rendered as VALUES
# ===========================================================================


@_q("code_kg_triples")
def code_kg_triples(spark, sf):
    from kgpipe.ops import codeops
    from kgpipe.schemas import CORPUS_SCHEMA  # (repo,path,commit,lang,content)

    files = spark.createDataFrame(codeops.synthetic_source_files(), CORPUS_SCHEMA)
    return codeops.code_triples(files)


@_lazy_oracle("code_kg_triples")
def _code_kg_triples_oracle() -> str:
    """Independent oracle: Python ``re`` (not the JVM) applies the same
    per-language patterns (every ``EDGE_FAMILIES`` predicate, including
    the nested go import-block form) to the same deterministic table."""
    import re as _re

    from kgpipe.ops import codeops

    def _matches(p, text):
        if isinstance(p, tuple):  # (NESTED, outer, inner)
            _, outer, inner = p
            return [
                m for block in _re.findall(outer, text)
                for m in _re.findall(inner, block)
            ]
        return _re.findall(p, text)

    out = set()
    for repo, path, commit, lang, content in codeops.synthetic_source_files():
        for sp in codeops._STRIP_PATTERNS.get(lang, ()):
            content = _re.sub(sp, "", content)
        for pred, patterns, _col in codeops.EDGE_FAMILIES:
            for p in patterns.get(lang, ()):
                for m in _matches(p, content):
                    out.add((f"{repo}/{path}", pred, m))
    rows = [(_sq(s), _sq(p), _sq(o)) for s, p, o in sorted(out)]
    return _values_table(rows, ["subj", "pred", "obj"])


# ===========================================================================
# multimodal plumbing — the stub codecs are pure functions of the payload
# bytes and ``synthetic_media`` is deterministic, so the expected output is
# computable independently (hashlib, not the JVM) and compared exactly.
# DuckDB's sha256() only accepts VARCHAR (not BLOB), so the hash columns are
# rendered into the VALUES table; byte counts are re-derived SQL-side.
# ===========================================================================

_MM_N = 32


@_q("multimodal_image_meta")
def multimodal_image_meta(spark, sf):
    # FOLD (round 7): one entry covers the whole media-metadata family —
    # image_metadata (PNG/JPEG headers + stub) UNION video_metadata
    # (MP4/ISOBMFF tkhd + stub) over the same synthetic table; the kinds
    # partition media_id space (i%3), so the union is disjoint and the
    # one VALUES oracle gates both operators exactly.
    from kgpipe.ops.multimodal import image_metadata, synthetic_media, video_metadata

    media = synthetic_media(spark, _MM_N)
    return image_metadata(media).unionByName(video_metadata(media))


@_lazy_oracle("multimodal_image_meta")
def _multimodal_image_meta_oracle() -> str:
    import hashlib

    rows = []
    from kgpipe.ops.multimodal import (
        gif_fixture_bytes,
        jpeg_fixture_bytes,
        mp4_fixture_bytes,
        png_fixture_bytes,
        webp_fixture_bytes,
    )

    for i in range(_MM_N):
        if i % 3 == 1:  # kind == audio: in neither metadata family
            continue
        # mirror synthetic_media's payload choice; expected dimensions
        # come from the construction PARAMETERS, never from re-running
        # the header parsers under test (round 7: real-JPEG rows join
        # the real-PNG and stub rows; video rows fold in with real-MP4
        # tkhd dimensions at i%9==5)
        if i % 3 == 0:  # image
            if i % 9 == 0:
                payload, w, ht, fmt = png_fixture_bytes(16 + i, 9 + i), 16 + i, 9 + i, "png"
            elif i % 9 == 3:
                payload = jpeg_fixture_bytes(32 + i, 18 + i, progressive=(i % 18 == 12))
                w, ht, fmt = 32 + i, 18 + i, "jpeg"
            elif i % 27 == 6:
                payload, w, ht, fmt = gif_fixture_bytes(20 + i, 11 + i), 20 + i, 11 + i, "gif"
            elif i % 27 == 15:
                payload, w, ht, fmt = webp_fixture_bytes(24 + i, 13 + i), 24 + i, 13 + i, "webp"
            else:
                payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 5)
                h = hashlib.sha256(payload).digest()
                w, ht, fmt = 64 + h[0] % 64, 64 + h[1] % 64, ["png", "jpeg", "webp"][h[2] % 3]
        else:  # video
            if i % 9 == 5:
                payload = mp4_fixture_bytes(64 + i, 36 + i, version=(1 if i % 18 == 14 else 0))
                w, ht, fmt = 64 + i, 36 + i, "mp4"
            else:
                payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 5)
                h = hashlib.sha256(payload).digest()
                w, ht, fmt = 128 + h[0] % 128, 96 + h[1] % 96, ["mp4", "webm", "avi"][h[2] % 3]
        rows.append(
            (
                f"CAST({i} AS BIGINT)",
                _sq(hashlib.sha256(payload).hexdigest()),
                f"CAST(octet_length(unhex({_sq(payload.hex())})) AS BIGINT)",
                f"CAST({w} AS INT)",
                f"CAST({ht} AS INT)",
                _sq(fmt),
            )
        )
    return _values_table(
        rows, ["media_id", "sha256", "n_bytes", "width", "height", "format"]
    )


@_q("multimodal_frame_sample")
def multimodal_frame_sample(spark, sf):
    from kgpipe.ops.multimodal import sample_video_frames, synthetic_media

    return sample_video_frames(synthetic_media(spark, _MM_N))


@_lazy_oracle("multimodal_frame_sample")
def _multimodal_frame_sample_oracle() -> str:
    import hashlib

    from kgpipe.ops.multimodal import mp4_fixture_bytes

    every_n = 10
    rows = []
    for i in range(_MM_N):
        if i % 3 != 2:  # kind != video
            continue
        # mirror synthetic_media: real-MP4 payloads at i%9==5 (round 7)
        if i % 9 == 5:
            payload = mp4_fixture_bytes(64 + i, 36 + i, version=(1 if i % 18 == 14 else 0))
        else:
            payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 5)
        n_frames = max(len(payload) // every_n, 1)
        for idx in range(min(n_frames, 8)):
            chunk = payload[idx * every_n : (idx + 1) * every_n]
            rows.append(
                (
                    f"CAST({i} AS BIGINT)",
                    f"CAST({idx} AS INT)",
                    _sq(hashlib.sha256(chunk).hexdigest()),
                )
            )
    return _values_table(rows, ["media_id", "frame_idx", "frame_sha256"])
