"""End-to-end graph construction: corpus → nodes / edges / triples.

Spark restatement of the reference's three crawl entry points
(SURVEY.md §3): one batch job, no threads, no queues —

    corpus ──┬─ chengyu pages ─ parse UDF ─┐
             ├─ cidian  pages ─ parse UDF ─┼─ link seeds (J2/P13)
             └─ zidian  pages ─ parse UDF ─┘      │
        nodes (crawled ∪ mention-minted stubs, upsert-dedup)
        edges (syn/ant ∪ composed-of ∪ radical-of ∪ variant-of
               ∪ has-pinyin ∪ translation-of) ─ window dedup
        variant-of ─ iterative CC ─ canonical mapping ─ edges_canonical
        triples (name-level, for the golden P/R gate)

Scale notes:
  * each family is parsed exactly once and persisted before fan-out to
    nodes + several edge families (at warehouse scale this would be a
    materialized staging table instead of an executor cache);
  * the only joins are (a) broadcast seed-linkage, (b) broadcast semi-
    join of composed-of chars against the hanzi dimension, (c) broadcast
    canonical mapping — no large-×-large shuffle joins anywhere;
  * ids are pure hash expressions, so no id-lookup join exists at all
    (the reference's per-record SELECT round-trips disappear).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgpipe import link as L
from kgpipe import triples as T
from kgpipe.canon import apply_canonicalization, canonical_mapping
from kgpipe.ids import node_id
from kgpipe.parse.udfs import (
    make_parse_chengyu_udf,
    make_parse_ciyu_udf,
    make_parse_hanzi_udf,
    parse_chengyu_udf,
    parse_ciyu_udf,
)

#: parser-level projection pushdown: the triple-derivation hot path
#: consumes exactly these zidian sections (nodes properties, radicals,
#: variants, pinyin, translations) — the other five are never extracted
#: nor serialized unless full_hanzi_properties is requested
PIPELINE_HANZI_SECTIONS = ("basic_info", "fanyi_info")
parse_hanzi_pruned_udf = make_parse_hanzi_udf(PIPELINE_HANZI_SECTIONS)

#: same pushdown for the term families (round 7): the triple derivation
#: reads name + pinyin + mention lists (+ idiom translation) — the
#: ci-content / 网络解释 regions are never extracted NOR DOM-parsed on
#: the hot path (chengyu.HOT_FIELDS / ciyu.HOT_FIELDS + slice_term_page)
from kgpipe.parse.chengyu import HOT_FIELDS as CHENGYU_HOT_FIELDS
from kgpipe.parse.ciyu import HOT_FIELDS as CIYU_HOT_FIELDS

parse_chengyu_pruned_udf = make_parse_chengyu_udf(CHENGYU_HOT_FIELDS)
parse_ciyu_pruned_udf = make_parse_ciyu_udf(CIYU_HOT_FIELDS)

#: S11 full fidelity: the reference persists ALL seven section blobs per
#: character (hanyuguoxue.py:1411-1439 — basic_info…evolution_data); the
#: full-section mode materializes every section into the node properties
#: JSON so a warehouse user can query 意思/国语辞典/两岸词典/字源 data
from kgpipe.parse.hanzi import ALL_SECTIONS as ALL_HANZI_SECTIONS

parse_hanzi_full_udf = make_parse_hanzi_udf(ALL_HANZI_SECTIONS)

UNDIRECTED = ("synonym", "antonym", "variant-of")


class GraphResult:
    """Graph-construction result. Members other than ``triples`` may be
    passed as zero-arg thunks and are then constructed LAZILY on first
    attribute access (round 8, guide §1.2 "don't compute things you
    throw away" applied to the DRIVER: plan construction is serial py4j
    round-trips — ~2.5k per build_graph, ~1.7s measured — and the
    flagship triples path never reads nodes/edges/edges_canonical/
    missing/errors, so their plans are now never built there). Attribute
    writes (e.g. re-pointing ``nodes`` at a checkpointed frame) behave
    like the old dataclass."""

    _LAZY_FIELDS = ("nodes", "edges", "edges_canonical", "missing", "errors")

    def __init__(self, *, nodes, edges, edges_canonical, triples, missing,
                 errors, family_counts):
        self.triples = triples
        self.family_counts = family_counts
        self._thunks = {
            "nodes": nodes,
            "edges": edges,
            "edges_canonical": edges_canonical,
            "missing": missing,
            "errors": errors,
        }

    def __getattr__(self, name):
        thunks = self.__dict__.get("_thunks") or {}
        if name in thunks:
            val = thunks[name]
            if callable(val):
                # invoke BEFORE removing the thunk: a failing build (e.g.
                # a transient Spark error) stays retryable instead of
                # turning every later access into a bare AttributeError
                val = val()
            del thunks[name]
            setattr(self, name, val)
            return val
        raise AttributeError(name)


def _rewrite_canonical(edges: DataFrame, nodes: DataFrame = None) -> DataFrame | None:
    """Endpoint rewrite through the alias mapping (CC over variant-of
    edges) WITHOUT the re-dedup pass — may carry duplicate (src, dst,
    rel_type) rows where aliases collapsed. None when no alias graph
    exists (canonicalization is the identity).

    ``nodes`` is the optional (node_id, name) lookup for winner election
    — None (the flagship path) derives it from the variant edges
    themselves: computing the node table (endpoint-stub distinct +
    upsert window over every edge mention) just to name ~|alias graph|
    members would put the whole node pipeline on the triples path. The
    runner passes its already-materialized warehouse nodes instead."""
    mapping = canonical_mapping(edges.where(F.col("rel_type") == "variant-of"), nodes)
    if mapping is None:
        return None
    return apply_canonicalization(edges, mapping)


def canonicalize_edges(edges: DataFrame, nodes: DataFrame = None) -> DataFrame:
    """Global alias canonicalization: CC over variant-of edges, endpoint
    rewrite, re-dedup. Must run over the *complete* edge set (variant
    clusters can span work-unit boundaries), which is why the runner
    calls this after all buckets merge, not per bucket."""
    rewritten = _rewrite_canonical(edges, nodes)
    if rewritten is None:  # no alias graph
        return edges
    return T.dedup_edges(
        rewritten.withColumn("lineage", F.col("src_name"))
    ).drop("lineage")


def triples_view(edges_canonical: DataFrame) -> DataFrame:
    """Name-level (subj, pred, obj) with undirected preds in lexicographic
    canonical order — the golden P/R comparison format."""
    is_undirected = F.col("rel_type").isin(*UNDIRECTED)
    return edges_canonical.select(
        F.when(is_undirected, F.least("src_name", "dst_name"))
        .otherwise(F.col("src_name"))
        .alias("subj"),
        F.col("rel_type").alias("pred"),
        F.when(is_undirected, F.greatest("src_name", "dst_name"))
        .otherwise(F.col("dst_name"))
        .alias("obj"),
    ).distinct()


def _variant_edges_of(hz_valid: DataFrame) -> DataFrame:
    """Variant-of alias edges from a (checkpointed) hz_valid frame — the
    only input the canonicalization mapping needs. Factored out so the
    mapping job can launch CONCURRENTLY with the terms parse barrier
    (both derive from independent checkpoints; the mapping's collect is
    a small job that hides entirely under the terms barrier's wall)."""
    variants = hz_valid.select(
        F.col("basic_info.data.character").alias("src_name"),
        F.explode(F.col("basic_info.data.variant_characters")).alias("v"),
        F.col("path").alias("lineage"),
    ).select(
        "src_name",
        F.col("v.character").alias("mention"),
        F.lit("variant-of").alias("rel_type"),
        "lineage",
    )
    return T.undirected_by_name(variants, "Hanzi")


def _family(corpus: DataFrame, prefix: str) -> DataFrame:
    # at scale `path` family is the corpus partition column → partition pruning
    return corpus.where(F.col("path").startswith(prefix + "/"))


def _term_frame(linked: DataFrame, entity_type: str, data_prefix: str) -> DataFrame:
    """Normalize chengyu/ciyu linked rows into one shape.

    The two families' parse structs differ (chengyu has emotion/source/
    translation, ciyu has part_of_speech/is_common) so the full struct is
    serialized to the JSON ``properties`` column here — the export
    boundary (SURVEY.md §1.2) — and only the shared scalar columns stay
    typed.
    """
    name = f"parsed.data.{data_prefix}"
    has_translation = data_prefix == "chengyu"
    return linked.select(
        F.lit(entity_type).alias("entity_type"),
        F.coalesce(F.col(name), F.col("name")).alias("name"),  # P15 fallback
        F.col("path"),
        F.to_json(F.col("parsed.data")).alias("properties"),
        F.coalesce(F.col("parsed.data.synonyms"), F.array()).alias("synonyms"),
        F.coalesce(F.col("parsed.data.antonyms"), F.array()).alias("antonyms"),
        F.col("parsed.data.pinyin").alias("pinyin"),
        (
            F.col("parsed.data.translation")
            if has_translation
            else F.lit(None).cast("string")
        ).alias("translation"),
    )


def build_graph(
    spark: SparkSession,
    corpus: DataFrame,
    seeds: DataFrame,
    run_id: str = "run-1",
    cache: bool = True,
    hanzi_dim: DataFrame | None = None,
    composed_mode: str = "broadcast",
    full_hanzi_properties: bool = False,
    full_term_properties: bool = False,
) -> GraphResult:
    """``hanzi_dim`` (one ``name`` column) overrides the composed-of
    dimension — the checkpointed runner passes the *global* character
    universe so that a word in one bucket still links characters whose
    zidian pages live in another bucket. ``composed_mode`` selects the
    composed-of skew strategy (see kgpipe.triples.composed_of); the
    runner switches to 'salted' when the dimension exceeds the broadcast
    budget. ``full_hanzi_properties`` (S11 full fidelity) parses and
    persists ALL seven zidian sections into the Hanzi node properties —
    matching the reference's per-character section blobs
    (hanyuguoxue.py:1411-1439); triple derivation is identical in both
    modes (it reads only basic_info + fanyi_info).

    ``full_term_properties`` is the term-family twin (S9/S10 fidelity):
    the reference upserts the COMPLETE idiom/word record (explanation,
    source, usage, example, zhuyin, emotion / definition, part_of_speech,
    is_common — chengyu_mysql.py:162-221); the default hot path extracts
    only the triple-bearing fields, so term node ``properties`` JSON
    carries just those. Triples are identical in both modes."""
    hanzi_sections = (
        ALL_HANZI_SECTIONS if full_hanzi_properties else PIPELINE_HANZI_SECTIONS
    )
    parse_hanzi = (
        parse_hanzi_full_udf if full_hanzi_properties else parse_hanzi_pruned_udf
    )
    parse_chengyu = (
        parse_chengyu_udf if full_term_properties else parse_chengyu_pruned_udf
    )
    parse_ciyu = parse_ciyu_udf if full_term_properties else parse_ciyu_pruned_udf
    # ---- parse (one scan per family; zidian parsed once for all sections) --
    # Generate barrier around each term-family parse: the linkage join's
    # key derives from the UDF output, and Catalyst's ExtractPythonUDFs
    # then plants ONE ArrowEvalPython below the join (key side) and a
    # SECOND one above it (output projection) — every term page was
    # parsed twice (4 ArrowEvalPython nodes in the terms plan; the whole
    # Python-parse floor doubled, ~4.2s of the 9.6s barrier at bench
    # scale 1600). explode(array(udf(...))) pins the evaluation below a
    # Generate node, which projection collapse cannot cross, so the
    # struct is computed once and rides through the join. Also drops
    # `content` before the join instead of carrying it to a post-join
    # re-parse.
    def _parsed_once(family_df: DataFrame, udf) -> DataFrame:
        return family_df.select(
            "path", F.explode(F.array(udf("content", "path"))).alias("parsed")
        )

    chengyu_parsed = _parsed_once(_family(corpus, "chengyu"), parse_chengyu)
    cidian_parsed = _parsed_once(_family(corpus, "cidian"), parse_ciyu)
    zidian_parsed = _family(corpus, "zidian").select(
        "path", parse_hanzi("content", "path").alias("parsed")
    )
    if cache:
        zidian_parsed = zidian_parsed.persist()

    # ---- linkage (J2/P13): seed ⋈ page title, by family -------------------
    # null-name seeds dropped (reference ciyu_neo4j.py:37-39)
    seeds = seeds.where(F.col("name").isNotNull())
    idiom_seeds = seeds.where(F.col("entity_type") == "Idiom").select("name")
    word_seeds = seeds.where(F.col("entity_type") == "Word").select("name")
    idiom_linked, idiom_missing = L.link_seeds_to_pages(
        idiom_seeds, chengyu_parsed, "parsed.data.chengyu"
    )
    word_linked, word_missing = L.link_seeds_to_pages(
        word_seeds, cidian_parsed, "parsed.data.word"
    )

    terms = _term_frame(idiom_linked, "Idiom", "chengyu").unionByName(
        _term_frame(word_linked, "Word", "word")
    )

    # ---- hanzi validity (hanyuguoxue.py:1155-1157) -------------------------
    hz = zidian_parsed.select("path", "parsed.*")
    hz_valid = hz.where(
        F.col("error").isNull() & F.col("basic_info.data.character").isNotNull()
    ).select(
        # prune to the consumed sections BEFORE the cache barrier — the
        # checkpoint then serializes only what downstream reads (all 7
        # in full-fidelity mode, basic+fanyi on the hot path)
        "path", "unicode_decimal", *hanzi_sections
    )
    _barrier_pool = None  # list of daemon threads; results in _barrier_results

    def _barrier_join(name):
        for t in _barrier_pool:
            if t.name == f"kg-barrier-{name}":
                t.join()
        status, value = _barrier_results[name]
        if status == "err":
            raise value
        return value

    if cache:
        # localCheckpoint barriers: seven edge families fan out from
        # `terms` and `hz_valid`; a cold cache would let concurrent
        # branches recompute the parse+linkage lineage, and the
        # un-truncated lineage (deep nested parse structs) makes every
        # downstream plan compilation pay the full analysis cost on the
        # driver. The checkpoint call itself truncates the plan to a
        # LogicalRDD immediately (eager=False defers only the DATA
        # materialization), so — round 8 — the barriers materialize in
        # background threads while the MAIN thread constructs every
        # downstream plan (mentions, 7 edge families, rewrite, triples:
        # ~0.7s of serial py4j round-trips that previously ran after the
        # barrier wall). Concurrent jobs over a not-yet-materialized
        # localCheckpoint RDD are safe: block-level locks make one task
        # compute a partition and the others wait. The mapping job
        # (collect + driver election) launches alongside; it reads the
        # same checkpointed hz_valid the sequential order would, so the
        # mapping is identical by construction (its derivation equality
        # is pinned by test_mapping_from_variant_family_equals_from_dedup
        # and the golden gate). Daemon threads + an explicit result
        # holder instead of a ThreadPoolExecutor: if plan construction
        # below raises, nothing blocks interpreter shutdown and no pool
        # is leaked — the stray count jobs just finish (or fail) in the
        # background.
        import threading

        terms = terms.localCheckpoint(eager=False)
        hz_valid = hz_valid.localCheckpoint(eager=False)
        _barrier_results: dict = {}

        def _spawn(name, fn):
            def _go():
                try:
                    _barrier_results[name] = ("ok", fn())
                except BaseException as exc:  # re-raised at the join point
                    _barrier_results[name] = ("err", exc)

            t = threading.Thread(target=_go, name=f"kg-barrier-{name}", daemon=True)
            t.start()
            return t

        _barrier_pool = [
            _spawn("terms", terms.count),
            _spawn("hz", hz_valid.count),
            _spawn("mapping", lambda: canonical_mapping(_variant_edges_of(hz_valid))),
        ]
    def _make_errors() -> DataFrame:
        return hz.where(
            F.col("error").isNotNull() | F.col("basic_info.data.character").isNull()
        ).select(
            F.lit(run_id).alias("run_id"),
            F.lit("zidian").alias("partition_key"),
            F.col("path").alias("key"),
            F.coalesce(F.col("error"), F.col("basic_info.error")).alias("error"),
        )

    mentions = L.extract_mentions(
        terms, "name", "synonyms", "antonyms", carry_cols=("entity_type",)
    )

    # ---- edges ---------------------------------------------------------------
    # single narrow pass per family — entity_type rides as a column, so no
    # filter-per-type double evaluation and no join-back (SURVEY.md §4)
    syn_ant = T.undirected_by_name(mentions, F.col("entity_type"))

    if hanzi_dim is None:
        hanzi_dim = hz_valid.select(F.col("basic_info.data.character").alias("name"))
    composed = T.composed_of(terms, hanzi_dim, mode=composed_mode)

    radicals = hz_valid.select(
        F.regexp_replace(F.col("basic_info.data.bushou_detail.text"), "部$", "").alias(
            "radical"
        ),
        F.col("basic_info.data.character").alias("hanzi"),
        F.col("path").alias("lineage"),
    ).where(F.col("radical").isNotNull() & (F.length("radical") > 0))
    radical_edges = T.directed(radicals, "Radical", "radical", "Hanzi", "hanzi", "radical-of")

    variants = hz_valid.select(
        F.col("basic_info.data.character").alias("src_name"),
        F.explode(F.col("basic_info.data.variant_characters")).alias("v"),
        F.col("path").alias("lineage"),
    ).select(
        "src_name", F.col("v.character").alias("mention"), F.lit("variant-of").alias("rel_type"), "lineage"
    )
    variant_edges = T.undirected_by_name(variants, "Hanzi")

    hz_pinyin = hz_valid.select(
        F.col("basic_info.data.character").alias("src_name"),
        F.explode(F.col("basic_info.data.pinyin_info")).alias("p"),
        F.col("path").alias("lineage"),
    ).select("src_name", F.col("p.pinyin").alias("py"), "lineage").where(
        F.length("py") > 0
    )
    if full_hanzi_properties:
        # the unpruned sections carry per-reading pinyin (reference
        # extract_guoyu.py:25-220, extract_yisi.py, extract_liangan.py) —
        # SURVEY §2.11 maps them to has-pinyin evidence, so full-fidelity
        # mode widens the evidence base to every section reading; readings
        # already covered by basic_info dedup away in dedup_edges
        empty = F.array().cast("array<string>")
        yisi_py = F.coalesce(
            F.flatten(
                F.transform(
                    F.col("yisi_info.data.explanations"),
                    lambda e: F.coalesce(
                        F.transform(e["pinyin_info"], lambda p: p["pinyin"]), empty
                    ),
                )
            ),
            empty,
        )
        guoyu_py = F.coalesce(
            F.transform(
                F.col("guoyu_info.data.main_content"),
                lambda c: c["pinyin_info"]["pinyin"],
            ),
            empty,
        )
        liangan_py = F.coalesce(
            F.transform(
                F.col("liangan_info.data.main_content"),
                lambda c: c["pinyin_info"]["pinyin"],
            ),
            empty,
        )
        section_pinyin = hz_valid.select(
            F.col("basic_info.data.character").alias("src_name"),
            F.explode(F.concat(yisi_py, guoyu_py, liangan_py)).alias("py"),
            F.col("path").alias("lineage"),
        ).where(F.col("py").isNotNull() & (F.length("py") > 0))
        hz_pinyin = hz_pinyin.unionByName(section_pinyin)
    hz_pinyin_edges = T.directed(hz_pinyin, "Hanzi", "src_name", "Pinyin", "py", "has-pinyin")
    term_pinyin = terms.select(
        "entity_type", F.col("name").alias("src_name"), F.col("pinyin").alias("py"),
        F.col("path").alias("lineage"),
    ).where(F.col("py").isNotNull() & (F.length("py") > 0))
    term_pinyin_edges = T.directed(
        term_pinyin, F.col("entity_type"), "src_name", "Pinyin", "py", "has-pinyin"
    )

    hz_trans = hz_valid.select(
        F.col("basic_info.data.character").alias("src_name"),
        F.explode(F.col("fanyi_info.data.translations")).alias("t"),
        F.col("path").alias("lineage"),
    ).select(
        "src_name",
        F.concat_ws(": ", F.col("t.language"), F.col("t.translation")).alias("trans"),
        "lineage",
    )
    # idiom translation string is "lang: text; lang: text" (extract_chengyu.py:168)
    idiom_trans = terms.where(
        (F.col("entity_type") == "Idiom") & F.col("translation").isNotNull()
    ).select(
        F.col("name").alias("src_name"),
        F.explode(F.split(F.col("translation"), "; ")).alias("trans"),
        F.col("path").alias("lineage"),
    ).where(F.length("trans") > 0)
    trans_edges = T.directed(
        hz_trans, "Hanzi", "src_name", "Translation", "trans", "translation-of"
    ).unionByName(
        T.directed(idiom_trans, "Idiom", "src_name", "Translation", "trans", "translation-of")
    )

    # ---- nodes (LAZY plan construction, round 8) ---------------------------
    # Every edge endpoint gets a node row: crawled pages as full records,
    # everything else (mentions, variant characters, radicals, pinyin and
    # translation literals) as crawled=False stubs — no dangling edge ids
    # (schemas.py entity_type vocabulary: Idiom | Word | Hanzi | Radical |
    # Pinyin | Translation). The whole node-plan construction (~10 selects
    # + 9 unions + a window) is serial py4j driver work the flagship
    # triples path never reads, so it is deferred into a GraphResult
    # thunk and only built when a caller touches g.nodes.
    def _make_nodes() -> DataFrame:
        term_nodes = terms.select(
            node_id("entity_type", "name").alias("node_id"),
            "entity_type",
            "name",
            F.col("path").alias("url"),
            "properties",
            F.lit(True).alias("crawled"),
        )
        # node properties: basic_info only on the hot path; every parsed
        # section in full-fidelity mode (the reference's section blobs,
        # hanyuguoxue.py:1411-1439)
        prop_sections = hanzi_sections if full_hanzi_properties else ("basic_info",)
        prop_cols = [F.col(s) for s in prop_sections] + [F.col("unicode_decimal")]
        hanzi_nodes = hz_valid.select(
            node_id(F.lit("Hanzi"), F.col("basic_info.data.character")).alias("node_id"),
            F.lit("Hanzi").alias("entity_type"),
            F.col("basic_info.data.character").alias("name"),
            F.col("path").alias("url"),
            F.to_json(F.struct(*prop_cols)).alias("properties"),
            F.lit(True).alias("crawled"),
        )

        def _stub(df: DataFrame, entity_type, name_col: str) -> DataFrame:
            et = F.lit(entity_type) if isinstance(entity_type, str) else entity_type
            return df.select(et.alias("entity_type"), F.col(name_col).alias("name"))

        endpoint_stubs = (
            _stub(mentions, F.col("entity_type"), "mention")
            .unionByName(_stub(radicals, "Radical", "radical"))
            .unionByName(
                _stub(variants.where(F.col("mention") != F.col("src_name")), "Hanzi", "mention")
            )
            .unionByName(_stub(hz_pinyin, "Pinyin", "py"))
            .unionByName(_stub(term_pinyin, "Pinyin", "py"))
            .unionByName(_stub(hz_trans, "Translation", "trans"))
            .unionByName(_stub(idiom_trans, "Translation", "trans"))
            .distinct()
            .select(
                node_id("entity_type", "name").alias("node_id"),
                "entity_type",
                "name",
                F.lit(None).cast("string").alias("url"),
                F.lit(None).cast("string").alias("properties"),
                F.lit(False).alias("crawled"),
            )
        )

        all_nodes = term_nodes.unionByName(endpoint_stubs).unionByName(hanzi_nodes)
        # upsert semantics: a crawled row replaces a mention-minted stub
        # (INSERT IGNORE + ON DUP KEY UPDATE — chengyu_mysql.py:162-221);
        # deterministic winner: crawled first, then lexicographic url.
        node_w = Window.partitionBy("node_id").orderBy(
            F.col("crawled").desc(), F.col("url").asc_nulls_last()
        )
        nodes = (
            all_nodes.withColumn("_rn", F.row_number().over(node_w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("run_id", F.lit(run_id))
            .withColumn("updated_at", F.current_timestamp())
        )
        if cache:
            # lazy persist (NOT an eager barrier): nodes only compute
            # when a caller reads them (warehouse merge, inspection)
            nodes = nodes.persist()
        return nodes

    raw_edges = (
        syn_ant.unionByName(composed)
        .unionByName(radical_edges)
        .unionByName(variant_edges)
        .unionByName(hz_pinyin_edges)
        .unionByName(term_pinyin_edges)
        .unionByName(trans_edges)
    )
    _edges_memo: list = []

    def _make_edges() -> DataFrame:
        # LAZY (round 6 made the persist lazy; round 8 defers the PLAN
        # construction too): the deduped edge table materializes only
        # when a consumer reads g.edges — the flagship triples path no
        # longer touches it. The former eager barrier shuffled and wrote
        # the full deduped payload (~10M rows with properties+lineage at
        # bench scale 9600) before triples could start: 51s of the 133s
        # local[16] profile (tools/profile_kg.py).
        if not _edges_memo:
            edges = (
                T.dedup_edges(raw_edges)
                .withColumn("run_id", F.lit(run_id))
                .drop("lineage")
            )
            if cache:
                edges = edges.persist()
            _edges_memo.append(edges)
        return _edges_memo[0]

    # ---- canonicalization (variant-of alias graph → CC) --------------------
    # The mapping derives from the VARIANT FAMILY alone, before the union
    # and the id-level dedup: union-find is duplicate-insensitive (A~B
    # twice is still one merge) and the election's name lookup distincts,
    # so the result is identical to mapping over the deduped edge table
    # (asserted by test_mapping_from_variant_family_equals_from_dedup) —
    # but the collect job runs only the tiny variants lineage off the
    # hz_valid barrier, never the 7-family union. nodes NOT passed: the
    # election's name lookup derives from the variant edges themselves,
    # keeping the node pipeline off the flagship path. On the cached
    # path the mapping job was launched inside the barrier pool (it
    # depends only on the hz checkpoint) and has been running under the
    # terms barrier — collect its result here.
    mapping = (
        _barrier_join("mapping") if _barrier_pool is not None else canonical_mapping(variant_edges)
    )
    if mapping is None:  # no alias graph: canonicalization is the identity
        _make_edges_canonical = _make_edges
        # name-level distinct subsumes the id-level dedup → one fused
        # job: family projections → union → distinct, no edge barrier
        triples = triples_view(raw_edges)
    else:
        def _make_edges_canonical() -> DataFrame:
            return T.dedup_edges(
                apply_canonicalization(_make_edges(), mapping).withColumn(
                    "lineage", F.col("src_name")
                )
            ).drop("lineage")

        # the name-level distinct in triples_view subsumes BOTH id-level
        # dedups (they only remove duplicate (src, dst, rel) rows), so
        # the flagship triples path rewrites the RAW family union through
        # the broadcast mapping and goes straight to the distinct — one
        # wide shuffle total, no materialization barrier between the
        # parse checkpoints and the final aggregate. Identical triple
        # set, asserted by test_triples_from_rewrite_equals_from_canonical
        # (new path vs triples_view over the doubly-deduped edges_canonical)
        # and the golden P/R gate.
        triples = triples_view(
            apply_canonicalization(
                raw_edges.withColumn("run_id", F.lit(run_id)), mapping
            )
        )

    def _make_missing() -> DataFrame:
        return idiom_missing.withColumn("entity_type", F.lit("Idiom")).unionByName(
            word_missing.withColumn("entity_type", F.lit("Word"))
        )

    # lazy: each count is a job; callers that don't need metrics pay nothing
    class _LazyCounts(dict):
        _frames = {
            "idiom_seeds": idiom_seeds,
            "word_seeds": word_seeds,
            "idiom_missing": idiom_missing,
            "word_missing": word_missing,
            "hanzi_pages": hz,
            "hanzi_valid": hz_valid,
        }

        def __getitem__(self, key):
            if key not in self:
                self[key] = self._frames[key].count()
            return super().__getitem__(key)

    family_counts = _LazyCounts()

    if _barrier_pool is not None:
        # barrier materialization ran under the plan construction above;
        # build_graph still returns with both checkpoints materialized
        # (same contract as the former eager barriers)
        _barrier_join("terms")
        _barrier_join("hz")

    return GraphResult(
        nodes=_make_nodes,
        edges=_make_edges,
        edges_canonical=_make_edges_canonical,
        triples=triples,
        missing=_make_missing,
        errors=_make_errors,
        family_counts=family_counts,
    )
