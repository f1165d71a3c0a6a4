"""Typed Spark schemas for every table and parse struct in the pipeline.

The reference stores list-valued fields as MySQL JSON strings
(/root/reference/chengyu/create_table_chengyu.py:30-31) and the hanzi
sections as JSON blobs (/root/reference/hanzi/hanyuguoxue.py:1432-1438).
Here everything is a real nested Spark type — ArrayType / StructType —
so Catalyst can prune and push down into the columnar scan; ``to_json``
is applied only at export boundaries.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


# ---------------------------------------------------------------------------
# input corpus (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

CORPUS_SCHEMA = StructType(
    [
        _s("repo"),
        _s("path"),
        _s("commit"),
        _s("lang"),
        _s("content"),
    ]
)

# seed universe — replaces the Neo4j node scans
# (/root/reference/chengyu/chengyu_neo4j.py:21-42)
SEED_SCHEMA = StructType([_s("name"), _s("entity_type")])


# ---------------------------------------------------------------------------
# parsed-page structs
# ---------------------------------------------------------------------------

CHENGYU_DATA = StructType(
    [
        _s("chengyu"),
        _s("pinyin"),
        _s("zhuyin"),
        _s("emotion"),
        _s("explanation"),
        _s("source"),
        _s("usage"),
        _s("example"),
        StructField("synonyms", ArrayType(StringType()), True),
        StructField("antonyms", ArrayType(StringType()), True),
        _s("translation"),
    ]
)

CHENGYU_PARSED = StructType(
    [_s("url"), _s("error"), StructField("data", CHENGYU_DATA, True)]
)

CIYU_DATA = StructType(
    [
        _s("word"),
        _s("pinyin"),
        _s("zhuyin"),
        _s("part_of_speech"),
        StructField("is_common", BooleanType(), True),
        _s("definition"),
        StructField("synonyms", ArrayType(StringType()), True),
        StructField("antonyms", ArrayType(StringType()), True),
    ]
)

CIYU_PARSED = StructType([_s("url"), _s("error"), StructField("data", CIYU_DATA, True)])

PINYIN_ENTRY = StructType([_s("pinyin"), _s("zhuyin"), _s("audio_file")])
TEXT_LINK = StructType([_s("text"), _s("link")])

BASIC_INFO_DATA = StructType(
    [
        _s("character"),
        StructField("pinyin_info", ArrayType(PINYIN_ENTRY), True),
        _s("bushou"),
        _s("bihua_count"),
        _s("character_type"),
        _s("unicode_basic"),
        _s("character_set"),
        StructField("tags", ArrayType(StringType()), True),
        _s("category"),
        StructField("bushou_detail", TEXT_LINK, True),
        StructField("total_strokes", TEXT_LINK, True),
        _s("structure"),
        _s("formation_method"),
        _s("five_elements"),
        _s("wubi"),
        _s("cangjie"),
        _s("zhengma"),
        _s("sijiaohaoma"),
        _s("telegraph_code"),
        _s("zone_code"),
        _s("unicode_full"),
        StructField("stroke_order", StructType([_s("code"), _s("description")]), True),
        StructField(
            "variant_characters",
            ArrayType(StructType([_s("character"), _s("url")])),
            True,
        ),
    ]
)

GAISHU_DATA = StructType(
    [
        _s("title"),
        StructField("summary_info", ArrayType(StructType([_s("full_text")])), True),
    ]
)

BASIC_EXPLAIN = StructType(
    [_s("number"), _s("explanation"), _s("example"), _s("full_text")]
)
DETAIL_EXPLAIN_EN = StructType(
    [_s("cixing"), _s("number"), _s("content"), _s("quotes"), _s("examples"), _s("english")]
)
DETAIL_EXPLAIN = StructType(
    [_s("cixing"), _s("number"), _s("content"), _s("quotes"), _s("examples")]
)
ANCIENT_EXPLAIN = StructType([_s("number"), _s("explanation"), _s("full_text")])

# typed superset of the reference's two explanation shapes (main reading /
# 古壮字释义 — extract_yisi.py:215-243)
YISI_EXPLANATION = StructType(
    [
        _s("character"),
        StructField("pinyin_info", ArrayType(PINYIN_ENTRY), True),
        StructField("basic_explanation", ArrayType(BASIC_EXPLAIN), True),
        StructField("detailed_explanation", ArrayType(DETAIL_EXPLAIN_EN), True),
        _s("type"),
        StructField("ancient_explanations", ArrayType(ANCIENT_EXPLAIN), True),
    ]
)

YISI_DATA = StructType(
    [_s("title"), StructField("explanations", ArrayType(YISI_EXPLANATION), True)]
)

FANYI_DATA = StructType(
    [
        _s("title"),
        StructField(
            "translations", ArrayType(StructType([_s("language"), _s("translation")])), True
        ),
    ]
)

GUOYU_CONTENT = StructType(
    [
        _s("character"),
        StructField("pinyin_info", PINYIN_ENTRY, True),
        StructField("detailed_explanations", ArrayType(DETAIL_EXPLAIN), True),
    ]
)
GUOYU_DATA = StructType(
    [
        _s("title"),
        StructField("main_content", ArrayType(GUOYU_CONTENT), True),
        _s("notes"),
    ]
)

PINYIN_NAV = StructType(
    [
        _s("pinyin_count"),
        StructField(
            "pinyin_list",
            ArrayType(
                StructType(
                    [
                        _s("type"),
                        _s("pinyin"),
                        _s("index"),
                        StructField("active", BooleanType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

LIANGAN_CONTENT = StructType(
    [
        _s("character"),
        _s("index"),
        StructField("pinyin_info", PINYIN_ENTRY, True),
        StructField("detailed_explanations", ArrayType(DETAIL_EXPLAIN), True),
    ]
)
LIANGAN_DATA = StructType(
    [
        _s("title"),
        StructField("pinyin_navigation", PINYIN_NAV, True),
        StructField("main_content", ArrayType(LIANGAN_CONTENT), True),
        _s("notes"),
    ]
)

EVOLUTION_ENTRY = StructType(
    [_s("character"), _s("image_url"), _s("alt"), _s("period"), _s("style"), _s("source")]
)


def _section(data_type: StructType) -> StructType:
    return StructType(
        [_s("error"), StructField("data", data_type, True)]
    )


HANZI_PARSED = StructType(
    [
        _s("url"),
        StructField("unicode_decimal", LongType(), True),
        _s("error"),
        StructField("basic_info", _section(BASIC_INFO_DATA), True),
        StructField("gaishu_info", _section(GAISHU_DATA), True),
        StructField("yisi_info", _section(YISI_DATA), True),
        StructField("fanyi_info", _section(FANYI_DATA), True),
        StructField("guoyu_info", _section(GUOYU_DATA), True),
        StructField("liangan_info", _section(LIANGAN_DATA), True),
        StructField("evolution_data", ArrayType(EVOLUTION_ENTRY), True),
    ]
)


# ---------------------------------------------------------------------------
# graph tables (Neo4j-shaped) + ops tables
# ---------------------------------------------------------------------------

NODES_SCHEMA = StructType(
    [
        StructField("node_id", LongType(), False),  # xxhash64(entity_type, name)
        _s("entity_type"),  # Idiom | Word | Hanzi | Pinyin | Radical | Translation
        _s("name"),
        _s("url"),
        StructField("properties", StringType(), True),  # JSON at export boundary only
        StructField("crawled", BooleanType(), True),  # False for mention-minted stubs
        StructField("run_id", StringType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)

EDGES_SCHEMA = StructType(
    [
        StructField("src_id", LongType(), False),
        StructField("dst_id", LongType(), False),
        _s("rel_type"),
        _s("src_name"),
        _s("dst_name"),
        StructField("properties", StringType(), True),
        StructField("run_id", StringType(), True),
    ]
)

# metric vocabulary mirrors the reference CSV schema
# (/root/reference/chengyu/batch_crawl.py:346-359, fix_csv_columns.py:42-46)
RUN_METRICS_SCHEMA = StructType(
    [
        _s("run_id"),
        StructField("batch_idx", LongType(), True),
        StructField("start", LongType(), True),
        StructField("end", LongType(), True),
        StructField("processed", LongType(), True),
        StructField("success", LongType(), True),
        StructField("fail", LongType(), True),
        StructField("missing_detail_pages", LongType(), True),
        _s("termination_reason"),
        StructField("elapsed_seconds", DoubleType(), True),
        StructField("insert_rate_per_sec", DoubleType(), True),
        StructField("error_rate", DoubleType(), True),
        _s("timestamp"),
    ]
)

CHECKPOINTS_SCHEMA = StructType(
    [
        _s("run_id"),
        _s("partition_key"),
        _s("status"),  # done | failed
        StructField("rows_in", LongType(), True),
        StructField("nodes_out", LongType(), True),
        StructField("edges_out", LongType(), True),
        _s("lineage"),  # JSON: source snapshot ids / row ranges
        StructField("committed_at", TimestampType(), True),
    ]
)

ERRORS_SCHEMA = StructType([_s("run_id"), _s("partition_key"), _s("key"), _s("error")])

#: streaming composed-of dimension: the one narrow column the per-batch
#: read needs — crawled Hanzi surface forms, append-only
HANZI_DIM_SCHEMA = StructType([_s("name")])
