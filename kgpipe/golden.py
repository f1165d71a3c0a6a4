# -*- coding: utf-8 -*-
"""Independent single-threaded oracle for the golden-triple P/R gate.

Replicates the reference's *dataflow semantics* (SURVEY.md §3) in plain
Python sets/dicts — no Spark, no shared join/dedup code with the engine —
so agreement between the two is meaningful:

  * seed → page linkage by whitespace-normalized <h1> equality
    (extract_chengyu.py:44-48),
  * per-record relation planning: normalize (strip), drop empties, skip
    self-loops, canonical undirected pair, INSERT IGNORE set-dedup
    (chengyu_mysql.py:207-247),
  * hanzi validity gate basic_info.data.character
    (hanyuguoxue.py:1155-1157),
  * variant alias canonicalization via union-find (min-name
    representative), then endpoint rewrite + self-loop drop.

The page *parsers* are the shared pure functions — their fidelity is
covered separately by the golden-fixture tests against the reference's
own embedded HTML.
"""

from __future__ import annotations

from kgpipe.corpus import Corpus
from kgpipe.parse.chengyu import parse_chengyu_html
from kgpipe.parse.ciyu import parse_ciyu_html
from kgpipe.parse.hanzi import parse_hanzi_html

UNDIRECTED = {"synonym", "antonym", "variant-of"}


def _norm_title(s: str) -> str:
    return s.replace(" ", "")


def _und(a: str, pred: str, b: str) -> tuple:
    return (min(a, b), pred, max(a, b))


def _parse_and_link(corpus: Corpus) -> tuple[list[dict], list[dict], set[str]]:
    """Shared serial parse + seed-linkage stage: returns (linked term
    records deduped by (kind, name), valid hanzi parses, hanzi chars)."""
    pages = {r["path"]: r["content"] for r in corpus.rows}

    parsed_terms: dict[str, dict] = {}  # normalized title -> (kind, data)
    hanzi_parsed: list[dict] = []
    for path, content in pages.items():
        if path.startswith("chengyu/"):
            out = parse_chengyu_html(content, path)
            name = out.get("data", {}).get("chengyu")
            if name:
                parsed_terms[_norm_title(name)] = {"kind": "Idiom", "name": name, "data": out["data"]}
        elif path.startswith("cidian/"):
            out = parse_ciyu_html(content, path)
            name = out.get("data", {}).get("word")
            if name:
                parsed_terms[_norm_title(name)] = {"kind": "Word", "name": name, "data": out["data"]}
        elif path.startswith("zidian/"):
            out = parse_hanzi_html(content, path)
            if out.get("error") is None and out["basic_info"].get("data", {}).get("character"):
                hanzi_parsed.append(out)

    hanzi_chars = {h["basic_info"]["data"]["character"] for h in hanzi_parsed}

    # seed linkage, deduped (replays / whitespace-variant seeds)
    linked: list[dict] = []
    seen_terms: set[tuple] = set()
    for seed in corpus.seeds:
        rec = parsed_terms.get(_norm_title(seed["name"]))
        if rec is not None and rec["kind"] == seed["entity_type"]:
            key = (rec["kind"], rec["name"])
            if key not in seen_terms:
                seen_terms.add(key)
                linked.append(rec)
    return linked, hanzi_parsed, hanzi_chars


def golden_triples(corpus: Corpus) -> set[tuple]:
    linked, hanzi_parsed, hanzi_chars = _parse_and_link(corpus)

    # typed triples: (subj, subj_is_hanzi, pred, obj, obj_is_hanzi) — the
    # alias canonicalization applies ONLY to Hanzi-typed endpoints
    # (a Radical node named 王 is a different entity than the character 王)
    typed: set[tuple] = set()

    # term-derived triples
    for rec in linked:
        name, data = rec["name"], rec["data"]
        for rel, field in (("synonym", "synonyms"), ("antonym", "antonyms")):
            for t in data.get(field) or []:
                tn = t.strip() if t else None
                if not tn or tn == name:
                    continue
                typed.add((name, False, rel, tn, False))
        for ch in name:
            if ch in hanzi_chars:
                typed.add((name, False, "composed-of", ch, True))
        py = data.get("pinyin")
        if py:
            typed.add((name, False, "has-pinyin", py, False))
        if rec["kind"] == "Idiom":
            tr = data.get("translation")
            if tr:
                for item in tr.split("; "):
                    if item:
                        typed.add((name, False, "translation-of", item, False))

    # hanzi-derived triples
    variant_pairs: set[tuple[str, str]] = set()
    for h in hanzi_parsed:
        basic = h["basic_info"]["data"]
        char = basic["character"]
        bd = basic.get("bushou_detail")
        if bd and bd.get("text"):
            radical = bd["text"][:-1] if bd["text"].endswith("部") else bd["text"]
            if radical:
                typed.add((radical, False, "radical-of", char, True))
        for v in basic.get("variant_characters") or []:
            if v["character"] and v["character"] != char:
                variant_pairs.add((min(char, v["character"]), max(char, v["character"])))
        for p in basic.get("pinyin_info") or []:
            if p["pinyin"]:
                typed.add((char, True, "has-pinyin", p["pinyin"], False))
        for t in (h["fanyi_info"].get("data", {}) or {}).get("translations") or []:
            typed.add((char, True, "translation-of", f"{t['language']}: {t['translation']}", False))

    for a, b in variant_pairs:
        typed.add((a, True, "variant-of", b, True))

    # canonicalization: union-find over variant pairs, min-name representative
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in variant_pairs:
        union(a, b)

    def canon(x: str, is_hanzi: bool) -> str:
        return find(x) if is_hanzi and x in parent else x

    out: set[tuple] = set()
    for s, s_hz, p, o, o_hz in typed:
        cs, co = canon(s, s_hz), canon(o, o_hz)
        if p in UNDIRECTED:
            if cs == co:
                continue
            out.add(_und(cs, p, co))
        else:
            if s_hz and o_hz and cs == co:
                continue
            out.add((cs, p, co))
    return out


def golden_nodes(corpus: Corpus) -> set[tuple]:
    """Independent node-table oracle: (entity_type, name, crawled).

    Mirrors the reference's upsert semantics (crawled record beats a
    mention-minted stub — chengyu_mysql.py:162-221) at name granularity:
    crawled = True wins when both a page and a mention produce the node.
    Stub population = every edge endpoint that is not itself a crawled
    page: synonym/antonym mentions, variant characters, radicals, pinyin
    and translation literals.
    """
    linked, hanzi_parsed, _ = _parse_and_link(corpus)

    crawled: set[tuple[str, str]] = set()
    stubs: set[tuple[str, str]] = set()

    for rec in linked:
        name, data, kind = rec["name"], rec["data"], rec["kind"]
        crawled.add((kind, name))
        for field in ("synonyms", "antonyms"):
            for t in data.get(field) or []:
                tn = t.strip() if t else None
                if tn:
                    stubs.add((kind, tn))
        py = data.get("pinyin")
        if py:
            stubs.add(("Pinyin", py))
        if kind == "Idiom":
            tr = data.get("translation")
            if tr:
                for item in tr.split("; "):
                    if item:
                        stubs.add(("Translation", item))

    for h in hanzi_parsed:
        basic = h["basic_info"]["data"]
        char = basic["character"]
        crawled.add(("Hanzi", char))
        bd = basic.get("bushou_detail")
        if bd and bd.get("text"):
            radical = bd["text"][:-1] if bd["text"].endswith("部") else bd["text"]
            if radical:
                stubs.add(("Radical", radical))
        for v in basic.get("variant_characters") or []:
            if v["character"] and v["character"] != char:
                stubs.add(("Hanzi", v["character"]))
        for p in basic.get("pinyin_info") or []:
            if p["pinyin"]:
                stubs.add(("Pinyin", p["pinyin"]))
        for t in (h["fanyi_info"].get("data", {}) or {}).get("translations") or []:
            stubs.add(("Translation", f"{t['language']}: {t['translation']}"))

    return {(et, n, True) for et, n in crawled} | {
        (et, n, False) for et, n in stubs if (et, n) not in crawled
    }


def golden_variant_members(corpus: Corpus) -> set[tuple]:
    """Independent alias-canonicalization oracle: (name, canonical_name)
    for every character that participates in a variant-of cluster;
    canonical representative = lexicographically smallest name."""
    _, hanzi_parsed, _ = _parse_and_link(corpus)

    variant_pairs: set[tuple[str, str]] = set()
    for h in hanzi_parsed:
        basic = h["basic_info"]["data"]
        char = basic["character"]
        for v in basic.get("variant_characters") or []:
            if v["character"] and v["character"] != char:
                variant_pairs.add((min(char, v["character"]), max(char, v["character"])))

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in variant_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    return {(name, find(name)) for name in parent}


def golden_hanzi_sections(corpus: Corpus) -> set[tuple]:
    """Independent S11 full-fidelity oracle: per crawled character, the
    item counts of the five sections the hot path does NOT consume
    (gaishu summary blocks, yisi explanation readings, guoyu/liangan
    main-content readings, evolution entries) — the reference persists
    all of them per character (hanyuguoxue.py:1411-1439). Computed from
    the pure-Python parser directly, no Spark, no JSON round-trip."""
    _, hanzi_parsed, _ = _parse_and_link(corpus)
    out: set[tuple] = set()
    for h in hanzi_parsed:
        char = h["basic_info"]["data"]["character"]

        def items(section: str, field: str) -> int:
            data = (h.get(section) or {}).get("data") or {}
            return len(data.get(field) or [])

        out.add(
            (
                char,
                items("gaishu_info", "summary_info"),
                items("yisi_info", "explanations"),
                items("guoyu_info", "main_content"),
                items("liangan_info", "main_content"),
                len(h.get("evolution_data") or []),
            )
        )
    return out


def precision_recall(ours: set[tuple], golden: set[tuple]) -> tuple[float, float]:
    if not ours or not golden:
        return (0.0, 0.0)
    inter = len(ours & golden)
    return inter / len(ours), inter / len(golden)
