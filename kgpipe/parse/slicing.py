# -*- coding: utf-8 -*-
"""Pre-DOM input pruning shared by the term-page parsers (round 6).

The zidian card slicer (parse/hanzi.py:_slice_cards) proved cutting a
page down BEFORE DOM construction is worth ~3x on pages dominated by
unconsumed chrome. Term pages (chengyu/cidian dialects) have no data-id
card markers, so the term slicer prunes the one region that is always
chrome when present — the PREFIX before the first content marker (site
head / nav / banner) — under a conservative gate:

  * the hazard list IS the parsers' doc-level query surface (<h1> plus
    the ci-* marker classes plus the 网络解释 heading text,
    extract_chengyu.py:80-168 / extract_ciyu.py:82-128): the slice
    starts at the tag enclosing the FIRST hazard occurrence, so the
    dropped prefix provably contains nothing a doc-level find() could
    have matched;
  * a prefix holding an unterminated <script>/<style>/<!-- region is
    declined — the marker text might be inside it, and slicing mid-raw-
    text would change the parse;
  * the kept region is simulated as a tag stream under the tree
    builders' shared close rule (innermost match, no implicit closes):
    the ONE construct whose meaning can depend on the dropped prefix is
    a close tag that matches none of the kept region's own open
    elements while at least one is still open — in the full parse it
    may bind to a prefix element and implicitly close kept elements, in
    the sliced parse it is stray and ignored (found by the
    never-diverges fuzz: '<p>' dropped with the prefix, its '</p>'
    landing between kept opens). Such a close — or any construct the
    strict tokenizer can't span exactly — declines the slice. Stray
    closes while the kept stack is EMPTY stay harmless: they can only
    pop prefix elements, never change containment among kept nodes.
  * anything else returns None → caller takes the full parse, output
    unchanged by construction.

On the synthetic bench corpus, term pages carry no chrome (the first
marker sits at byte ~12), so this is measured-neutral there; the bench
win for term parsing comes from the fast scanner (kgpipe/htmldom.py).
The slicer is for the real-page shape, where header chrome precedes the
content blocks.
"""

from __future__ import annotations

import re
from typing import Optional

from kgpipe.htmldom import (
    VOID_ELEMENTS,
    _ATTR_RE,
    _COMMENT_CLOSE,
    _ENDTAG_NAME_RE,
    _ENDTAGFIND,
    _RAW_END,
    _SIMPLE_TAG_RE,
    _STARTTAG_NAME_RE,
)


def _start_tag_span(s: str, lt: int):
    """Span-only replica of the tree builders' tolerant start-tag parse
    (htmldom._scan_starttag / html.parser parse_starttag): returns
    (tag, end_pos, self_closing), or None when the builders would hit
    their error/decline path (span not provable → caller declines)."""
    m = _STARTTAG_NAME_RE.match(s, lt + 1)
    if m is None:
        return None
    tag = m.group().lower()
    pos = m.end()
    n = len(s)
    while True:
        while pos < n and s[pos] in " \t\n\r\f":
            pos += 1
        if pos >= n:
            return None  # unterminated tag at EOF
        c = s[pos]
        if c == ">":
            return tag, pos + 1, False
        if c == "/":
            if s.startswith("/>", pos):
                return tag, pos + 2, True
            pos += 1  # stray '/' between attrs: skipped
            continue
        am = _ATTR_RE.match(s, pos)
        if am is None or am.end() == pos:
            return None  # html.parser error path: tag-as-data
        pos = am.end()

#: class-attribute hazards (HTML class matching is case-sensitive, so
#: plain substring search is exact); "ci-title" also covers the cidian
#: dialect's ci-title-wrap
_CLASS_HAZARDS = ("ci-title", "ci-attrs", "ci-content", "ci-fanyi", "ci-tag")
#: text hazard: the cidian definition heading looked up doc-level by
#: string match (extract_ciyu.py:124)
_TEXT_HAZARDS = ("网络解释",)
#: tag-name hazard, case-insensitive like the tokenizer's tag names
_H1_RE = re.compile(r"<h1", re.IGNORECASE)

_SCRIPT_OPEN = re.compile(r"<script", re.IGNORECASE)
_SCRIPT_CLOSE = re.compile(r"</script", re.IGNORECASE)
_STYLE_OPEN = re.compile(r"<style", re.IGNORECASE)
_STYLE_CLOSE = re.compile(r"</style", re.IGNORECASE)


def _tag_stream_safe(
    kept: str, interior: bool = False, require_drain: bool = False
) -> bool:
    """Tag-stream simulation of a candidate slice region under the tree
    builders' shared semantics (htmldom: innermost-match close, no
    implicit closes, raw-text script/style, html.parser comment/PI/bogus
    spans).

    Returns False — decline the slice — when a close tag matches none of
    the region's own open elements while at least one is still open: in
    the FULL parse that close may bind to an element of a dropped
    region and implicitly close the kept elements above it, while in
    the SLICED parse it is stray and ignored — the one
    tokenization-independent way dropped input can change containment
    among kept nodes. Also False for any construct whose exact span the
    strict tokenizer can't guarantee (tolerant start tags, marked
    sections, raw-text lookalike closes) — conservative, the caller
    just takes the full parse.

    With ``interior=False`` (a suffix slice: everything after the
    region was already part of it) an unterminated comment / PI / raw
    text / declaration at EOF STOPS the scan as safe — both parses
    treat the identical suffix as the same single non-element region.

    With ``interior=True`` the region is an interior block of a
    marker-split page (hanzi card slicing): every construct span must
    terminate INSIDE the region, so region boundaries always fall in
    data mode. ``require_drain=True`` additionally demands the
    open-element stack drain to empty by region end — required for
    KEPT blocks, whose residue elements extractors could read through
    (a residue's get_text() would include following blocks' text in
    the full parse but not the sliced one). DROPPED blocks may leave
    residues: their unclosed opens only deepen where later blocks
    attach, which no kept-node containment or kept-subtree text ever
    observes, given every block obeys the stray-close rule (closes
    hitting an EMPTY region stack can only pop always-dropped prefix
    or dropped-residue elements, never reach into another region).
    """
    stack: list[str] = []
    pos, n = 0, len(kept)
    while pos < n:
        lt = kept.find("<", pos)
        if lt < 0:
            break
        nxt = kept[lt + 1 : lt + 2]
        if nxt and (("a" <= nxt <= "z") or ("A" <= nxt <= "Z")):
            m = _SIMPLE_TAG_RE.match(kept, lt + 1)
            if m is not None:
                tag = m.group(1).lower()
                pos = m.end()
                self_closing = bool(m.group(3))
            else:
                span = _start_tag_span(kept, lt)
                if span is None:
                    return False  # builders' error path: span not provable
                tag, pos, self_closing = span
            if not self_closing and tag not in VOID_ELEMENTS:
                if tag in _RAW_END:
                    em = _RAW_END[tag].search(kept, pos)
                    if em is None:
                        # suffix mode: raw text to EOF in both parses;
                        # interior: the span crosses the region end
                        return not interior
                    gm = _ENDTAGFIND.match(kept, em.start())
                    if gm is None or gm.group(1).lower() != tag:
                        return False  # lookalike close: stdlib chunking
                    pos = gm.end()  # raw element opened+closed: no net push
                else:
                    stack.append(tag)
        elif nxt == "/":
            gm = _ENDTAGFIND.match(kept, lt)
            if gm is not None:
                name = gm.group(1).lower()
                pos = gm.end()
            else:
                em = _ENDTAG_NAME_RE.match(kept, lt + 2)
                if em is None:
                    if kept.startswith("</>", lt):
                        pos = lt + 3  # ignored, html.parser parity
                        continue
                    gt = kept.find(">", lt)  # bogus comment: dropped
                    if gt < 0:
                        return not interior  # incomplete at EOF
                    pos = gt + 1
                    continue
                if em.end() >= n or kept[em.end()] not in " \t\n\r\f/>":
                    return False  # name-charset divergence vs stdlib
                gt = kept.find(">", em.end())
                if gt < 0:
                    return False
                name = em.group().lower()
                pos = gt + 1
            if name in stack:
                # innermost (topmost) matching open: pop through it
                idx = len(stack) - 1 - stack[::-1].index(name)
                del stack[idx:]
            elif stack:
                return False  # may bind to a dropped-prefix element
        elif nxt == "!":
            if kept.startswith("<!--", lt):
                cm = _COMMENT_CLOSE.search(kept, lt + 4)
                if cm is None:
                    # suffix mode: comment to EOF in both parses;
                    # interior: the span crosses the region end
                    return not interior
                pos = cm.end()
            elif kept.startswith("<![", lt):
                return False  # marked section: span rules differ
            else:
                gt = kept.find(">", lt)  # declaration/bogus: dropped
                if gt < 0:
                    return not interior  # incomplete at EOF
                pos = gt + 1
        elif nxt == "?":
            gt = kept.find(">", lt)  # processing instruction: dropped
            if gt < 0:
                return not interior  # incomplete at EOF
            pos = gt + 1
        else:
            pos = lt + 1  # literal '<' text: no construct
    # kept blocks must drain: a residue element still open at region end
    # would absorb following regions' content in the full parse only
    return not (require_drain and stack)


def block_self_contained(block: str, require_drain: bool = True) -> bool:
    """True iff ``block`` is safe as an interior slice region under the
    tree builders' semantics: every construct span terminates inside it
    and no close can reach another region. ``require_drain=True`` (kept
    blocks) additionally requires its open-element stack to drain to
    empty by block end (see _tag_stream_safe for the full argument)."""
    return _tag_stream_safe(block, interior=True, require_drain=require_drain)


def raw_prefix_terminated(prefix: str) -> bool:
    """True iff a to-be-dropped page prefix ends in data mode: no
    unterminated <script>/<style>/<!-- region runs past its end (a slice
    marker found after such a prefix would sit inside raw text or a
    comment, where it is not markup)."""
    if len(_SCRIPT_OPEN.findall(prefix)) != len(_SCRIPT_CLOSE.findall(prefix)):
        return False
    if len(_STYLE_OPEN.findall(prefix)) != len(_STYLE_CLOSE.findall(prefix)):
        return False
    return prefix.count("<!--") == prefix.count("-->")


def prefix_slice(html: str) -> Optional[str]:
    """Drop the pre-content chrome of a term page, or return None when
    the page is not provably sliceable (caller falls back to the full
    parse — output unchanged either way)."""
    idx = -1
    for h in _CLASS_HAZARDS + _TEXT_HAZARDS:
        i = html.find(h)
        if i >= 0 and (idx < 0 or i < idx):
            idx = i
    m = _H1_RE.search(html, 0, idx if idx >= 0 else len(html))
    if m is not None:
        idx = m.start()
    if idx <= 0:
        return None
    start = html.rfind("<", 0, idx)
    if start <= 0:
        return None  # marker in leading text / at page start: nothing to drop
    prefix = html[:start]
    # marker inside an unterminated raw-text or comment region → decline
    if not raw_prefix_terminated(prefix):
        return None
    kept = html[start:]
    if not _tag_stream_safe(kept):
        return None
    return kept
