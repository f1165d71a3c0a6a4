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
  * stray </div> closes left by dropping a structurally unbalanced
    prefix are harmless under html.parser's innermost-match close rule:
    every kept element self-balances before a wrapper close appears, so
    the relative containment of kept nodes — all any find() sees — is
    preserved (never-diverges fuzz in test_fuzz_parsers);
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
    if len(_SCRIPT_OPEN.findall(prefix)) != len(_SCRIPT_CLOSE.findall(prefix)):
        return None
    if len(_STYLE_OPEN.findall(prefix)) != len(_STYLE_CLOSE.findall(prefix)):
        return None
    if prefix.count("<!--") != prefix.count("-->"):
        return None
    return html[start:]
