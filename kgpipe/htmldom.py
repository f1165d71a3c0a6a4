"""Minimal HTML mini-DOM used inside the Arrow-batched parse UDFs.

The reference pipeline parses pages with BeautifulSoup(html, 'html.parser')
(e.g. /root/reference/chengyu/extract_chengyu.py:72). bs4 is not available
here, so this module implements — from scratch, on the stdlib
``html.parser`` tokenizer — the small subset of DOM operations the
reference's extraction semantics depend on, with matching behavior:

  * ``find`` / ``find_all`` with tag name, ``class_``, ``attrs`` and
    ``string=`` filters (class_ with a space matches the raw class string
    exactly, like bs4; otherwise class-list membership),
  * ``get_text(separator, strip)`` with bs4 semantics (strip=True strips
    each text fragment and drops empties before joining),
  * ``decompose``, ``find_next_sibling``, ``find_parent``,
    ``previous_sibling`` (text nodes preserved as siblings),
  * a tiny ``select`` supporting descendant chains of ``tag.class`` parts
    (the reference only ever uses ``"span.ci-list a"`` —
    /root/reference/ciyu/extract_ciyu.py:69).

Entities are converted during tokenization (html.parser default), matching
bs4's html.parser tree builder. Void elements never take children.

This is driver/executor-side plain Python, but it only ever runs inside
Arrow-batched pandas UDFs (one call per document, thousands of documents
per batch) — never row-at-a-time through Spark's serializers.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Callable, Iterator, Optional, Union

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class TextNode:
    __slots__ = ("text", "parent")

    #: bs4 NavigableStrings have no ``.name``; reference code guards with
    #: ``hasattr(node, 'name')`` so we expose name=None explicitly.
    name = None

    def __init__(self, text: str, parent: Optional["Element"] = None):
        self.text = text
        self.parent = parent

    def __repr__(self) -> str:  # pragma: no cover
        return f"TextNode({self.text!r})"


class Element:
    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict, parent: Optional["Element"] = None):
        self.name = name
        self.attrs = attrs
        self.children: list[Union[Element, TextNode]] = []
        self.parent = parent

    # -- attributes -----------------------------------------------------
    def get(self, key: str, default=None):
        if key == "class":
            raw = self.attrs.get("class")
            if raw is None:
                return default
            return raw.split()
        return self.attrs.get(key, default)

    @property
    def classes(self) -> list[str]:
        return self.get("class", [])

    # -- traversal ------------------------------------------------------
    def iter_descendants(self) -> Iterator[Union["Element", TextNode]]:
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if isinstance(node, Element):
                stack.extend(reversed(node.children))

    def iter_elements(self, recursive: bool = True) -> Iterator["Element"]:
        if recursive:
            for node in self.iter_descendants():
                if isinstance(node, Element):
                    yield node
        else:
            for node in self.children:
                if isinstance(node, Element):
                    yield node

    @property
    def previous_sibling(self) -> Optional[Union["Element", TextNode]]:
        if self.parent is None:
            return None
        sibs = self.parent.children
        idx = next(i for i, n in enumerate(sibs) if n is self)
        return sibs[idx - 1] if idx > 0 else None

    def find_next_sibling(self, name: Optional[str] = None) -> Optional["Element"]:
        if self.parent is None:
            return None
        sibs = self.parent.children
        idx = next(i for i, n in enumerate(sibs) if n is self)
        for node in sibs[idx + 1 :]:
            if isinstance(node, Element) and (name is None or node.name == name):
                return node
        return None

    def find_parent(
        self, name: Optional[str] = None, class_: Optional[str] = None
    ) -> Optional["Element"]:
        node = self.parent
        while node is not None:
            if (name is None or node.name == name) and (
                class_ is None or _class_matches(node, class_)
            ):
                return node
            node = node.parent
        return None

    # -- text -----------------------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        # iterative DFS without generator frames (hot path)
        parts: list[str] = []
        stack = self.children[::-1]
        pop = stack.pop
        while stack:
            node = pop()
            if node.__class__ is TextNode:
                if strip:
                    s = node.text.strip()
                    if s:
                        parts.append(s)
                else:
                    parts.append(node.text)
            else:
                stack.extend(node.children[::-1])
        return separator.join(parts)

    @property
    def string(self) -> Optional[str]:
        """bs4 .string: the single text child, recursing through single-child tags."""
        node: Element = self
        while True:
            kids = node.children
            if len(kids) != 1:
                return None
            only = kids[0]
            if isinstance(only, TextNode):
                return only.text
            node = only

    # -- mutation -------------------------------------------------------
    def decompose(self) -> None:
        if self.parent is not None:
            self.parent.children = [n for n in self.parent.children if n is not self]
            self.parent = None

    # -- search ---------------------------------------------------------
    def find(
        self,
        name: Optional[Union[str, list]] = None,
        attrs: Optional[dict] = None,
        class_: Optional[str] = None,
        string: Optional[Union[str, Callable]] = None,
        recursive: bool = True,
    ) -> Optional["Element"]:
        for el in self._search(name, attrs, class_, string, recursive):
            return el
        return None

    def find_all(
        self,
        name: Optional[Union[str, list]] = None,
        attrs: Optional[dict] = None,
        class_: Optional[str] = None,
        string: Optional[Union[str, Callable]] = None,
        recursive: bool = True,
    ) -> list["Element"]:
        return list(self._search(name, attrs, class_, string, recursive))

    def _search(self, name, attrs, class_, string, recursive) -> Iterator["Element"]:
        names = None
        if name is not None:
            names = {name} if isinstance(name, str) else set(name)
        # Document-root searches are served from the build-time indexes
        # (creation order == preorder for html.parser trees, so results
        # and their order are identical to the DFS — property-asserted
        # in test_fuzz_parsers). Subtree searches stay DFS: they'd need
        # a containment walk per candidate and subtrees are small.
        if (
            recursive
            and self.parent is None
            and self.__class__ is Document
            and self.class_index is not None
        ):
            if class_ is not None:
                cands = self.class_index.get(class_.split()[0], ())
            elif names is not None and len(names) == 1:
                cands = self.tag_index.get(next(iter(names)), ())
            else:
                cands = None  # name-list / unfiltered: DFS below
            if cands is not None:
                for el in cands:
                    # decompose() detaches nodes but never edits the
                    # index — drop candidates no longer under the root
                    p = el.parent
                    while p is not None and p is not self:
                        p = p.parent
                    if p is None:
                        continue
                    if names is not None and el.name not in names:
                        continue
                    if class_ is not None and not _class_matches(el, class_):
                        continue
                    if attrs:
                        if any(el.attrs.get(k) != v for k, v in attrs.items()):
                            continue
                    if string is not None:
                        s = el.string
                        if callable(string):
                            if not string(s):
                                continue
                        elif s != string:
                            continue
                    yield el
                return
        # iterative preorder DFS without nested generator frames (hot path)
        stack = [c for c in self.children[::-1] if c.__class__ is Element]
        pop = stack.pop
        while stack:
            el = pop()
            if recursive:
                stack.extend(
                    c for c in el.children[::-1] if c.__class__ is Element
                )
            if names is not None and el.name not in names:
                continue
            if class_ is not None and not _class_matches(el, class_):
                continue
            if attrs:
                if any(el.attrs.get(k) != v for k, v in attrs.items()):
                    continue
            if string is not None:
                s = el.string
                if callable(string):
                    if not string(s):
                        continue
                elif s != string:
                    continue
            yield el

    def select(self, selector: str) -> list["Element"]:
        """Descendant-combinator chains of ``tag`` / ``tag.class`` / ``.class``."""
        parts = selector.split()
        current: list[Element] = [self]
        for part in parts:
            tag, _, cls = part.partition(".")
            nxt: list[Element] = []
            seen: set[int] = set()
            for base in current:
                for el in base.iter_elements(recursive=True):
                    if tag and el.name != tag:
                        continue
                    if cls and cls not in el.classes:
                        continue
                    if id(el) not in seen:
                        seen.add(id(el))
                        nxt.append(el)
            current = nxt
        return current


class Document(Element):
    """The document root. Carries find-indexes built during parsing:
    ``tag_index[name]`` / ``class_index[token]`` list elements in
    creation order (== document preorder), so root-level ``find`` /
    ``find_all`` — the term/hanzi parsers' dominant access pattern, 5-6
    full-tree scans per page — become candidate-list filters instead of
    whole-document DFS walks. ``decompose`` never edits the indexes;
    lookups re-verify attachment by walking parents back to the root."""

    __slots__ = ("tag_index", "class_index")

    def __init__(self) -> None:
        super().__init__("[document]", {})
        self.tag_index: Optional[dict] = None
        self.class_index: Optional[dict] = None


def _index_element(el: Element, tag_index: dict, class_index: dict) -> None:
    lst = tag_index.get(el.name)
    if lst is None:
        tag_index[el.name] = [el]
    else:
        lst.append(el)
    cls = el.attrs.get("class")
    if cls:
        for c in cls.split():
            clst = class_index.get(c)
            if clst is None:
                class_index[c] = [el]
            else:
                clst.append(el)


def _class_matches(el: Element, class_: str) -> bool:
    # bs4: a multi-class query string matches the raw attribute value
    # exactly; a single class matches by membership in the class list.
    if " " in class_:
        return el.attrs.get("class") == class_
    return class_ in el.classes


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self.root.tag_index = {}
        self.root.class_index = {}
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(el)
        _index_element(el, self.root.tag_index, self.root.class_index)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(el)
        _index_element(el, self.root.tag_index, self.root.class_index)

    def handle_endtag(self, tag):
        # close the innermost matching open tag (html.parser tolerance)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(TextNode(data, self.stack[-1]))


def parse_html_stdlib(html: str) -> Element:
    """The original stdlib-``html.parser`` tree build — kept as the
    EQUIVALENCE ORACLE for the fast scanner below (hypothesis fuzz +
    golden-page tests assert tree equality), and as the conservative
    fallback ``parse_html`` takes when the scanner declines a page."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# ---------------------------------------------------------------------------
# fast single-pass scanner
# ---------------------------------------------------------------------------
# The stdlib HTMLParser.feed is ~64% of a term-page parse (round-6
# profile: 573 us/page, of which 4.2/6.6 s per 3k pages is goahead/
# parse_starttag — incremental-feed buffering, updatepos bookkeeping and
# per-tag method dispatch we don't need for a complete in-memory page).
# This scanner produces the IDENTICAL tree for the constructs html.parser
# handles (start/end/self-closing tags, void elements, entity conversion
# outside script/style, comments/declarations/PIs dropped, bogus-'<' as
# text, tolerant end tags, script/style raw-text mode), reusing the
# stdlib's own tolerant attribute regex so attribute semantics can't
# drift. Constructs it does NOT implement (marked sections '<![',
# unterminated comments/tags at EOF) make it RAISE _FastParseDecline,
# and parse_html falls back to the stdlib builder — behavior-preserving
# by construction, fast on the 99.9% well-formed path.

import re as _re

from html import unescape as _unescape
from html.parser import (  # type: ignore[attr-defined]  # tolerant regexes
    attrfind_tolerant as _ATTR_RE,
    commentclose as _COMMENT_CLOSE,
    endtagfind as _ENDTAGFIND,
)

#: strict subset of tagfind_tolerant's name charset — a tag whose stdlib
#: name would extend beyond this (e.g. '<a@b>') fails the subsequent
#: attribute lookbehind and DECLINES to the stdlib path, never diverges
_STARTTAG_NAME_RE = _re.compile(r"[a-zA-Z][-.a-zA-Z0-9:_]*")
_ENDTAG_NAME_RE = _STARTTAG_NAME_RE
_RAW_END = {
    t: _re.compile(r"</\s*%s" % t, _re.IGNORECASE) for t in ("script", "style")
}

#: whole-tag fast path: ONE C-level match for the overwhelmingly common
#: well-formed start tag (space-separated attrs, balanced quotes or a
#: plain unquoted token). Anything it can't swallow in full — stray '=',
#: missing inter-attr space, exotic name/value chars — fails the WHOLE
#: anchored match and drops to the per-attr tolerant loop, so this path
#: never changes semantics, only skips python-loop overhead.
_SIMPLE_ATTR = (
    r"\s+[a-zA-Z_:][-.a-zA-Z0-9:_]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s\"'=<>`]+))?"
)
_SIMPLE_TAG_RE = _re.compile(
    r"([a-zA-Z][-.a-zA-Z0-9:_]*)((?:%s)*)\s*(/?)>" % _SIMPLE_ATTR
)
_SIMPLE_ATTR_RE = _re.compile(
    r"([a-zA-Z_:][-.a-zA-Z0-9:_]*)"
    r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'=<>`]+))?"
)


class _FastParseDecline(Exception):
    """Construct outside the fast path — caller falls back to stdlib."""


def _scan_starttag(html: str, lt: int, stack: list) -> int:
    """Parse a start (or self-closing) tag at ``lt``; returns the scan
    position after '>'. Mirrors HTMLParser.parse_starttag semantics."""
    m = _STARTTAG_NAME_RE.match(html, lt + 1)
    tag = m.group().lower()
    pos = m.end()
    attrs: dict = {}
    n = len(html)
    while True:
        # skip whitespace between attributes
        while pos < n and html[pos] in " \t\n\r\f":
            pos += 1
        if pos >= n:
            raise _FastParseDecline  # unterminated tag at EOF
        c = html[pos]
        if c == ">":
            pos += 1
            self_closing = False
            break
        if c == "/":
            if html.startswith("/>", pos):
                pos += 2
                self_closing = True
                break
            pos += 1  # stray '/' between attrs: html.parser skips it
            continue
        am = _ATTR_RE.match(html, pos)
        if am is None or am.end() == pos:
            # html.parser's error path treats the tag up to '>' as data
            raise _FastParseDecline
        name, _eq, value = am.group(1, 2, 3)
        if value is None:
            value = ""
        elif value[:1] in ("'", '"') and value[:1] == value[-1:]:
            value = value[1:-1]
        if "&" in value:
            value = _unescape(value)
        # last duplicate wins — matches the tree builder's dict-comp
        # over html.parser's attrs list
        attrs[name.lower()] = value
        pos = am.end()
    parent = stack[-1]
    el = Element(tag, attrs, parent)
    parent.children.append(el)
    root = stack[0]
    _index_element(el, root.tag_index, root.class_index)
    if not self_closing and tag not in VOID_ELEMENTS:
        stack.append(el)
        if tag in ("script", "style"):
            return -pos  # signal: enter raw-text mode (cdata)
    return pos


def _close_tag(stack: list, tag: str) -> None:
    for i in range(len(stack) - 1, 0, -1):
        if stack[i].name == tag:
            del stack[i:]
            return


def _consume_raw(html: str, pos: int, stack: list) -> int:
    """Raw-text content model (script/style): text runs to the STRICT
    matching end tag. stdlib emits look-alike end tags ('</scriptX>',
    '</script foo>') as separate data chunks with their own TextNode
    granularity — that case declines to the stdlib path."""
    tag = stack[-1].name
    em = _RAW_END[tag].search(html, pos)
    if em is None:
        raise _FastParseDecline  # unterminated raw text
    gm = _ENDTAGFIND.match(html, em.start())
    if gm is None or gm.group(1).lower() != tag:
        raise _FastParseDecline
    if em.start() > pos:  # raw data: NOT unescaped
        stack[-1].children.append(TextNode(html[pos : em.start()], stack[-1]))
    _close_tag(stack, tag)
    return gm.end()


def _fast_parse(html: str) -> Element:
    root = Document()
    tag_index: dict = {}
    class_index: dict = {}
    root.tag_index = tag_index
    root.class_index = class_index
    stack = [root]
    pos, n = 0, len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            text = html[pos:]
            if "&" in text:
                text = _unescape(text)
            stack[-1].children.append(TextNode(text, stack[-1]))
            break
        if lt > pos:
            text = html[pos:lt]
            if "&" in text:
                text = _unescape(text)
            stack[-1].children.append(TextNode(text, stack[-1]))
        nxt = html[lt + 1 : lt + 2]
        if nxt and (("a" <= nxt <= "z") or ("A" <= nxt <= "Z")):
            m = _SIMPLE_TAG_RE.match(html, lt + 1)
            if m is not None:
                tag = m.group(1).lower()
                attrs: dict = {}
                blob = m.group(2)
                if blob:
                    for am in _SIMPLE_ATTR_RE.finditer(blob):
                        v = am.group(2)
                        if v is None:
                            v = ""
                        elif v[0] in "\"'":
                            v = v[1:-1]
                        if "&" in v:
                            v = _unescape(v)
                        attrs[am.group(1).lower()] = v
                parent = stack[-1]
                el = Element(tag, attrs, parent)
                parent.children.append(el)
                lst = tag_index.get(tag)
                if lst is None:
                    tag_index[tag] = [el]
                else:
                    lst.append(el)
                cls = attrs.get("class")
                if cls:
                    for c in cls.split():
                        clst = class_index.get(c)
                        if clst is None:
                            class_index[c] = [el]
                        else:
                            clst.append(el)
                pos = m.end()
                raw = False
                if not m.group(3) and tag not in VOID_ELEMENTS:
                    stack.append(el)
                    raw = tag in _RAW_END
            else:
                pos = _scan_starttag(html, lt, stack)
                raw = pos < 0
                if raw:
                    pos = -pos
            if raw:  # raw-text element (script/style)
                pos = _consume_raw(html, pos, stack)
        elif nxt == "/":
            gm = _ENDTAGFIND.match(html, lt)  # strict '</ name >' form
            if gm is not None:
                _close_tag(stack, gm.group(1).lower())
                pos = gm.end()
            else:
                em = _ENDTAG_NAME_RE.match(html, lt + 2)
                if em is None:
                    if html.startswith("</>", lt):
                        pos = lt + 3  # ignored, html.parser parity
                    else:
                        gt = html.find(">", lt)  # bogus comment: dropped
                        if gt < 0:
                            raise _FastParseDecline
                        pos = gt + 1
                else:
                    # tolerant path: junk between name and '>' discarded
                    gt = html.find(">", em.end())
                    if gt < 0 or html[em.end()] not in " \t\n\r\f/>":
                        raise _FastParseDecline  # name-charset divergence
                    _close_tag(stack, em.group().lower())
                    pos = gt + 1
        elif nxt == "!":
            if html.startswith("<!--", lt):
                cm = _COMMENT_CLOSE.search(html, lt + 4)
                if cm is None:
                    raise _FastParseDecline  # unterminated comment
                pos = cm.end()
            elif html.startswith("<![", lt):
                raise _FastParseDecline  # marked section: stdlib path
            else:
                gt = html.find(">", lt)  # declaration/bogus: dropped
                if gt < 0:
                    raise _FastParseDecline
                pos = gt + 1
        elif nxt == "?":
            gt = html.find(">", lt)  # processing instruction: dropped
            if gt < 0:
                raise _FastParseDecline
            pos = gt + 1
        else:
            # '<' not opening a construct: literal text (html.parser parity)
            stack[-1].children.append(TextNode("<", stack[-1]))
            pos = lt + 1
    return root


def parse_html(html: str) -> Element:
    """Parse an HTML string into a mini-DOM; returns the document root.

    Fast single-pass scanner with automatic stdlib fallback — output is
    identical to ``parse_html_stdlib`` (fuzz- and golden-asserted)."""
    try:
        return _fast_parse(html)
    except _FastParseDecline:
        return parse_html_stdlib(html)
