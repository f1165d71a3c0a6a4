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
        parts: list[str] = []
        for node in self.iter_descendants():
            if isinstance(node, TextNode):
                if strip:
                    s = node.text.strip()
                    if s:
                        parts.append(s)
                else:
                    parts.append(node.text)
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
        for el in self.iter_elements(recursive=recursive):
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


def _class_matches(el: Element, class_: str) -> bool:
    # bs4: a multi-class query string matches the raw attribute value
    # exactly; a single class matches by membership in the class list.
    if " " in class_:
        return el.attrs.get("class") == class_
    return class_ in el.classes


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        # close the innermost matching open tag (html.parser tolerance)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(TextNode(data, self.stack[-1]))


def parse_html(html: str) -> Element:
    """Parse an HTML string into a mini-DOM; returns the document root."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
