# -*- coding: utf-8 -*-
"""Mini-DOM semantics the parsers depend on (bs4-compatible subset)."""

from kgpipe.htmldom import parse_html


def test_find_by_class_and_attrs():
    doc = parse_html('<div class="a b"><p data-id="x">hi</p></div>')
    assert doc.find("div", class_="a") is not None
    assert doc.find("div", class_="b") is not None
    assert doc.find("div", class_="a b") is not None  # exact multi-class
    assert doc.find("div", class_="b a") is None
    assert doc.find("p", attrs={"data-id": "x"}).get_text() == "hi"
    assert doc.find("p", attrs={"data-id": "y"}) is None


def test_get_text_semantics():
    doc = parse_html("<p>  a <b> b </b> c  </p>")
    p = doc.find("p")
    assert p.get_text() == "  a  b  c  "
    assert p.get_text(strip=True) == "abc"
    assert p.get_text(" ", strip=True) == "a b c"


def test_string_filter_and_next_sibling():
    doc = parse_html("<p><label>拼音</label><span>wáng</span><span>x</span></p>")
    label = doc.find("label", string="拼音")
    assert label is not None
    assert label.find_next_sibling("span").get_text() == "wáng"
    assert doc.find("label", string="注音") is None


def test_string_lambda_filter():
    doc = parse_html("<h4>详细解释</h4><h4><b>nested</b></h4>")
    hits = doc.find_all("h4", string=lambda t: t and "详细" in t)
    assert len(hits) == 1


def test_decompose():
    doc = parse_html('<li><label>英语</label> king, ruler</li>')
    li = doc.find("li")
    li.find("label").decompose()
    assert li.get_text().strip() == "king, ruler"


def test_select_descendant_chain():
    doc = parse_html(
        '<p><span class="ci-list"><a>近1</a><a>近2</a></span><a>outside</a></p>'
    )
    texts = [a.get_text() for a in doc.find("p").select("span.ci-list a")]
    assert texts == ["近1", "近2"]


def test_void_elements_and_entities():
    doc = parse_html("<p><img src=x>a &amp; b<br>c</p>")
    assert doc.find("p").get_text() == "a & b" + "c"


def test_find_parent_and_previous_sibling():
    doc = parse_html('<div class="wrap"><p class="x">1</p>text<p class="y">2</p></div>')
    y = doc.find("p", class_="y")
    assert y.find_parent("div", class_="wrap") is not None
    prev = y.previous_sibling
    assert prev.name is None and prev.text == "text"


def test_recursive_false():
    doc = parse_html("<div><p>top</p><section><p>deep</p></section></div>")
    div = doc.find("div")
    assert len(div.find_all("p")) == 2
    assert len(div.find_all("p", recursive=False)) == 1


# ---------------------------------------------------------------------------
# fast scanner vs stdlib builder: the fast path must be tree-identical
# wherever it does not decline (round 6)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from kgpipe.htmldom import (
    Element,
    TextNode,
    _fast_parse,
    _FastParseDecline,
    parse_html_stdlib,
)


def _tree(node):
    if isinstance(node, TextNode):
        return ("#t", node.text)
    return (
        node.name,
        tuple(sorted(node.attrs.items())),
        tuple(_tree(c) for c in node.children),
    )


def _assert_fast_equiv(html):
    try:
        fast = _fast_parse(html)
    except _FastParseDecline:
        return  # conservative fallback: parse_html uses stdlib, trivially equal
    assert _tree(fast) == _tree(parse_html_stdlib(html)), repr(html)


_NAMES = st.sampled_from(["div", "p", "span", "a", "h1", "li", "br", "img", "ol"])
_ATTRS = st.sampled_from(
    ["", ' class="a b"', " href=/x/y", ' data-id="基本信息"', " checked",
     ' title=\'it&#39;s\'', ' alt=商 金文 class="lazy"', "  a = 1  b ",
     ' x="1"y="2"', " b=c=d", " b/ c"]
)
_TEXTS = st.sampled_from(
    ["", "plain", "a &amp; b", "1 < 2", "<3 hearts", "拼音：wáng", "&#x4e2d;&unknown;", "&"]
)


@st.composite
def _html_soup(draw):
    out = []
    for _ in range(draw(st.integers(0, 12))):
        kind = draw(st.integers(0, 6))
        if kind == 0:
            out.append(draw(_TEXTS))
        elif kind == 1:
            out.append(f"<{draw(_NAMES)}{draw(_ATTRS)}>")
        elif kind == 2:
            out.append(f"</{draw(_NAMES)}>")
        elif kind == 3:
            out.append(f"<{draw(_NAMES)}{draw(_ATTRS)}/>")
        elif kind == 4:
            out.append(f"<!-- {draw(_TEXTS)} -->")
        elif kind == 5:
            out.append(f"<script>var a = \"{draw(_TEXTS)}\";</script>")
        else:
            out.append(draw(st.sampled_from(
                ["<!DOCTYPE html>", "<?pi x?>", "</ p>", "</p junk>", "</>",
                 "</3>", "<!bogus>"]
            )))
    return "".join(out)


@settings(max_examples=400, deadline=None)
@given(_html_soup())
def test_fast_parse_never_diverges_fuzz(html):
    """The fast scanner either declines (stdlib fallback) or produces a
    tree IDENTICAL to the stdlib builder — on generated tag soup
    including malformed constructs, entities, raw-text elements and
    tolerant end tags."""
    _assert_fast_equiv(html)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="<>/&=\"' abpdiv!-;#x123汉字", max_size=80))
def test_fast_parse_never_diverges_garbage(text):
    """Pure character soup — exercises every decline/error path."""
    _assert_fast_equiv(text)


def test_fast_parse_equiv_on_all_synthetic_pages():
    from kgpipe.corpus import generate_corpus

    c = generate_corpus(n_hanzi=30, n_words=40, n_idioms=30, seed=42)
    for r in c.rows:
        _assert_fast_equiv(r["content"])
        # every synthetic page must take the FAST path, not the fallback
        _fast_parse(r["content"])
