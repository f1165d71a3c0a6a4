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
