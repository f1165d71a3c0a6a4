# -*- coding: utf-8 -*-
"""Property tests: parsers must never raise on arbitrary input, and the
mini-DOM must uphold its structural invariants (SURVEY.md §5 item 6).

Pure-Python (no Spark session) — these cover the per-document UDF body.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from kgpipe.htmldom import Element, parse_html
from kgpipe.parse.chengyu import parse_chengyu_html
from kgpipe.parse.ciyu import parse_ciyu_html
from kgpipe.parse.hanzi import parse_evolution, parse_hanzi_html

# fragments that bias the fuzzer toward parser-relevant structure
_TOKENS = st.sampled_from(
    [
        "<div class='ci-title'>", "</div>", "<h1>", "</h1>", "<p>", "</p>",
        "<span>", "</span>", "<a href='/x'>", "</a>", "<label>", "</label>",
        "注音：ㄨㄤ", "近义词", "反义词", "感情", "出处：x", "<br>", "&amp;",
        "<div data-id=\"基本信息\">", "<div class=\"zi-title\">", "<h2>王</h2>",
        "<img src=x>", "text 文本", "<p class='explain'>", "<span class='no'>1.</span>",
        "<", ">", "'", '"', "=",
    ]
)
_SOUP = st.lists(_TOKENS, max_size=40).map("".join)


@settings(max_examples=200, deadline=None)
@given(_SOUP)
def test_parsers_never_raise(html):
    for fn in (parse_chengyu_html, parse_ciyu_html, parse_hanzi_html):
        out = fn(html, "p")
        assert isinstance(out, dict) and out.get("url") == "p"
    assert isinstance(parse_evolution(html), list)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_parsers_survive_arbitrary_text(text):
    out = parse_chengyu_html(text, None)
    assert isinstance(out, dict)
    out = parse_hanzi_html(text, "zidian/zi-1")
    assert out["unicode_decimal"] == 1


@settings(max_examples=150, deadline=None)
@given(_SOUP)
def test_dom_structural_invariants(html):
    doc = parse_html(html)
    seen = set()
    for node in doc.iter_descendants():
        assert id(node) not in seen, "cycle in DOM"
        seen.add(id(node))
        if isinstance(node, Element):
            assert node.parent is not None
            assert any(child is node for child in node.parent.children)
    # text round-trip never raises and is a plain string
    assert isinstance(doc.get_text(), str)


@settings(max_examples=150, deadline=None)
@given(
    _SOUP,
    st.sampled_from(["div", "p", "span", "a", "h1", "label", None]),
    st.sampled_from(["ci-title", "explain", "no", "explain primary", None]),
)
def test_root_index_find_matches_dfs(html, tag, cls):
    """Root-level searches served from the build-time tag/class indexes
    must return the IDENTICAL element sequence as the pure-DFS walk —
    including after decompose() detaches candidates (the index is never
    edited; lookups re-verify attachment)."""
    doc = parse_html(html)
    assert doc.class_index is not None  # both build paths populate it

    def both(d):
        via_index = d.find_all(tag, class_=cls)
        saved_t, saved_c = d.tag_index, d.class_index
        d.tag_index = d.class_index = None  # force the DFS path
        try:
            via_dfs = d.find_all(tag, class_=cls)
        finally:
            d.tag_index, d.class_index = saved_t, saved_c
        assert len(via_index) == len(via_dfs)
        for a, b in zip(via_index, via_dfs):
            assert a is b
        return via_index

    hits = both(doc)
    if hits:
        hits[0].decompose()
        both(doc)


@settings(max_examples=100, deadline=None)
@given(_SOUP, st.sampled_from(["div", "p", "span", "a"]))
def test_find_all_consistent_with_find(html, tag):
    doc = parse_html(html)
    all_hits = doc.find_all(tag)
    first = doc.find(tag)
    assert (first is None) == (len(all_hits) == 0)
    if all_hits:
        assert first is all_hits[0]


# card-soup generator: random card blocks (wanted and unwanted ids, some
# nested/truncated markup) — the slicer must either slice with IDENTICAL
# pruned output or fall back to the full parse, never diverge
_CARD_BITS = st.sampled_from(
    [
        '<div class="card" data-id="基本信息"><div class="zi-title"><h2>王</h2></div></div>',
        '<div class="card pb-3" data-id="翻译"><ol class="zi-fanyi"><li>英语: king</li></ol></div>',
        '<div class="card" data-id="意思"><p>x</p></div>',
        '<div class="card" data-id="概述">s</div>',
        '<div class="page-head">chrome</div>',
        '<div class="card" data-id="基本信息">',  # truncated card
        "loose text",
        "</div>",
        '<div data-id="翻译">alt-form</div>',
        # non-div scopes that can cross block boundaries — the close-
        # binding divergence channel the round-6 gate simulation guards
        "<p>",
        "</p>",
        '<span class="x">',
        "</span>",
        '<div class="card" data-id="基本信息"><h2></p>王</div>',
    ]
)
_CARD_SOUP = st.lists(_CARD_BITS, max_size=12).map("".join)


@settings(max_examples=200, deadline=None)
@given(_CARD_SOUP)
def test_slice_cards_never_diverges(html):
    """_slice_cards is an OPTIMIZATION: whenever it slices (non-None),
    the pruned parse over the slice must equal the pruned parse over the
    full page — for arbitrary card soups including truncated/nested
    markup."""
    from kgpipe.parse.hanzi import _slice_cards

    sections = ("basic_info", "fanyi_info")
    sliced = _slice_cards(html, sections)
    via_operator = parse_hanzi_html(html, "p", sections=sections)
    if sliced is None:
        return  # fell back — trivially identical
    import kgpipe.parse.hanzi as H

    orig = H._slice_cards
    H._slice_cards = lambda *a, **k: None  # force the full-parse path
    try:
        full = parse_hanzi_html(html, "p", sections=sections)
    finally:
        H._slice_cards = orig
    assert via_operator == full


def test_slice_cards_nested_card_regression():
    """Hypothesis counterexample, pinned: a 基本信息 card NESTING another
    card used to lose its close tags when the nested block was dropped,
    re-rooting a later card inside it. The div-balance gate must refuse
    to slice this page."""
    from kgpipe.parse.hanzi import _slice_cards, parse_hanzi_html

    html = (
        '<div class="card pb-3" data-id="翻译"><ol class="zi-fanyi">'
        "<li>英语: king</li></ol></div>"
        '<div class="card" data-id="基本信息">'
        '<div class="card" data-id="意思"><p>x</p></div></div>'
        '<div class="card" data-id="基本信息"><div class="zi-title">'
        "<h2>王</h2></div></div>"
    )
    assert _slice_cards(html, ("basic_info", "fanyi_info")) is None
    out = parse_hanzi_html(html, "p", sections=("basic_info", "fanyi_info"))
    # full-parse semantics: the FIRST 基本信息 card wins and has no title
    assert out["basic_info"] == {"error": "zi-title not found"}


def test_term_slice_prefix_close_binding_regression():
    """Hypothesis counterexample, pinned (round 6): a '<p>' dropped with
    the prefix whose '</p>' lands between kept opens — in the full parse
    the close implicitly pops the kept <div>/<h1>, in the sliced parse
    it is stray, so the h1 text diverged. The kept-region tag-stream
    simulation must decline."""
    from kgpipe.parse.slicing import prefix_slice

    html = "<p><div class='ci-title'><h1></p>注音：ㄨㄤ"
    assert prefix_slice(html) is None
    for fn in (parse_chengyu_html, parse_ciyu_html):
        assert fn(html, "p") == fn(html, "p", slice_input=False)


def test_slice_cards_cross_block_close_regression():
    """Same channel on the card slicer (round 6): the dropped page
    prefix leaves '<p>' open and the KEPT 基本信息 card carries the
    stray '</p>' — div counts balance, so the old div-only gate sliced
    and the h2 text diverged ('' full vs '王' sliced). The per-block
    simulation must decline."""
    from kgpipe.parse.hanzi import _slice_cards

    html = (
        "<p>chrome"
        '<div class="card" data-id="基本信息"><div class="zi-title">'
        "<h2></p>王</h2></div></div>"
        '<div class="card pb-3" data-id="翻译"><ol class="zi-fanyi">'
        "<li>英语: king</li></ol></div>"
    )
    sections = ("basic_info", "fanyi_info")
    assert _slice_cards(html, sections) is None
    out = parse_hanzi_html(html, "p", sections=sections)
    # full-parse semantics: '</p>' pops the h2 before 王 arrives
    assert out["basic_info"].get("data", {}).get("character") != "王"


def test_slice_cards_dropped_residue_still_slices():
    """The drain requirement applies to KEPT blocks only: a DROPPED
    card leaving an element open (residue) merely deepens where later
    blocks attach — invisible to kept-node containment — so the page
    must still slice, and the sliced parse must equal the full parse."""
    from kgpipe.parse.hanzi import _slice_cards

    html = (
        '<div class="card" data-id="概述"><p>summary</div>'  # p residue, dropped
        '<div class="card" data-id="基本信息"><div class="zi-title">'
        "<h2>王</h2></div></div>"
        '<div class="card pb-3" data-id="翻译"><ol class="zi-fanyi">'
        "<li>英语: king</li></ol></div>"
    )
    sections = ("basic_info", "fanyi_info")
    assert _slice_cards(html, sections) is not None
    import kgpipe.parse.hanzi as H

    via_operator = parse_hanzi_html(html, "p", sections=sections)
    orig = H._slice_cards
    H._slice_cards = lambda *a, **k: None
    try:
        full = parse_hanzi_html(html, "p", sections=sections)
    finally:
        H._slice_cards = orig
    assert via_operator == full
    assert via_operator["basic_info"]["data"]["character"] == "王"


# ---------------------------------------------------------------------------
# pure-expression properties of the round-5 corpus operators, checked on
# their Python-side building blocks (no Spark session needed here): the
# PII rule set itself must be well-formed and deterministic
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_pii_rules_are_total_and_idempotent(text):
    """The PII regex chain must (a) never raise on arbitrary text under
    BOTH regex engines it targets (Python re stands in for the Java∩RE2
    subset), (b) be idempotent — scrubbing already-scrubbed text changes
    nothing (placeholders contain no digits/@, so no rule re-fires)."""
    import re as _re

    from kgpipe.ops.textops import PII_RULES

    out = text
    for pat, repl in PII_RULES:
        out = _re.sub(pat, repl, out)
    again = out
    for pat, repl in PII_RULES:
        again = _re.sub(pat, repl, again)
    assert again == out


@settings(max_examples=200, deadline=None)
@given(
    st.integers(1000, 9999),
    st.integers(1, 12),
    st.integers(1, 28),
    st.integers(0, 23),
    st.integers(0, 59),
    st.integers(0, 16 ** 8 - 1),
)
def test_pii_phone_rules_spare_digit_bearing_non_phones(y, mo, d, h, mi, hx):
    """VERDICT r5: the tightened phone rules require a phone SHAPE, so
    years, space-separated date-times, ISBNs, 16-digit ids and
    hex-embedded digit runs all survive the scrub unchanged."""
    import re as _re

    from kgpipe.ops.textops import PII_RULES

    text = (
        f"in {y}, logged {y} {mo:02d} {d:02d} {h:02d} {mi:02d}, "
        f"isbn 978-0-306-40615-7, id 1234567890123456, "
        f"ref {hx:08x}deadbeef1234567"
    )
    out = text
    for pat, repl in PII_RULES:
        out = _re.sub(pat, repl, out)
    assert out == text


def test_pii_parenthesized_phone_and_precise_variant():
    """Round 7 (VERDICT r6 #6): the parenthesized NANP form redacts;
    parenthesized years/dates survive; the PRECISE rule set drops the
    bare digit-run rule so order ids / 8-digit dates survive while
    every separator-bearing phone form still redacts."""
    import re as _re

    from kgpipe.ops.textops import PII_RULES, PII_RULES_PRECISE

    def scrub(text, rules):
        for pat, repl in rules:
            text = _re.sub(pat, repl, text)
        return text

    assert scrub("call (555) 123-4567 now", PII_RULES) == "call <PHONE> now"
    assert scrub("call (555)123-4567 now", PII_RULES) == "call <PHONE> now"
    assert scrub("(2026) was the year 08 17", PII_RULES) == "(2026) was the year 08 17"
    # recall-biased default redacts the bare run; PRECISE spares it
    assert scrub("order 20260817 shipped", PII_RULES) == "order <PHONE> shipped"
    assert scrub("order 20260817 shipped", PII_RULES_PRECISE) == "order 20260817 shipped"
    for phone in ("+1 555 123 4567", "(555) 123-4567", "555-123-4567"):
        assert "<PHONE>" in scrub(f"at {phone}.", PII_RULES_PRECISE), phone


# ---------------------------------------------------------------------------
# round-6 term-page prefix slicing: sliced parse must NEVER diverge from
# the full parse, on synthetic pages, chrome-wrapped pages, and soup
# ---------------------------------------------------------------------------

_CHROME = st.sampled_from(
    [
        "",
        "<html><head><title>站点</title><script>var nav = '<div>';</script></head><body>",
        '<div id="page"><nav class="topbar"><ul><li><a href="/">首页</a></li></ul></nav>',
        '<header><div class="banner"><img src=/logo.png></div></header>'
        "<!-- ad slot --><aside>推广内容 123</aside>",
        # hazard chrome: contains an <h1> — the gate must DECLINE and
        # fall back to the full parse (results still equal by identity)
        "<header><h1>站点标题</h1></header>",
        '<div class="promo">关于 ci-title 的说明</div>',  # hazard substring in text
        "<script>if (a<b) document.write('<div class=\"ci-attrs\">');</script>",
        "<H1>UPPER</H1><div>x</div>",
        "<!-- <div class='ci-content'> commented out -->",
        # unclosed prefix elements whose close tags may land in the kept
        # region — the close-binding channel the round-6 gate simulation
        # declines (hypothesis-found: '<p>' + kept '</p>')
        "<p>",
        "<div><p>intro",
        "<ul><li>菜单",
    ]
)


@settings(max_examples=200, deadline=None)
@given(_CHROME, _SOUP)
def test_term_slice_never_diverges(chrome, soup):
    """prefix_slice either prunes losslessly or declines: for any chrome
    + page-soup combination, the sliced term parse equals the full
    parse for BOTH term families."""
    html = chrome + soup
    for fn in (parse_chengyu_html, parse_ciyu_html):
        assert fn(html, "p") == fn(html, "p", slice_input=False)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="<>/&=\"' cih1-титle网络解释divattrs!-", max_size=120))
def test_term_slice_never_diverges_garbage(text):
    for fn in (parse_chengyu_html, parse_ciyu_html):
        assert fn(text, "p") == fn(text, "p", slice_input=False)


def test_term_slice_on_synthetic_and_chromed_pages():
    """Every synthetic term page parses identically with slicing on/off;
    a chrome-wrapped page actually TAKES the slice path and still
    yields the identical record."""
    from kgpipe.corpus import generate_corpus, render_chengyu_page, render_ciyu_page
    from kgpipe.parse.slicing import prefix_slice

    c = generate_corpus(n_hanzi=30, n_words=40, n_idioms=30, seed=42)
    chrome = (
        "<html><head><title>汉语国学</title></head><body>"
        '<nav class="topbar"><a href="/">首页</a><a href="/about">关于</a></nav>'
        '<div class="ad">广告 108</div>'
    )
    n_sliced = 0
    for t in c.terms[:40]:
        fn = parse_chengyu_html if t.kind == "Idiom" else parse_ciyu_html
        render = render_chengyu_page if t.kind == "Idiom" else render_ciyu_page
        page = render(t)
        assert fn(page, "p") == fn(page, "p", slice_input=False)
        wrapped = chrome + page[len("<html><body>"):]
        assert fn(wrapped, "p") == fn(wrapped, "p", slice_input=False)
        assert fn(wrapped, "p")["data"] == fn(page, "p")["data"]
        if prefix_slice(wrapped) is not None:
            n_sliced += 1
    assert n_sliced == 40  # the chrome-wrapped pages all took the slice path


# ---------------------------------------------------------------------------
# round-7 interior term slicing: region-split + pruned-field slicing must
# NEVER diverge from the full parse, at any field subset, with the
# economics threshold forced off so the slice path actually runs
# ---------------------------------------------------------------------------

_TERM_BITS = st.sampled_from(
    [
        '<div class="ci-title"><h1>一心一意</h1><div class="pinyin"><span>yī</span></div></div>',
        '<div class="ci-title-wrap"><h1>学习</h1><div class="pinyin"><span>xué</span></div>'
        '<div class="ci-tag">常用词</div></div>',
        '<div class="ci-attrs"><p>注音：ㄧ</p><p>感情：<a href="/e">褒义</a></p>'
        '<p>近义词：<a href="/a">全心全意</a></p></div>',
        '<div class="ci-attrs"><p><label>拼音</label><span>xué xí</span></p>'
        '<p><label>近义词</label><span class="ci-list"><a href="/s">研习</a></span></p></div>',
        '<div class="ci-content"><p class="explain primary">形容专心。'
        '<button class="btn-copy">复制</button></p><p class="ext">出处：《书》。</p></div>',
        '<ol class="ci-fanyi"><li><label>英语</label>wholeheartedly</li></ol>',
        '<div><h3>网络解释</h3></div><div>一心一意 是成语。</div>',
        '<div class="chrome-banner"><ul><li>广告</li></ul></div>',
        "<script>var x = '<div class=\"ci-title\">';</script>",
        '<div class="ci-content">',  # truncated block
        "</div>",
        "</body>",  # stray close: the sibling-split channel
        "<p>",
        "</p>",
        "<!-- ci-attrs in a comment -->",
        "loose 文本",
        '<div class="wrap"><div class="ci-attrs"><p>注音：ㄨ</p></div>',  # undrained
    ]
)
_TERM_SOUP = st.lists(_TERM_BITS, max_size=10).map("".join)

_FIELD_SETS = st.sampled_from(
    [
        None,  # full extraction
        ("chengyu", "pinyin", "synonyms", "antonyms", "translation"),
        ("word", "pinyin", "synonyms", "antonyms"),
        ("chengyu",),
        ("definition",),
        ("translation", "zhuyin"),
        ("is_common", "part_of_speech"),
    ]
)


def _forced_slice(monkey_module, html, fn, fields):
    """Run fn with the economics threshold forced off so short synthetic
    soups still take the slice path, and compare against the full parse."""
    from kgpipe.parse import slicing as S

    orig = monkey_module.slice_term_page

    def zero_threshold(page, surface, wanted, keep_tail=frozenset(), **_):
        return S.slice_term_page(page, surface, wanted, keep_tail, min_drop_frac=0.0)

    monkey_module.slice_term_page = zero_threshold
    try:
        sliced_out = fn(html, "p", fields=fields)
    finally:
        monkey_module.slice_term_page = orig
    full_out = fn(html, "p", slice_input=False, fields=fields)
    assert sliced_out == full_out


@settings(max_examples=300, deadline=None)
@given(_CHROME, _TERM_SOUP, _FIELD_SETS)
def test_term_interior_slice_never_diverges(chrome, soup, fields):
    import kgpipe.parse.chengyu as C
    import kgpipe.parse.ciyu as Y

    html = chrome + soup
    cf = None if fields is None else tuple(f for f in fields if f in C.ALL_FIELDS)
    yf = None if fields is None else tuple(f for f in fields if f in Y.ALL_FIELDS)
    if cf is None or cf:
        _forced_slice(C, html, C.parse_chengyu_html, cf)
    if yf is None or yf:
        _forced_slice(Y, html, Y.parse_ciyu_html, yf)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="<>/&=\"' cih13-title网络解释divbodyattrs!-", max_size=160))
def test_term_interior_slice_never_diverges_garbage(text):
    import kgpipe.parse.chengyu as C
    import kgpipe.parse.ciyu as Y

    _forced_slice(C, text, C.parse_chengyu_html, None)
    _forced_slice(Y, text, Y.parse_ciyu_html, None)
    _forced_slice(C, text, C.parse_chengyu_html, C.HOT_FIELDS)
    _forced_slice(Y, text, Y.parse_ciyu_html, Y.HOT_FIELDS)


_SCAN_BITS = st.sampled_from(
    [
        "<div>", "</div>", "<script>", "</script>", "</scriptX>", "text",
        "<", "<!--", "-->", "<!-- c -->", "<!doctype html>", "<?php x ?>",
        "<![CDATA[x]]>", '<a href="x>y">', "<b c='>'>", "<img/>",
        "<script src=foo/>", "a<b", "</>", "</ p>", "</p junk>",
        "<style>.x{}</style>", '<script>var a="</scriptX>";</script>',
        "<p class=x>", "<-- weird", "<!>", "<!-x>", "-- >", "<span>",
        "</span>", "</b>", "<br>", "<script/>", "2<3", "</STYLE>",
        "<STYLE>", "&amp;", "<ul><li>a</li>", "</ul>",
        "<SCRIPT>x</script>", "<script>y</SCRIPT>",
    ]
)
_SCAN_SOUP = st.lists(_SCAN_BITS, max_size=12).map("".join)


@settings(max_examples=300, deadline=None)
@given(
    _SCAN_SOUP,
    st.sampled_from(
        [
            {},
            {"interior": True},
            {"prefix": True},
            {"allow_empty_stray": False},
            {"interior": True, "allow_empty_stray": False},
        ]
    ),
)
def test_scan_region_fast_agrees_with_exact(soup, mode):
    """Round-7 gate-economics fast path: whenever the one-C-match-per-
    construct scanner decides a region (returns non-None), its
    RegionScan must be BIT-IDENTICAL to the exact simulation's in every
    mode — the dispatch may only change speed, never a verdict."""
    from kgpipe.parse.slicing import _scan_region, _scan_region_fast

    fast = _scan_region_fast(soup, **mode)
    if fast is not None:
        assert fast == _scan_region(soup, **mode)


def test_scan_region_fast_decides_the_chrome_shape():
    """The fast path must actually cover the realistic chrome the
    corpus's chrome=True mode emits (prefix AND interior regions) —
    otherwise the gate economics silently regress to the exact scan."""
    from kgpipe.corpus import generate_corpus
    from kgpipe.parse.slicing import _scan_region, _scan_region_fast

    corpus = generate_corpus(n_hanzi=4, n_words=8, n_idioms=6, seed=42, chrome=True)
    undecided = 0
    for row in corpus.rows:
        html = row["content"]
        i = html.find("ci-title")
        if i < 0:
            continue
        prefix = html[: html.rfind("<", 0, i)]
        fast = _scan_region_fast(prefix, prefix=True)
        assert fast is None or fast == _scan_region(prefix, prefix=True)
        if fast is None:
            undecided += 1
    assert undecided == 0


def test_term_slice_sibling_split_regression():
    """Round-7 pinned divergence channel: a mid-page '</body>' stray
    close puts the 网络解释 heading's parent (child of <body>) and the
    definition <div> (child of <html>) in DIFFERENT sibling groups in
    the full parse, while a sliced parse that dropped the '<body>' open
    with the prefix sees them adjacent under one root — the empty-stack
    stray exemption alone would slice and invent a definition. The
    sibling rule (element start after a stray in a kept region) must
    decline."""
    from kgpipe.parse.slicing import CIYU_KEEP_TAIL, CIYU_SURFACE, slice_term_page

    html = (
        "<html><body><header>chrome</header>"
        '<div class="ci-title-wrap"><h1>学习</h1></div>'
        "<div><h3>网络解释</h3></div></body><div>学习 是词语。</div></html>"
    )
    assert (
        slice_term_page(
            html,
            CIYU_SURFACE,
            wanted=frozenset(CIYU_SURFACE),
            keep_tail=CIYU_KEEP_TAIL,
            min_drop_frac=0.0,
        )
        is None
    )
    out_full = parse_ciyu_html(html, "p", slice_input=False)
    assert parse_ciyu_html(html, "p") == out_full


def test_term_slice_prunes_interior_blocks():
    """Positive path: with HOT_FIELDS and a chrome-heavy page, the
    chengyu slicer drops the prefix AND the ci-content region while the
    extraction stays byte-identical to the full parse at those fields."""
    from kgpipe.parse.slicing import CHENGYU_SURFACE, slice_term_page

    chrome = "<html><head><title>x</title></head><body>" + (
        '<nav><ul>' + "".join(f'<li><a href="/{i}">菜单{i}</a></li>' for i in range(20)) + "</ul></nav>"
    )
    page = (
        '<div class="ci-title"><h1>一心一意</h1><div class="pinyin"><span>yī</span></div></div>'
        '<div class="ci-attrs"><p>近义词：<a href="/a">全心全意</a></p></div>'
        '<div class="ci-content"><p class="explain primary">形容专心。</p>'
        '<p class="ext">出处：《书》。</p><p class="ext">用法：作谓语。</p></div>'
        '<ol class="ci-fanyi"><li><label>英语</label>wholeheartedly</li></ol>'
        "</body></html>"
    )
    html = chrome + page
    from kgpipe.parse.chengyu import HOT_FIELDS, _wanted_hazards

    sliced = slice_term_page(
        html, CHENGYU_SURFACE, _wanted_hazards(frozenset(HOT_FIELDS))
    )
    assert sliced is not None
    assert "ci-content" not in sliced and "<nav>" not in sliced
    assert "ci-fanyi" in sliced and "ci-attrs" in sliced
    got = parse_chengyu_html(html, "p", fields=HOT_FIELDS)
    assert got == parse_chengyu_html(html, "p", slice_input=False, fields=HOT_FIELDS)
    assert got["data"]["chengyu"] == "一心一意"
    assert got["data"]["translation"] == "英语: wholeheartedly"
