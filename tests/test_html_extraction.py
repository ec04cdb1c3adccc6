"""Unit tests for the streaming malformed-HTML extractor
(operators/extraction.py::_FirstMatchExtractor / html_first_text_columns):
the reference's first-match-or-'' contract (pet_scraper.py:135-161) must
survive what real browser-tolerated HTML does to a strict parser. These are
pure-Python (no Spark) — the Spark-side plumbing is value-checked by the
registered p1_html_project query in test_oracle_parity.
"""

from __future__ import annotations

from petfinder_database_distributor_spark.operators.extraction import (
    _FirstMatchExtractor,
    _parse_selector,
)


def extract(html: str, *selectors: str) -> list[str]:
    p = _FirstMatchExtractor([_parse_selector(s) for s in selectors])
    p.feed(html)
    p.close()
    return p.finalize()


def test_first_match_wins():
    html = '<div class="x"><p>first</p></div><div class="x"><p>second</p></div>'
    assert extract(html, "div.x p") == ["first"]


def test_miss_yields_empty_string():
    assert extract("<div><p>hi</p></div>", "span.nope") == [""]


def test_decoy_leaf_without_ancestor_chain():
    html = (
        '<div class="header"><h2 class="t">decoy</h2></div>'
        '<div class="info"><h2 class="t">real</h2></div>'
    )
    assert extract(html, "div.info h2.t") == ["real"]


def test_unclosed_p_implied_end():
    # Browser behavior: <p> auto-closes at a block-level start; the capture
    # must NOT swallow the sibling list's text.
    html = '<div><p class="a">Adult<ul><li>Lab</li></ul></div>'
    assert extract(html, "p.a", "ul li") == ["Adult", "Lab"]


def test_unclosed_li_implied_end():
    assert extract("<ul><li>one<li>two</ul>", "ul li") == ["one"]


def test_stray_close_tag_ignored():
    assert extract("<div><p>keep</p></footer></div>", "div p") == ["keep"]


def test_misnested_close_pops_to_match():
    # </div> closes the still-open <span> implicitly; its capture finalizes.
    assert extract("<div><span>text</div>", "span") == ["text"]


def test_unclosed_at_eof_finalizes():
    assert extract('<div class="i"><h2>tail', "div.i h2") == ["tail"]


def test_case_insensitive_tags_and_attrs():
    assert extract('<DIV CLASS="Info"><H2>x</H2></DIV>', "div h2") == ["x"]
    # class VALUES stay case-sensitive (HTML semantics): 'Info' != 'info'
    assert extract('<DIV CLASS="Info"><H2>x</H2></DIV>', "div.info h2") == [""]


def test_unquoted_attrs_and_entities():
    assert extract("<p class=msg>a &amp; b &lt;c&gt;</p>", "p.msg") == ["a & b <c>"]


def test_whitespace_normalized():
    assert extract("<p> El \n\t Paso  </p>", "p") == ["El Paso"]


def test_multi_class_compound_and_id():
    html = '<div class="a b c" id="main"><i>y</i></div>'
    assert extract(html, "div.a.c i") == ["y"]
    assert extract(html, "#main i") == ["y"]
    assert extract(html, "div.a.z i") == [""]


def test_void_elements_not_pushed():
    # <br> and <img> never open scopes; text flows through them (no
    # whitespace in the source → none in the textContent, like the DOM).
    assert extract("<p>a<br>b<img src=x>c</p>", "p") == ["abc"]
    # and a void element inside a captured subtree must not desync the
    # stack (a pushed-but-never-popped <br> would break later matches)
    assert extract("<p>x<br></p><p class=n>next</p>", "p.n") == ["next"]


def test_subtree_text_concatenates_descendants():
    assert extract("<div class=d>x <b>y</b> z</div>", "div.d") == ["x y z"]


def test_all_selectors_one_pass_nested_captures():
    html = '<div class="o">out <span class="i">in</span> side</div>'
    # Outer and inner captures are simultaneously active; both complete.
    assert extract(html, "div.o", "span.i") == ["out in side", "in"]


# ---- property: the extractor NEVER crashes and always honors the contract
# (list of plain strings, '' on miss) no matter how broken the input is.

from hypothesis import given, settings
from hypothesis import strategies as st

_tagish = st.sampled_from(
    ["<div>", "</div>", "<p class=x>", "<li", ">", "</", "<![CDATA[", "<!--",
     "-->", "<a href='", "<<<", "&amp;", "&#x41;", "&bogus;", "<img src=x>",
     '<div class="x y">', "</span>", "\x00", "🐈", "text ", "<DIV>", "<?php "]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_tagish, max_size=30).map("".join))
def test_extractor_total_on_malformed_soup(soup):
    out = extract(soup, "div.x p", "#loc", "li")
    assert len(out) == 3
    assert all(isinstance(v, str) for v in out)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_extractor_total_on_arbitrary_text(text):
    out = extract(text, "p.msg")
    assert len(out) == 1 and isinstance(out[0], str)
