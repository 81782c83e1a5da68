"""Fast regex tokenizer must be block-for-block identical to the stdlib
html.parser tokenizer (both drive the same _BlockParser callbacks) — the
byte-identity contract depends on it."""

from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_extraction_spark.corpus import synth_pages
from invoice_extraction_spark.functions.html_blocks import parse_blocks


def _sig(html, fast):
    return [
        (b.text, b.region, b.is_content, b.n_links, b.tag_path, b.link_chars)
        for b in parse_blocks(html, fast=fast)
    ]


def test_equivalent_on_corpus():
    for p in synth_pages(200):
        assert _sig(p["html"], True) == _sig(p["html"], False), p["url"]


EDGES = [
    b"",
    b"<p>a&amp;b &lt;c&gt; &#65;</p>",
    b"<div><p>unclosed <b>bold",
    b"<script>if(a<b){x='</div>'}</script><p>after</p>",
    b"<style>p{color:<red>}</style><p>styled</p>",
    b"<p>a<br/>b<br>c</p>",
    b"<DIV CLASS='NaV'><P>menu</P></DIV>",
    b"<p >spaced</p >",
    b"plain no tags at all",
    b"<td>x</td></tr></table><p>stray closes</p>",
    b"<!-- c --><p>z<!-- inner --></p><!DOCTYPE html>",
    b"<p title='a>b'>gt inside attr</p>",
    b"<a href='/x'>l</a> <a>m</a>",
    b"<p>\xf0\x9f\x98\x80 emoji</p>",
    b"<nav id=menu><ul><li>x</li></ul></nav><main><p>body text here</p></main>",
    b"<p/><div/>text<span/>",
]


def test_equivalent_on_edge_cases():
    for h in EDGES:
        assert _sig(h, True) == _sig(h, False), h


# tag soup fuzz: random interleavings of tags, text, entities, attrs
_soup = st.lists(
    st.one_of(
        st.sampled_from(
            ["<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>", "<li>",
             "<nav>", "</nav>", "<br>", "<b>", "</b>", "<span class='ad'>",
             "</span>", "<script>", "</script>", "<!-- c -->"]
        ),
        st.text(alphabet="ab &;<>#x1\n\t", min_size=0, max_size=12),
    ),
    max_size=30,
).map("".join)


@settings(max_examples=150, deadline=None)
@given(_soup)
def test_equivalent_on_tag_soup(s):
    assert _sig(s, True) == _sig(s, False), repr(s)
