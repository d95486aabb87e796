"""The fast HTML scanner must produce EXACTLY the extraction the stdlib
tokenizer produces — on the full synthetic corpus and on edge inputs.
Anything it can't tokenize must raise (→ runtime fallback), never
silently diverge."""

import pytest

from doc_parser_ray.datamodel import BODY, FURNITURE
from doc_parser_ray.functions.html_extract import (
    _DomBuilder,
    _Extractor,
    _fast_build_dom,
    _find_first,
    _replace_br,
    _FastTokenizeError,
    _HEADER_TAGS,
    extract_html,
)


def _extract_with(root):
    content = _find_first(root, {"body"}) or root
    _replace_br(content)
    ex = _Extractor()
    ex.content_layer = (
        FURNITURE if _find_first(content, _HEADER_TAGS) is not None else BODY
    )
    ex.walk(content)
    return [(i.label, i.text, i.level, i.marker, i.content_layer)
            for i in ex.items]


def _stdlib_root(payload):
    b = _DomBuilder()
    b.feed(payload)
    b.close()
    return b.root


def _assert_parity(payload):
    try:
        fast = _fast_build_dom(payload)
    except _FastTokenizeError:
        return  # fallback path — by construction identical
    assert _extract_with(fast) == _extract_with(_stdlib_root(payload)), (
        payload[:200]
    )


CASES = [
    "<html><body><h1>T</h1><p>a &amp; b</p></body></html>",
    "<div>stray<p>para</p>tail</div>",
    "<script>var x = '<p>not text</p>';</script><p>real</p>",
    "<style>.a{content:'<'}</style><p>x</p>",
    "<!-- comment --><p>y</p>",
    "<!DOCTYPE html><p>z</p>",
    "<?xml version='1.0'?><p>pi</p>",
    "<ol start=\"3\"><li>a</li><li>b</li></ol>",
    "<ol start='7'><li>q</li></ol>",
    "<table><tr><th colspan=2>h</th></tr><tr><td>a</td><td>b</td></tr></table>",
    "<td rowspan='2'>",
    "<ul><li>outer<ul><li>inner</li></ul></li></ul>",
    "<p>line<br>break</p>",
    "<p>self-closed<br/>here</p>",
    "<P>UPPER TAGS</P><DIV>CASE</DIV>",
    "<p title=\"quoted &gt; attr\">attr entity</p>",
    "<p>unclosed paragraph",
    "</p>stray close<p>after</p>",
    "<figure><img src='x.png'/><figcaption>cap</figcaption></figure>",
    "<details><summary>s</summary><p>body</p></details>",
    "<pre>  spaced\n  code  </pre>",
    "text &lt;escaped&gt; &amp; entities &#65; &nbsp;done",
    "<script>no close tag",
    "<h2>early h2</h2><h1>then h1</h1><h3>h3</h3>",
    "<div><div><p>nest</p>deep text</div></div>",
    "<ul><li></li><li> </li></ul>",
    "a < b but > c",  # stray '<' must raise → fallback
    "<p a b c>bare attrs</p>",
    "<p/>empty self-closing non-void",
    "<table><tr><td><table><tr><td>x</td></tr></table></td></tr></table>",
    # hyphenated custom-element tags: stdlib walks them transparently;
    # a truncated fast-path name (<code-block> → CODE item) would
    # fabricate items — must refuse, never diverge (ADVICE r1, high)
    "<code-block>x</code-block><p>real</p>",
    "<h1-foo>not a title</h1-foo><p>body</p>",
    "<div><x-widget><p>inner</p></x-widget></div>",
    "stray close</x-y><p>after</p>",
    # unquoted attr value ending in '/': stdlib folds the slash into
    # the value and keeps the element open (ADVICE r1, medium)
    "<p class=a/>text</p>",
    "<ol start=3/><li>x</li></ol>",
    "<div class=a/>inner<p>para</p></div>",
    # unambiguous self-closing variants stay on the fast path
    "<p class=\"a\"/>tail",
    "<p class='a' />tail",
]


@pytest.mark.parametrize("payload", CASES, ids=range(len(CASES)))
def test_edge_case_parity(payload):
    _assert_parity(payload)


def test_corpus_parity():
    from doc_parser_ray.sources.transcripts import synth_conv

    checked = 0
    for conv_idx in range(200):
        rows = synth_conv(conv_idx, seed=42, max_turns=40)
        for text, tool in zip(rows["text"], rows["tool"]):
            if "<html" in text[:30]:
                _assert_parity(text)
                checked += 1
    assert checked > 500


@pytest.mark.parametrize("payload", [
    "<code-block>x</code-block>",   # name would truncate to "code"
    "<h1-foo>t</h1-foo>",           # name would truncate to "h1"
    "</x-y>",                       # end-tag name charset beyond fast regex
    "<p class=a/>text</p>",         # slash belongs to the attr value
    "<ol start=3/>",                # same, on an attr-bearing tag
])
def test_divergent_constructs_refused(payload):
    """Constructs where a lenient fast parse would silently diverge from
    the stdlib fallback must raise instead (ADVICE r1 high/medium)."""
    with pytest.raises(_FastTokenizeError):
        _fast_build_dom(payload)
    # public entry still extracts via the stdlib path
    assert extract_html(f"<div>{payload}</div>").status in ("ok", "empty")


def test_stray_lt_falls_back_not_diverges():
    # '<' followed by non-letter: fast path must refuse
    with pytest.raises(_FastTokenizeError):
        _fast_build_dom("a < b")
    # and the public entry still extracts via the stdlib path
    res = extract_html("<div>a < b</div>")
    assert res.status in ("ok", "empty")
