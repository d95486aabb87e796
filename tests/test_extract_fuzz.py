"""Property-based robustness: extraction never raises, and the fast
HTML scanner stays in parity with the stdlib tokenizer (or refuses) on
arbitrary tag-soup inputs."""

from hypothesis import given, settings, strategies as st

from doc_parser_ray.functions.extract import extract_payload
from doc_parser_ray.functions.html_extract import (
    _DomBuilder,
    _fast_build_dom,
    _FastTokenizeError,
    extract_html,
)

_tag_soup = st.lists(
    st.one_of(
        st.sampled_from([
            "<div>", "</div>", "<p>", "</p>", "<h1>", "</h1>", "<h2>",
            "</h2>", "<ul>", "<ol start='3'>", "<li>", "</li>", "</ul>",
            "</ol>", "<table>", "<tr>", "<td colspan='2'>", "</td>",
            "</tr>", "</table>", "<br>", "<br/>", "<script>", "</script>",
            "<style>", "</style>", "<!-- c -->", "<!DOCTYPE html>",
            "<img src='x'>", "<figure>", "<figcaption>", "</figcaption>",
            "</figure>", "<pre>", "</pre>", "&amp;", "&lt;", "&#65;",
            # pathological fragments: must fall back or stay lenient
            "<", ">", "</", "< p>", "<1>", "<p", "<!", "<?", "<p a='",
            # hyphenated custom elements / ambiguous trailing slashes:
            # fast path must refuse, never truncate the name or
            # misclassify the tag as self-closing
            "<code-block>", "</code-block>", "<h1-foo>", "</h1-foo>",
            "<x-y>", "</x-y>", "<p class=a/>", "<ol start=3/>",
            "<td colspan=2/>", "<p class=\"a\"/>", "<br //>",
        ]),
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=20,
        ),
    ),
    max_size=30,
).map("".join)


@settings(max_examples=200, deadline=None)
@given(_tag_soup)
def test_extract_html_never_raises(payload):
    res = extract_html(payload)
    assert res.status in ("ok", "empty", "parse_error")


@settings(max_examples=200, deadline=None)
@given(_tag_soup)
def test_fast_parser_parity_or_refusal(payload):
    try:
        fast = _fast_build_dom(payload)
    except _FastTokenizeError:
        return  # refusal → stdlib fallback, by construction identical
    b = _DomBuilder()
    b.feed(payload)
    b.close()

    def flat(node, out):
        for ch in node.children:
            if isinstance(ch, str):
                if out and isinstance(out[-1], str):
                    out[-1] += ch  # stdlib may chunk text differently
                else:
                    out.append(ch)
            else:
                out.append(f"<{ch.name}>")
                flat(ch, out)
                out.append(f"</{ch.name}>")
        return out

    assert flat(fast, []) == flat(b.root, [])


@settings(max_examples=100, deadline=None)
@given(
    st.text(max_size=200),
    st.sampled_from(["", "html", "markdown", "text", "pdf", "bogus"]),
)
def test_extract_payload_never_raises(text, tool):
    fmt, res = extract_payload(text, tool)
    assert res.status in ("ok", "empty", "parse_error", "unsupported")


@settings(max_examples=60, deadline=None)
@given(
    st.binary(max_size=400),
    st.sampled_from(["docx", "xlsx", "pptx", "hwpx", "jats", "uspto",
                     "doc_json", ""]),
)
def test_binary_backends_never_raise(data, tool):
    """Arbitrary bytes through every binary/XML backend: errors are
    data (status column), never exceptions."""
    import base64 as _b64

    payload = _b64.b64encode(data).decode() if tool in (
        "docx", "xlsx", "pptx", "hwpx", "") else \
        data.decode("latin-1")
    fmt, res = extract_payload(payload, tool)
    assert res.status in ("ok", "empty", "parse_error", "unsupported")


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=300))
def test_xml_backends_never_raise_on_text(text):
    from doc_parser_ray.functions.jats_extract import extract_jats
    from doc_parser_ray.functions.uspto_extract import extract_uspto

    assert extract_jats(text).status in ("ok", "empty", "parse_error")
    assert extract_uspto(text).status in ("ok", "empty", "parse_error")


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_zip_backends_never_raise_on_corrupt_zip(data):
    """Zip magic + garbage tail: must degrade to parse_error/empty."""
    from doc_parser_ray.functions.docx_extract import extract_docx
    from doc_parser_ray.functions.hwpx_extract import extract_hwpx
    from doc_parser_ray.functions.pptx_extract import extract_pptx
    from doc_parser_ray.functions.xlsx_extract import extract_xlsx

    payload = b"PK\x03\x04" + data
    for fn in (extract_docx, extract_xlsx, extract_pptx, extract_hwpx):
        assert fn(payload).status in ("ok", "empty", "parse_error")
