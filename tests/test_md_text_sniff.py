"""Goldens for markdown, plain-text, sanitize and sniffing."""

from doc_parser_ray.datamodel import render_items
from doc_parser_ray.functions.md_extract import extract_markdown
from doc_parser_ray.functions.sanitize import sanitize_text
from doc_parser_ray.functions.sniff import sniff_format
from doc_parser_ray.functions.text_extract import extract_plain_text


def md_text(md: str) -> str:
    res = extract_markdown(md)
    assert res.status == "ok", res.error
    return render_items(res.items)[0]


class TestMarkdown:
    def test_headings(self):
        res = extract_markdown("# Title\n\n## Sec\n\nbody")
        assert [i.label for i in res.items] == ["title", "section_header", "text"]

    def test_inline_resolution(self):
        assert md_text("a **b** *c* `d` [e](http://x)") == "a b c d e"

    def test_fenced_code(self):
        assert md_text("```py\nx = 1\n  y = 2\n```") == "x = 1\n  y = 2"

    def test_lists(self):
        assert md_text("- a\n- b") == "- a\n- b"
        assert md_text("1. a\n2. b") == "1. a\n2. b"
        # ordered markers renumber from 1 per group: the reference's md
        # backend records no source numbering and its serializer
        # enumerates (groundtruth mixed_without_h1.md.md renders a
        # source "2." as "1.")
        assert md_text("3. a\n4. b") == "1. a\n2. b"

    def test_pipe_table(self):
        got = md_text("| a | b |\n|---|---|\n| 1 | 2 |")
        assert got == "a | b\n1 | 2"

    def test_html_block_delegation(self):
        # md_backend.py:578-611: embedded HTML handled by the HTML backend
        got = md_text("para\n\n<div><p>embedded</p></div>\n\nafter")
        assert got == "para\nembedded\nafter"

    def test_image(self):
        res = extract_markdown("![alt](x.png)")
        assert [i.label for i in res.items] == ["text", "picture"]

    def test_empty(self):
        assert extract_markdown("").status == "empty"


class TestPlainText:
    def test_paragraph_split(self):
        # pymupdf_backend.py:88-121: blank lines delimit, lines joined
        res = extract_plain_text("a b\nc d\n\ne f\n")
        assert [i.text for i in res.items] == ["a b c d", "e f"]

    def test_dehyphenation(self):
        # page_assemble_model.py:38-51
        res = extract_plain_text("recon-\nstruction works")
        assert res.items[0].text == "reconstruction works"

    def test_hyphen_merge_uses_word_chars(self):
        # \b[\w]+\b ignores punctuation: "end -" + "(paren)" still merges
        # by dropping the hyphen (reference regex semantics, ":42-43")
        res = extract_plain_text("end -\n(paren)")
        assert res.items[0].text == "end (paren)"

    def test_hyphen_kept_for_numeric_ranges(self):
        res = extract_plain_text("pages 3-\n4 follow")
        # digits are alnum → still merged: reference treats them the same
        assert res.items[0].text == "pages 34 follow"

    def test_whitespace_only(self):
        assert extract_plain_text(" \n \n").status == "empty"


class TestSanitize:
    def test_single_line_untouched(self):
        # reference returns early before normalization for <=1 lines
        assert sanitize_text(["“quoted”"]) == "“quoted”"

    def test_multiline_normalization(self):
        assert sanitize_text(["“a”", "b’s • c ⁄ d"]) == '"a" b\'s · c / d'

    def test_join_with_space(self):
        assert sanitize_text(["one", "two", "three"]) == "one two three"


class TestSniff:
    def test_tool_wins(self):
        assert sniff_format("# md looking", "html") == "html"

    def test_html_content(self):
        assert sniff_format("<!DOCTYPE html><html><body>x</body>") == "html"
        assert sniff_format("hello <p>world</p>") == "html"

    def test_markdown_content(self):
        assert sniff_format("# Title\n\nbody") == "markdown"
        assert sniff_format("- a\n- b") == "markdown"

    def test_pdf_content(self):
        assert sniff_format("%PDF-1.4 binary") == "pdf"
        assert sniff_format("JVBERi0xLjQK") == "pdf"

    def test_plain(self):
        assert sniff_format("just words here.") == "text"
        assert sniff_format("") == "text"


class TestArticleSniffDisambiguation:
    """HTML5 <article> pages are NOT JATS (code-review r2 finding)."""

    def test_html5_article_page_sniffs_html(self):
        from doc_parser_ray.functions.extract import extract_payload
        from doc_parser_ray.functions.sniff import sniff_format

        page = ("<!DOCTYPE html><html><head><script>var x=1;</script>"
                "</head><body><article><h1>T</h1><p>Real prose.</p>"
                "</article></body></html>")
        assert sniff_format(page, "") == "html"
        _fmt, res = extract_payload(page, "")
        text = "\n".join(i.text for i in res.items)
        assert "var x=1" not in text and "Real prose." in text

    def test_bare_article_fragment_sniffs_html(self):
        from doc_parser_ray.functions.sniff import sniff_format

        assert sniff_format("<article><p>post</p></article>", "") == "html"

    def test_jats_forms_still_detected(self):
        from doc_parser_ray.functions.sniff import sniff_format

        doctype = ('<?xml version="1.0"?><!DOCTYPE article PUBLIC '
                   '"-//NLM//DTD JATS (Z39.96)" "JATS-journal.dtd">'
                   "<article><front/></article>")
        rootonly = ("<article><front><article-meta/></front>"
                    "<body><p>x</p></body></article>")
        assert sniff_format(doctype, "") == "jats"
        assert sniff_format(rootonly, "") == "jats"
