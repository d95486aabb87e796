"""AsciiDoc extraction (P10) — semantics of the reference's CURRENT
regex line parser (asciidoc_backend.py; its committed goldens are stale
relative to its own code — see asciidoc_extract.py docstring)."""

from doc_parser_ray.functions.asciidoc_extract import extract_asciidoc
from doc_parser_ray.functions.export import items_to_markdown


def test_reference_fixture_structure():
    src = open("/root/reference/tests/data/asciidoc/test_01.asciidoc").read()
    res = extract_asciidoc(src)
    assert res.status == "ok"
    labels = [it.label for it in res.items]
    assert labels == [
        "title", "text",                    # = title, abstract
        "section_header", "text", "text",   # == Section 1 + two paragraphs
        "section_header", "list_item", "list_item", "text",
        "list_item",                        # dash item
        "section_header", "text", "table",
    ]
    # soft-wrapped source lines of one paragraph joined with spaces
    assert res.items[4].text == (
        "This spans multiple lines but should be treated "
        "as a single paragraph."
    )
    # table grid parsed
    assert res.items[-1].text.split("\n")[0] == "Header 1 | Header 2"


def test_heading_levels_and_lists():
    src = (
        "= Top\n\n== Sec\n\n=== Sub\n\n* a\n  * nested\n* b\n\n"
        "1. one\n2. two\n"
    )
    res = extract_asciidoc(src)
    md = items_to_markdown(res.items)
    assert "# Top" in md
    assert "## Sec" in md
    assert "### Sub" in md
    assert "- a\n    - nested\n- b" in md
    assert "1. one\n2. two" in md


def test_image_caption_and_fences():
    src = ".A caption\nimage::pic.png[alt]\n\n|===\n|a|b|\n|c|d|\n|===\n"
    res = extract_asciidoc(src)
    labels = [it.label for it in res.items]
    assert labels == ["caption", "picture", "table"]
    assert res.items[0].text == "A caption"
    assert res.items[2].text == "a | b\nc | d"


def test_edge_cases():
    assert extract_asciidoc("").status == "empty"
    assert extract_asciidoc("   \n ").status == "empty"
    assert extract_asciidoc("just text\n").items[0].text == "just text"
