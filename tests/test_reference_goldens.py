"""Parity against the REFERENCE REPO'S OWN committed groundtruth:
convert its HTML test fixtures and compare our markdown export to
/root/reference/tests/data/groundtruth/docling_v2/*.html.md.

ALL 10 html fixtures (including the 245 KB wiki_duck page) must match
BYTE-EXACTLY — table cells render bs4-``.text``-verbatim so
width-significant whitespace survives.
"""

import os

import pytest

from doc_parser_ray.functions.export import items_to_markdown
from doc_parser_ray.functions.html_extract import extract_html

FIXTURE_DIR = "/root/reference/tests/data/html"
GOLDEN_DIR = "/root/reference/tests/data/groundtruth/docling_v2"

EXACT = [
    "example_01", "example_02", "example_03", "example_04", "example_05",
    "example_06", "example_07", "example_08", "unit_test_01", "wiki_duck",
]

# markdown fixtures: ALL byte-exact incl. inline_and_formatting —
# emphasis / code spans / links re-serialize through Item.md_text while
# item.text keeps the plain main-content resolution
MD_EXACT = [
    "blocks", "duck", "ending_with_table", "inline_and_formatting",
    "mixed", "mixed_without_h1", "nested", "wiki",
]

# csv fixtures: ALL byte-exact incl. csv-tab (tab-containing cells get
# wcswidth=-1 in tabulate — replicated in _md_table)
CSV_EXACT = [
    "csv-comma-in-cell", "csv-comma", "csv-inconsistent-header",
    "csv-pipe", "csv-semicolon", "csv-tab", "csv-too-few-columns",
    "csv-too-many-columns",
]

requires_reference = pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference repo not mounted"
)


def _convert(name: str) -> str:
    with open(f"{FIXTURE_DIR}/{name}.html") as f:
        html = f.read()
    res = extract_html(html)
    assert res.status == "ok"
    return items_to_markdown(res.items).strip()


def _golden(name: str) -> str:
    with open(f"{GOLDEN_DIR}/{name}.html.md") as f:
        return f.read().strip()


@requires_reference
@pytest.mark.parametrize("name", EXACT)
def test_exact_golden(name):
    assert _convert(name) == _golden(name)


@requires_reference
@pytest.mark.parametrize("name", CSV_EXACT)
def test_csv_fixture_golden(name):
    from doc_parser_ray.functions.csv_extract import extract_csv

    with open(f"/root/reference/tests/data/csv/{name}.csv") as f:
        src = f.read()
    with open(f"{GOLDEN_DIR}/{name}.csv.md") as f:
        golden = f.read().strip()
    res = extract_csv(src)
    assert res.status == "ok"
    assert items_to_markdown(res.items).strip() == golden




# docx fixtures: ALL 12 byte-exact — incl. equations.docx via the
# stdlib OMML→LaTeX port (functions/omml.py)
DOCX_EXACT = [
    "equations", "lorem_ipsum", "tablecell", "test_emf_docx", "textbox",
    "unit_test_formatting", "unit_test_headers",
    "unit_test_headers_numbered", "unit_test_lists",
    "word_image_anchors", "word_sample", "word_tables",
]

PPTX_EXACT = [
    "powerpoint_bad_text", "powerpoint_sample", "powerpoint_with_image",
]


@requires_reference
@pytest.mark.parametrize("name", DOCX_EXACT)
def test_docx_fixture_golden(name):
    from doc_parser_ray.functions.docx_extract import extract_docx

    with open(f"/root/reference/tests/data/docx/{name}.docx", "rb") as f:
        res = extract_docx(f.read())
    assert res.status == "ok"
    with open(f"{GOLDEN_DIR}/{name}.docx.md") as f:
        golden = f.read().strip()
    assert items_to_markdown(res.items).strip() == golden


@requires_reference
def test_xlsx_fixture_golden():
    from doc_parser_ray.functions.xlsx_extract import extract_xlsx

    with open("/root/reference/tests/data/xlsx/test-01.xlsx", "rb") as f:
        res = extract_xlsx(f.read())
    assert res.status == "ok"
    with open(f"{GOLDEN_DIR}/test-01.xlsx.md") as f:
        golden = f.read().strip()
    assert items_to_markdown(res.items).strip() == golden


@requires_reference
@pytest.mark.parametrize("name", PPTX_EXACT)
def test_pptx_fixture_golden(name):
    from doc_parser_ray.functions.pptx_extract import extract_pptx

    with open(f"/root/reference/tests/data/pptx/{name}.pptx", "rb") as f:
        res = extract_pptx(f.read())
    assert res.status == "ok"
    with open(f"{GOLDEN_DIR}/{name}.pptx.md") as f:
        golden = f.read().strip()
    assert items_to_markdown(res.items).strip() == golden


# JATS fixtures: ALL five byte-exact (incl. the 250 KB elife article
# with its tables, figures, citation lists and nbsp/em-space quirks)
JATS_EXACT = [
    "bmj_sample", "elife-56337", "pnas_sample", "pntd.0008301",
    "pone.0234687",
]


@requires_reference
@pytest.mark.parametrize("name", JATS_EXACT)
def test_jats_fixture_golden(name):
    from doc_parser_ray.functions.jats_extract import extract_jats

    with open(f"/root/reference/tests/data/jats/{name}.xml", "rb") as f:
        res = extract_jats(f.read())
    assert res.status == "ok"
    with open(f"{GOLDEN_DIR}/{name}.xml.md") as f:
        golden = f.read().strip()
    assert items_to_markdown(res.items).strip() == golden


@requires_reference
@pytest.mark.parametrize(
    "name", ["elife-56337", "pntd.0008301", "pone.0234687"])
def test_jats_nxml_variant_parses(name):
    """The .nxml variants have no goldens — they must still parse to a
    non-trivial item stream."""
    from doc_parser_ray.functions.jats_extract import extract_jats

    with open(f"/root/reference/tests/data/jats/{name}.nxml", "rb") as f:
        res = extract_jats(f.read())
    assert res.status == "ok"
    assert len(res.items) > 50


# USPTO fixtures: ALL five byte-exact, covering four dialects — ICE
# v4.x applications (ipa*), Grant v2.5 (pg*), AppV1 (pa*), and the APS
# plain-text grant format (pftaps*), incl. OASIS table parsing
USPTO_EXACT = [
    "ipa20180000016", "ipa20200022300", "pa20010031492",
    "pftaps057006474", "pg06442728",
]
_USPTO_EXT = {"pftaps057006474": "txt"}


@requires_reference
@pytest.mark.parametrize("name", USPTO_EXACT)
def test_uspto_fixture_golden(name):
    from doc_parser_ray.functions.uspto_extract import extract_uspto

    ext = _USPTO_EXT.get(name, "xml")
    with open(f"/root/reference/tests/data/uspto/{name}.{ext}", "rb") as f:
        res = extract_uspto(f.read())
    assert res.status == "ok"
    with open(f"{GOLDEN_DIR}/{name}.md") as f:
        golden = f.read().strip()
    assert items_to_markdown(res.items).strip() == golden


@requires_reference
@pytest.mark.parametrize("name", [
    "ipa20110039701", "ipg07997973", "ipg08672134", "ipgD0701016"])
def test_uspto_goldenless_fixtures_parse(name):
    from doc_parser_ray.functions.uspto_extract import extract_uspto

    with open(f"/root/reference/tests/data/uspto/{name}.xml", "rb") as f:
        res = extract_uspto(f.read())
    assert res.status == "ok"
    assert len(res.items) > 5


@requires_reference
@pytest.mark.parametrize("name", MD_EXACT)
def test_markdown_fixture_golden(name):
    from doc_parser_ray.functions.md_extract import extract_markdown

    with open(f"/root/reference/tests/data/md/{name}.md") as f:
        src = f.read()
    with open(f"{GOLDEN_DIR}/{name}.md.md") as f:
        golden = f.read().strip()
    res = extract_markdown(src)
    assert res.status == "ok"
    assert items_to_markdown(res.items).strip() == golden
