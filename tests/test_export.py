"""Export projections (markdown / text / doctags — SURVEY.md §2.1
S5/S6/S8 analogs) over extracted rows."""

import pytest

from doc_parser_ray.datamodel import render_items, spans_json
from doc_parser_ray.functions.export import (
    items_from_row,
    to_doctags,
    to_markdown,
    to_text,
)
from doc_parser_ray.functions.html_extract import extract_html

HTML = (
    "<html><body><h1>Title</h1><p>para one</p>"
    "<h2>Sec</h2><ul><li>a</li><li>b</li></ul>"
    "<pre>code here</pre>"
    "<table><tr><th>x</th><th>y</th></tr><tr><td>1</td><td>2</td></tr></table>"
    "</body></html>"
)


def _items():
    res = extract_html(HTML)
    text, spans = render_items(res.items)
    return items_from_row(text, spans_json(spans))


def test_roundtrip_items():
    items = _items()
    labels = [l for l, _, _ in items]
    assert labels == ["title", "text", "section_header", "list_item",
                      "list_item", "code", "table"]


def test_markdown():
    md = to_markdown(_items())
    assert "# Title" in md
    assert "## Sec" in md
    assert "- a" in md
    assert "```\ncode here\n```" in md
    assert "| x | y |" in md
    assert "| --- | --- |" in md


def test_text():
    txt = to_text(_items())
    assert "para one" in txt and "#" not in txt


def test_doctags():
    dt = to_doctags(_items())
    assert dt.startswith("<doctag>") and dt.endswith("</doctag>")
    assert "<title>Title</title>" in dt
    assert "<section_header_level_1>Sec</section_header_level_1>" in dt


@pytest.mark.usefixtures("ray_session")
def test_export_stage():
    import ray.data

    from doc_parser_ray.functions.export import export_turns
    from doc_parser_ray.sources.transcripts import synth_table
    from doc_parser_ray.stages.extract import apply_extract
    from doc_parser_ray.util import collect_table

    ds = ray.data.from_arrow(synth_table(8, seed=3, max_turns=20))
    out = export_turns(apply_extract(ds), formats=("markdown", "doctags"))
    tab = collect_table(out)
    assert "export_markdown" in tab.column_names
    assert "export_doctags" in tab.column_names
    ok = [s == "ok" for s in tab.column("status").to_pylist()]
    mds = tab.column("export_markdown").to_pylist()
    assert any(m for m, o in zip(mds, ok) if o)
