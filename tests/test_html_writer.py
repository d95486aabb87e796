"""S7 HTML writer: the serialization must round-trip through our own
HTML backend — writer and parser agree on one document model."""

import glob
import os

import pytest

from doc_parser_ray.functions.export import to_html
from doc_parser_ray.functions.html_extract import extract_html


def _texts(items):
    return [i.text for i in items if i.text]


FIXTURES = sorted(glob.glob("/root/reference/tests/data/html/*.html"))


@pytest.mark.parametrize(
    "path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_html_writer_roundtrip(path):
    with open(path) as f:
        res = extract_html(f.read())
    if res.status != "ok":
        pytest.skip("fixture does not extract")
    triples = [(i.label, i.text, i.level) for i in res.items]
    html_out = to_html(triples)
    back = extract_html(html_out)
    assert back.status == "ok"
    assert _texts(back.items) == _texts(res.items)


def test_html_writer_structure():
    triples = [
        ("title", "The Title", 1),
        ("text", "A paragraph & more", 0),
        ("section_header", "Section", 1),
        ("list_item", "- item one", 1),
        ("list_item", "- item two", 1),
        ("table", "a | b\nc | d", 0),
        ("code", "x = 1", 0),
    ]
    out = to_html(triples)
    assert "<h1>The Title</h1>" in out
    assert "<h2>Section</h2>" in out
    assert "&amp; more" in out
    assert out.count("<li>") == 2 and "<ul>" in out
    assert "<tr><td>a</td><td>b</td></tr>" in out
    assert "<pre>x = 1</pre>" in out
    back = extract_html(out)
    assert _texts(back.items)[0] == "The Title"


def test_export_turns_html_format():
    import ray.data

    from doc_parser_ray.functions.export import export_turns
    from doc_parser_ray.sources.transcripts import transcripts_dataset
    from doc_parser_ray.stages.extract import apply_extract
    from doc_parser_ray.util import collect_table

    ds = apply_extract(transcripts_dataset(n_convs=6, seed=7, max_turns=10))
    tab = collect_table(export_turns(ds, formats=("html",)))
    col = tab.column("export_html").to_pylist()
    assert any(s.startswith("<!DOCTYPE html>") for s in col if s)
