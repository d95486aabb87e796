"""PDF generator + extractor round-trip and merge-heuristic unit tests."""

import base64

from doc_parser_ray.datamodel import render_items
from doc_parser_ray.functions.extract import extract_payload
from doc_parser_ray.functions.pdf_extract import (
    TextCell,
    extract_pdf,
    group_rows,
    merge_horizontal_cells,
)
from doc_parser_ray.sources.pdf_gen import make_pdf, simple_text_pdf


def test_single_paragraph_roundtrip():
    pdf = simple_text_pdf(["alpha beta gamma delta epsilon zeta eta theta"])
    res = extract_pdf(pdf)
    assert res.status == "ok", res.error
    text = render_items(res.items)[0]
    assert text == "alpha beta gamma delta epsilon zeta eta theta"


def test_paragraph_separation():
    pdf = simple_text_pdf(["first paragraph words", "second paragraph words"])
    res = extract_pdf(pdf)
    assert [i.text for i in res.items] == [
        "first paragraph words",
        "second paragraph words",
    ]


def test_multi_page():
    long_para = " ".join(f"word{i}" for i in range(900))
    pdf = simple_text_pdf([long_para])
    res = extract_pdf(pdf)
    assert res.status == "ok"
    joined = " ".join(i.text for i in res.items)
    assert joined.split() == long_para.split()


def test_two_column_reading_order():
    # enough text to fill the left column and spill to the right one
    para = " ".join(f"tok{i:03d}" for i in range(700))
    pdf = simple_text_pdf([para], two_column=True)
    res = extract_pdf(pdf)
    assert res.status == "ok"
    tokens = " ".join(i.text for i in res.items).split()
    # XY-cut must restore left-column-first order == original token order
    assert tokens == para.split()


def test_compressed_stream():
    pdf = make_pdf([[(72, 700, 12, "compressed hello")]], compress=True)
    res = extract_pdf(pdf)
    assert res.status == "ok"
    assert render_items(res.items)[0] == "compressed hello"


def test_escapes_in_strings():
    pdf = make_pdf([[(72, 700, 12, "paren (x) and \\ back")]])
    res = extract_pdf(pdf)
    assert render_items(res.items)[0] == "paren (x) and \\ back"


def test_not_a_pdf():
    res = extract_pdf(b"hello world")
    assert res.status == "parse_error"


def test_base64_payload_dispatch():
    pdf = simple_text_pdf(["dispatched text"])
    fmt, res = extract_payload(base64.b64encode(pdf).decode(), "pdf")
    assert fmt == "pdf"
    assert render_items(res.items)[0] == "dispatched text"


def test_bad_base64_is_error_row():
    fmt, res = extract_payload("JVBERi0!!!notb64", "pdf")
    assert fmt == "pdf"
    assert res.status == "parse_error"


class TestMergeHeuristic:
    # pypdfium2_backend.py:155-249 semantics on synthetic cells

    def c(self, text, l, t, r, b):
        return TextCell(text=text, l=l, t=t, r=r, b=b)

    def test_row_grouping_by_vertical_overlap(self):
        cells = [
            self.c("a", 0, 100, 10, 112),
            self.c("b", 12, 101, 22, 113),   # same row (within 0.5*height)
            self.c("c", 0, 130, 10, 142),    # new row
        ]
        rows = group_rows(cells)
        assert [len(r) for r in rows] == [2, 1]

    def test_fragments_merge_without_space(self):
        # sub-word fragments: tiny gap → concatenated directly
        cells = [
            self.c("frag", 0, 100, 20, 112),
            self.c("ment", 20.5, 100, 40, 112),
        ]
        merged = merge_horizontal_cells(cells)
        assert len(merged) == 1
        assert merged[0].text == "fragment"

    def test_words_merge_with_space(self):
        # gap > 0.2*height but <= height → same cell, space-joined
        cells = [
            self.c("two", 0, 100, 20, 112),
            self.c("words", 26, 100, 50, 112),
        ]
        merged = merge_horizontal_cells(cells)
        assert len(merged) == 1
        assert merged[0].text == "two words"

    def test_distant_cells_not_merged(self):
        # gap > avg height → separate cells (e.g. table columns)
        cells = [
            self.c("left", 0, 100, 20, 112),
            self.c("right", 100, 100, 130, 112),
        ]
        merged = merge_horizontal_cells(cells)
        assert [c.text for c in merged] == ["left", "right"]
