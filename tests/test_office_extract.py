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
        """Hand-built sheet XML with truly ABSENT cells: A1:B2 block,
        a gap column, then D1:D2 — two separate contiguous regions."""
        import re
        import zipfile
        from io import BytesIO

        base = simple_xlsx([["x"]])
        zin = zipfile.ZipFile(BytesIO(base))
        sheet = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            '<row r="1">'
            '<c r="A1" t="inlineStr"><is><t>a1</t></is></c>'
            '<c r="B1" t="inlineStr"><is><t>b1</t></is></c>'
            '<c r="D1" t="inlineStr"><is><t>d1</t></is></c>'
            '</row>'
            '<row r="2">'
            '<c r="A2" t="inlineStr"><is><t>a2</t></is></c>'
            '<c r="B2" t="inlineStr"><is><t>b2</t></is></c>'
            '<c r="D2" t="inlineStr"><is><t>d2</t></is></c>'
            '</row>'
            '</sheetData></worksheet>'
        )
        buf = BytesIO()
        with zipfile.ZipFile(buf, "w") as zout:
            for name in zin.namelist():
                data = (sheet.encode() if name == "xl/worksheets/sheet1.xml"
                        else zin.read(name))
                zout.writestr(name, data)
        res = extract_xlsx(buf.getvalue())
        assert res.status == "ok"
        tables = [i.text for i in res.items if i.label == "table"]
        assert tables == ["a1 | b1\na2 | b2", "d1\nd2"]

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


class TestHwpx:
    SAMPLE = ("/root/reference/genon/preprocessor/sample_files/"
              "hwpx_sample.hwpx")

    def test_sample_document_extracts(self):
        import os

        import pytest as _pytest

        from doc_parser_ray.functions.hwpx_extract import extract_hwpx

        if not os.path.exists(self.SAMPLE):
            _pytest.skip("reference sample missing")
        with open(self.SAMPLE, "rb") as f:
            res = extract_hwpx(f.read())
        assert res.status == "ok"
        labels = {i.label for i in res.items}
        # real structure: headers, tables, lists and prose all present
        assert {"section_header", "table", "list_item", "text"} <= labels
        assert len(res.items) > 200
        all_text = "\n".join(i.text for i in res.items)
        # known content of the reference's own sample document
        assert "인구동향조사" in all_text
        assert "2020년 다문화 인구동태" in all_text

    def test_dispatcher_zip_disambiguation(self):
        import os

        import pytest as _pytest

        from doc_parser_ray.functions.extract import extract_payload

        if not os.path.exists(self.SAMPLE):
            _pytest.skip("reference sample missing")
        with open(self.SAMPLE, "rb") as f:
            b64 = base64.b64encode(f.read()).decode()
        fmt, res = extract_payload(b64, "")
        assert fmt == "hwpx"
        assert res.status == "ok"

    def test_garbage(self):
        from doc_parser_ray.functions.hwpx_extract import extract_hwpx

        assert extract_hwpx(b"junk").status == "parse_error"
        assert extract_hwpx(simple_docx(["x"])).status == "parse_error"


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


class TestBoilerplateStats:
    def test_link_density_signals(self):
        from doc_parser_ray.functions.boilerplate import boilerplate_stats

        prose = boilerplate_stats(
            "<html><body><p>plain prose with many words here</p>"
            "</body></html>")
        navpage = boilerplate_stats(
            "<html><body><nav><a href='/a'>Home</a><a href='/b'>About"
            "</a></nav><p>x</p></body></html>")
        assert prose["link_density"] == 0.0
        assert navpage["link_density"] > 0.5
        assert navpage["anchor_count"] == 2
        assert prose["text_density"] > 0

    def test_scripts_do_not_count(self):
        from doc_parser_ray.functions.boilerplate import boilerplate_stats

        s = boilerplate_stats(
            "<html><body><script>var a='xxxxxxxx';</script>"
            "<p>ab</p></body></html>")
        assert s["text_chars"] == 2

    def test_garbage_safe(self):
        from doc_parser_ray.functions.boilerplate import boilerplate_stats

        assert boilerplate_stats("")["text_chars"] == 0
        assert boilerplate_stats("a < b > c")["text_chars"] >= 0
