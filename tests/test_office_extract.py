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

    def test_dedup_lines_global(self):
        """genos `_is_duplicate_content` (genos_msword_backend.py:
        1233-1250) is a GLOBAL whole-document content-hash dedup, not
        adjacent-only: the third "same line" is suppressed even though
        "other" sits between. Plain walker keeps everything. Also
        satisfies the reference's pinned invariant
        (tests/unit/test_no_duplicate_lines_docx.py): no adjacent
        duplicate non-empty lines in the output."""
        data = simple_docx(["same line", "same line", "other", "same line"])
        plain = extract_docx(data)
        assert [i.text for i in plain.items] == [
            "same line", "same line", "other", "same line"]
        deduped = extract_docx(data, dedup_lines=True)
        texts = [i.text for i in deduped.items]
        assert texts == ["same line", "other"]
        for a, b in zip(texts, texts[1:]):
            assert a.strip() != b.strip()

    def test_dedup_short_texts_exempt(self):
        """Texts under 5 chars skip the duplicate check
        (genos_msword_backend.py:1237 `len(text.strip()) < 5`)."""
        data = simple_docx(["abcd", "abcd", "abcde", "abcde"])
        texts = [i.text for i in extract_docx(data, dedup_lines=True).items]
        assert texts == ["abcd", "abcd", "abcde"]

    def test_dedup_key_is_normalized(self):
        """The content hash lowercases and collapses whitespace
        (genos_msword_backend.py:1223-1231), so case/spacing variants
        of the same line are duplicates."""
        data = simple_docx(["Hello   World", "hello world", "HELLO\tWORLD"])
        texts = [i.text for i in extract_docx(data, dedup_lines=True).items]
        assert texts == ["Hello   World"]

    def test_dedup_headings_exempt(self):
        """The reference calls `_is_duplicate_content` only on the
        plain-paragraph branches (genos_msword_backend.py:1896,1929);
        headings are added unconditionally."""
        base = simple_docx(["Chapter", "Chapter", "body text", "body text"])
        import zipfile
        from io import BytesIO

        zin = zipfile.ZipFile(BytesIO(base))
        doc = zin.read("word/document.xml").decode()
        # style the two "Chapter" paragraphs as Heading1
        doc = doc.replace(
            "<w:p><w:r><w:t xml:space=\"preserve\">Chapter</w:t>",
            "<w:p><w:pPr><w:pStyle w:val=\"Heading1\"/></w:pPr>"
            "<w:r><w:t xml:space=\"preserve\">Chapter</w:t>")
        parts = {n: zin.read(n) for n in zin.namelist()}
        parts["word/document.xml"] = doc.encode()
        from doc_parser_ray.sources.office_gen import _zip

        res = extract_docx(_zip(parts), dedup_lines=True)
        labeled = [(i.label, i.text) for i in res.items]
        assert labeled == [
            ("section_header", "Chapter"), ("section_header", "Chapter"),
            ("text", "body text"),
        ]

    def test_image_gate_png_kept_wmf_dropped(self):
        """genos emits a picture only when some blip blob opens under
        PIL (genos_msword_backend.py:2220-2320): PNG passes, WMF/EMF
        fail PIL and (Wand absent) nothing is added. The plain walker
        keeps the placeholder unconditionally."""
        from doc_parser_ray.sources.office_gen import docx_with_image

        png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
        wmf = b"\xd7\xcd\xc6\x9a" + b"\x00" * 16
        png_doc = docx_with_image(png)
        wmf_doc = docx_with_image(wmf, target="media/image1.wmf")

        png_items = extract_docx(png_doc, dedup_lines=True).items
        assert [i.label for i in png_items] == ["picture", "text", "text"]

        wmf_items = extract_docx(wmf_doc, dedup_lines=True).items
        assert [i.label for i in wmf_items] == ["text", "text"]

        # plain walker: placeholder regardless of decodability
        assert [i.label for i in extract_docx(wmf_doc).items] == [
            "picture", "text", "text"]

    def test_image_gate_unresolvable_rel_keeps_placeholder(self):
        """A blip whose relationship has no media part in the zip keeps
        the placeholder (documented divergence-avoidance: the reference
        only drops blobs it read and PIL rejected)."""
        from doc_parser_ray.sources.office_gen import docx_with_image

        doc = docx_with_image(None)
        items = extract_docx(doc, dedup_lines=True).items
        assert [i.label for i in items] == ["picture", "text", "text"]

    def test_image_gate_xml_blob_dropped(self):
        """Blobs starting with an XML prolog are rejected by genos
        `is_valid_image_format` before PIL is even tried."""
        from doc_parser_ray.sources.office_gen import docx_with_image

        doc = docx_with_image(b"<?xml version=\"1.0\"?><svg/>",
                              target="media/image1.svg")
        items = extract_docx(doc, dedup_lines=True).items
        assert [i.label for i in items] == ["text", "text"]

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
