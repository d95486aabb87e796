"""Per-payload extraction dispatcher with the reference's fallback chain.

Mirrors the facade's behavior of trying the primary backend and falling
back on any exception (genon/preprocessor/facade/
intelligent_processor.py:1055-1069: DoclingParseV4 → PyPdfium retry):
here html/markdown/pdf extraction falls back to the plain-text extractor
rather than erroring the row, and a failed base64 decode yields a
``parse_error`` status — errors are data, never exceptions
(ConversionStatus semantics, docling/datamodel/base_models.py:36-42).
"""

from __future__ import annotations

import base64
import binascii
import hashlib

from doc_parser_ray.datamodel import (
    STATUS_PARSE_ERROR,
    ParseResult,
)
from doc_parser_ray.functions.asciidoc_extract import extract_asciidoc
from doc_parser_ray.functions.csv_extract import extract_csv
from doc_parser_ray.functions.docx_extract import extract_docx
from doc_parser_ray.functions.jats_extract import extract_jats
from doc_parser_ray.functions.pptx_extract import extract_pptx
from doc_parser_ray.functions.xlsx_extract import extract_xlsx
from doc_parser_ray.functions.html_extract import extract_html
from doc_parser_ray.functions.md_extract import extract_markdown
from doc_parser_ray.functions.pdf_extract import extract_pdf
from doc_parser_ray.functions.sniff import sniff_format
from doc_parser_ray.functions.text_extract import extract_plain_text


def content_hash(text: str) -> str:
    """SHA-256 identity of the payload (docling/utils/utils.py:19-44)."""
    return hashlib.sha256(text.encode("utf-8", "surrogatepass")).hexdigest()


def extract_payload(text: str, tool: str = "") -> tuple[str, ParseResult]:
    """(format, ParseResult) for one turn payload."""
    fmt = sniff_format(text, tool)
    if fmt == "html":
        res = extract_html(text)
        if res.status == STATUS_PARSE_ERROR:
            res = extract_plain_text(text)  # fallback chain
    elif fmt == "markdown":
        res = extract_markdown(text)
        if res.status == STATUS_PARSE_ERROR:
            res = extract_plain_text(text)
    elif fmt == "asciidoc":
        res = extract_asciidoc(text)
        if res.status == STATUS_PARSE_ERROR:
            res = extract_plain_text(text)
    elif fmt == "csv":
        res = extract_csv(text)
        if res.status == STATUS_PARSE_ERROR:
            res = extract_plain_text(text)
    elif fmt == "jats":
        res = extract_jats(text)
        if res.status == STATUS_PARSE_ERROR:
            res = extract_plain_text(text)
    elif fmt == "uspto":
        from doc_parser_ray.functions.uspto_extract import extract_uspto

        res = extract_uspto(text)
        if res.status == STATUS_PARSE_ERROR:
            res = extract_plain_text(text)
    elif fmt == "doc_json":
        from doc_parser_ray.functions.doc_json import extract_doc_json

        res = extract_doc_json(text)
    elif fmt == "bok_json":
        from doc_parser_ray.functions.bok_extract import extract_bok_json

        res = extract_bok_json(text)
    elif fmt == "pdf":
        stripped = text.lstrip()
        if stripped.startswith("%PDF-"):
            data = stripped.encode("latin-1", "replace")
        else:
            try:
                data = base64.b64decode(stripped, validate=True)
            except (binascii.Error, ValueError) as e:
                return fmt, ParseResult(
                    items=[], status=STATUS_PARSE_ERROR, error=f"base64: {e}"
                )
        res = extract_pdf(data)
    elif fmt in ("docx", "xlsx", "pptx", "hwpx", "office_zip"):
        try:
            data = base64.b64decode(text.strip(), validate=True)
        except (binascii.Error, ValueError) as e:
            return fmt, ParseResult(
                items=[], status=STATUS_PARSE_ERROR, error=f"base64: {e}"
            )
        fmt, res = _extract_office(data, fmt)
    else:
        res = extract_plain_text(text)
    return fmt, res


def _extract_office(data: bytes, fmt: str) -> tuple[str, ParseResult]:
    """Office zip dispatch: disambiguate docx/xlsx/pptx from member
    names when the discriminator was generic (the reference's zip
    disambiguation, docling/datamodel/document.py:306-410)."""
    if fmt == "office_zip":
        import zipfile
        from io import BytesIO

        try:
            names = set(zipfile.ZipFile(BytesIO(data)).namelist())
        except Exception as e:
            return fmt, ParseResult(items=[], status=STATUS_PARSE_ERROR,
                                    error=f"zip: {e}")
        if "word/document.xml" in names:
            fmt = "docx"
        elif "xl/workbook.xml" in names:
            fmt = "xlsx"
        elif "ppt/presentation.xml" in names:
            fmt = "pptx"
        elif any(n.startswith("Contents/section") for n in names):
            fmt = "hwpx"
        else:
            return fmt, ParseResult(items=[], status=STATUS_PARSE_ERROR,
                                    error="unrecognized office zip")
    if fmt == "docx":
        return fmt, extract_docx(data)
    if fmt == "xlsx":
        return fmt, extract_xlsx(data)
    if fmt == "pptx":
        return fmt, extract_pptx(data)
    if fmt == "hwpx":
        from doc_parser_ray.functions.hwpx_extract import extract_hwpx

        return fmt, extract_hwpx(data)
    return fmt, ParseResult(items=[], status=STATUS_PARSE_ERROR,
                            error=f"unsupported office format {fmt}")
