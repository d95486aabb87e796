"""Plain-text extraction — reimplements the paragraph rule of the
reference's ``PyMuPDFDocumentBackend.convert`` applied to raw text
(/root/reference/docling/backend/pymupdf_backend.py:88-121):

  - split on newlines; blank (whitespace-only) lines delimit paragraphs;
  - within a paragraph, lines are stripped and joined with a single
    space; a trailing unterminated paragraph is flushed;
  - each paragraph is one PARAGRAPH item.

On top of that, each paragraph is passed through ``sanitize_text``
(docling/models/page_assemble_model.py:34-65): de-hyphenation across line
breaks + unicode punctuation normalization — the M6 assemble-stage
normalization the reference applies to PDF text lines.
"""

from __future__ import annotations

from doc_parser_ray.datamodel import (
    PARAGRAPH,
    STATUS_EMPTY,
    STATUS_OK,
    Item,
    ParseResult,
)
from doc_parser_ray.functions.sanitize import sanitize_text


def extract_plain_text(payload: str) -> ParseResult:
    if not payload or not payload.strip():
        return ParseResult(items=[], status=STATUS_EMPTY)

    items: list[Item] = []
    buffer: list[str] = []

    def flush() -> None:
        if buffer:
            # reference joins with " " (pymupdf_backend.py:95); we apply
            # sanitize_text to the raw stripped lines, which reduces to the
            # same join for non-hyphenated text and additionally repairs
            # hyphenated line breaks + unicode punctuation (M6).
            paragraph = sanitize_text(buffer)
            if paragraph:
                items.append(Item(label=PARAGRAPH, text=paragraph))
            buffer.clear()

    for line in payload.split("\n"):
        stripped = line.strip()
        if not stripped:
            flush()
        else:
            buffer.append(stripped)
    flush()

    if not items:
        return ParseResult(items=[], status=STATUS_EMPTY)
    return ParseResult(items=items, status=STATUS_OK)
