"""Core data model: extraction items, labels, result records, Arrow schemas.

Mirrors the observable output of the reference's ``DoclingDocument`` item
tree (docling-core), reduced to what the extraction/equality path needs:
flat, ordered items with a label, text, hierarchy level and content layer
(BODY vs FURNITURE — reference: docling/backend/html_backend.py:131-134).

Nested per-turn structures (spans, label histogram) are emitted as JSON
strings in the output record, following the reference's own flattening of
nested metadata into JSON strings in its final record
(genon/preprocessor/src/preprocessor.py:102-103, GenOSVectorMeta
``chunk_bboxes``/``media_files``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa

# Item labels — subset of docling-core DocItemLabel that the declarative
# backends emit (html_backend.py, md_backend.py, pymupdf_backend.py).
TITLE = "title"
SECTION_HEADER = "section_header"
TEXT = "text"
PARAGRAPH = "paragraph"
CODE = "code"
FORMULA = "formula"
LIST_ITEM = "list_item"
TABLE = "table"
CAPTION = "caption"
PICTURE = "picture"

BODY = "body"
FURNITURE = "furniture"

# Conversion statuses — mirrors docling ConversionStatus
# (docling/datamodel/base_models.py:36-42): SUCCESS / PARTIAL_SUCCESS /
# FAILURE / SKIPPED, plus an explicit "empty" for blank payloads.
STATUS_OK = "ok"
STATUS_EMPTY = "empty"
STATUS_PARSE_ERROR = "parse_error"
STATUS_UNSUPPORTED = "unsupported"
# input-limit rejection: the reference marks the InputDocument invalid
# when filesize/page-count limits are exceeded
# (docling/datamodel/document.py:133-169) and the converter reports
# ConversionStatus.FAILURE for invalid docs
# (docling/document_converter.py:421-430).
STATUS_FAILURE = "failure"

_MAXSIZE = 2**63 - 1


@dataclass(frozen=True)
class DocumentLimits:
    """Input gates applied BEFORE (size) / instead of (pages) parsing —
    the analog of docling DocumentLimits
    (docling/datamodel/settings.py:22-25) enforced by InputDocument
    (docling/datamodel/document.py:133-169):

    - ``max_file_size``: payload byte size (decoded size for
      base64-carried formats — the reference gates on the on-disk file
      size, which is the decoded blob here);
    - ``max_num_pages`` / ``page_range``: paginated formats (PDF) only;
      a doc with ``page_count > max_num_pages`` or
      ``page_count < page_range[0]`` is rejected after the cheap page
      census, without text extraction — mirroring the reference's
      post-backend-init, pre-pipeline check.

    Defaults are unlimited, matching the reference.
    """

    max_file_size: int = _MAXSIZE
    max_num_pages: int = _MAXSIZE
    page_range: tuple[int, int] = (1, _MAXSIZE)

    @property
    def pages_active(self) -> bool:
        return self.max_num_pages < _MAXSIZE or self.page_range[0] > 1

    @property
    def active(self) -> bool:
        return self.max_file_size < _MAXSIZE or self.pages_active


@dataclass
class Item:
    """One extraction item (analog of a DoclingDocument node with text)."""

    label: str
    text: str
    level: int = 0  # heading level (1..6) or list nesting depth
    marker: str = ""  # list marker, e.g. "-" or "3."
    content_layer: str = BODY
    group: int = 0  # enclosing group id (separates sibling lists on export)
    # pre-rendered inline-markdown body (bold/italic/hyperlinks), set by
    # backends that carry run formatting (DOCX); ``text`` stays plain.
    # Used by items_to_markdown only — the analog of docling-core
    # serializing Formatting/hyperlink attributes at export time.
    md_text: str = ""


@dataclass
class ParseResult:
    """Outcome of extracting one payload (analog of ConversionResult,
    docling/datamodel/document.py:214-231)."""

    items: list[Item] = field(default_factory=list)
    status: str = STATUS_OK
    error: str = ""


def render_items(items: list[Item]) -> tuple[str, list[dict]]:
    """Serialize items to (extracted_text, spans).

    Rules (this engine's canonical text form, modeled on docling's
    markdown export of the item tree, kept plain-text):
      - only BODY-layer items with non-empty text are rendered
        (FURNITURE — pre-first-heading boilerplate — is dropped, the
        reference excludes furniture from markdown export);
      - list items render as ``{marker} {text}``;
      - all other labels render their text verbatim;
      - items joined with a single ``\\n``.

    spans: one dict per rendered item: {label, start, end} — character
    offsets into extracted_text (analog of docling charspan provenance,
    docling/models/readingorder_model.py:292-337).
    """
    parts: list[str] = []
    spans: list[dict] = []
    pos = 0
    for it in items:
        if it.content_layer != BODY or it.label == PICTURE:
            continue
        if it.label == LIST_ITEM and it.marker:
            line = f"{it.marker} {it.text}"
        else:
            line = it.text
        if not line:
            continue
        if parts:
            pos += 1  # the joining "\n"
        parts.append(line)
        spans.append({"label": it.label, "start": pos,
                      "end": pos + len(line), "level": it.level})
        pos += len(line)
    return "\n".join(parts), spans


def label_histogram(items: list[Item]) -> dict[str, int]:
    """Per-turn item-label histogram over BODY items (regression-suite
    analog: genon/preprocessor/tests/regression/test_pdf_regression.py:55-63)."""
    hist: dict[str, int] = {}
    for it in items:
        if it.content_layer != BODY:
            continue
        hist[it.label] = hist.get(it.label, 0) + 1
    return hist


def spans_json(spans: list[dict]) -> str:
    # hot path: span labels come from the fixed label set (no escaping
    # needed) — manual building is ~3x json.dumps, byte-identical output
    return "[" + ",".join(
        f'{{"label":"{s["label"]}","start":{s["start"]},"end":{s["end"]}'
        f',"level":{s["level"]}}}'
        for s in spans
    ) + "]"


def hist_json(hist: dict[str, int]) -> str:
    return json.dumps(dict(sorted(hist.items())), separators=(",", ":"))


# Arrow schema of the extraction stage output (per turn).
EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("format", pa.string()),
        pa.field("content_hash", pa.string()),
        pa.field("extracted_text", pa.string()),
        pa.field("spans", pa.string()),       # JSON: [{label,start,end}]
        pa.field("label_hist", pa.string()),  # JSON: {label: count}
        pa.field("status", pa.string()),
        pa.field("error", pa.string()),
        pa.field("n_items", pa.int32()),
        pa.field("n_chars_in", pa.int64()),
        pa.field("n_chars_out", pa.int64()),
    ]
)

# Input schema (from BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)
