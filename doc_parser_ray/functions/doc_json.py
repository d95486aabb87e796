"""Lossless document-JSON surface — the analog of the reference's
DoclingJSON reader (S10, /root/reference/docling/backend/json/
docling_json_backend.py:13-60: re-load a previously serialized document
and convert without re-parsing the original format).

``items_to_doc_json`` serializes the full item tree state (label, text,
level, marker, content layer, group, pre-rendered markdown body);
``extract_doc_json`` validates and reconstructs it. The pair is
round-trip lossless for every backend's output: re-exporting the
reloaded items yields byte-identical markdown/text/doctags.
"""

from __future__ import annotations

import json

from doc_parser_ray.datamodel import (
    BODY,
    Item,
    ParseResult,
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_ERROR,
)

SCHEMA_ID = "doc_parser_ray/items@1"

_FIELDS = ("label", "text", "level", "marker", "content_layer", "group",
           "md_text")
_DEFAULTS = {"level": 0, "marker": "", "content_layer": BODY, "group": 0,
             "md_text": ""}


def items_to_doc_json(items: list[Item]) -> str:
    """Serialize items losslessly (defaults elided for compactness)."""
    rows = []
    for it in items:
        row: dict = {"label": it.label, "text": it.text}
        for f in _FIELDS[2:]:
            v = getattr(it, f)
            if v != _DEFAULTS[f]:
                row[f] = v
        rows.append(row)
    return json.dumps({"schema": SCHEMA_ID, "items": rows},
                      separators=(",", ":"), ensure_ascii=False)


def extract_doc_json(payload: str) -> ParseResult:
    """Document-JSON → items (S10 semantics: validate, reconstruct,
    never re-parse)."""
    if not payload or not payload.strip():
        return ParseResult(items=[], status=STATUS_EMPTY)
    try:
        data = json.loads(payload)
    except ValueError as e:
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error=f"json: {e}")
    if not isinstance(data, dict) or data.get("schema") != SCHEMA_ID:
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error="not a doc_parser_ray document JSON")
    raw = data.get("items")
    if not isinstance(raw, list):
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error="items missing")
    items: list[Item] = []
    try:
        for row in raw:
            items.append(Item(
                label=str(row["label"]),
                text=str(row["text"]),
                level=int(row.get("level", _DEFAULTS["level"])),
                marker=str(row.get("marker", _DEFAULTS["marker"])),
                content_layer=str(row.get("content_layer",
                                          _DEFAULTS["content_layer"])),
                group=int(row.get("group", _DEFAULTS["group"])),
                md_text=str(row.get("md_text", _DEFAULTS["md_text"])),
            ))
    except (KeyError, TypeError, ValueError) as e:
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error=f"bad item row: {e}")
    if not items:
        return ParseResult(items=[], status=STATUS_EMPTY)
    return ParseResult(items=items, status=STATUS_OK)
