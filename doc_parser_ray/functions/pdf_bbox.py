"""PDF chunk-bbox back-matching (C6) — the analog of the reference's
basic-service provenance pass: chunk text searched in the rendered PDF
pages, hit rectangles normalized to page units and merged with the
overlap-tolerance rule (genon/preprocessor/src/preprocessor.py:266-338
+ genos_utils.py:114-151 ``merge_overlapping_bboxes``).

The reference uses ``fitz_page.search_for(chunk_text)``; this engine's
own content-stream parser supplies positioned text cells instead, so
matching is at CELL granularity (a cell participates when its text
occurs in the chunk) — documented approximation: per-line rectangles
rather than per-substring, which the merge step collapses to the same
block rectangles for contiguous text.
"""

from __future__ import annotations

import json

from doc_parser_ray.functions.pdf_extract import (
    _cells_from_content,
    _extract_streams,
    merge_horizontal_cells,
)


def merge_overlapping_bboxes(bboxes: list[dict], x_tolerance: float = 1,
                             y_tolerance: float = 1) -> list[dict]:
    """Faithful port of genos_utils.merge_overlapping_bboxes: repeat
    until fixpoint; same-page 'text' boxes that overlap within the
    tolerances merge into their union; non-text boxes pass through."""

    def is_overlap(b1: dict, b2: dict) -> bool:
        if b1["page"] != b2["page"]:
            return False
        l1, r1, t1, btm1 = (b1["bbox"]["l"], b1["bbox"]["r"],
                            b1["bbox"]["t"], b1["bbox"]["b"])
        l2, r2, t2, btm2 = (b2["bbox"]["l"], b2["bbox"]["r"],
                            b2["bbox"]["t"], b2["bbox"]["b"])
        if (r1 < l2 - x_tolerance or l1 > r2 + x_tolerance
                or btm1 < t2 - y_tolerance or t1 > btm2 + y_tolerance):
            return False
        return True

    def merge(b1: dict, b2: dict) -> dict:
        return {
            "page": b1["page"],
            "type": "text",
            "bbox": {
                "l": min(b1["bbox"]["l"], b2["bbox"]["l"]),
                "t": min(b1["bbox"]["t"], b2["bbox"]["t"]),
                "r": max(b1["bbox"]["r"], b2["bbox"]["r"]),
                "b": max(b1["bbox"]["b"], b2["bbox"]["b"]),
            },
        }

    changed = True
    while changed:
        changed = False
        merged: list[dict] = []
        for current in bboxes:
            if current.get("type") != "text":
                merged.append(current)
                continue
            merged_in = False
            for i, existing in enumerate(merged):
                if existing.get("type") == "text" \
                        and is_overlap(existing, current):
                    merged[i] = merge(existing, current)
                    merged_in = True
                    changed = True
                    break
            if not merged_in:
                merged.append(current)
        bboxes = merged
    return bboxes


def pdf_chunk_bboxes(data: bytes, chunk_text: str,
                     page_width: float = 612.0,
                     page_height: float = 792.0) -> list[dict]:
    """Normalized, merged rectangles of the cells whose text occurs in
    ``chunk_text`` — one search pass over the engine's own positioned
    cells, page-indexed by content stream order."""
    if not data or not chunk_text or not chunk_text.strip():
        return []
    needle = " ".join(chunk_text.split())
    boxes: list[dict] = []
    page_no = 0
    for content in _extract_streams(data):
        if b"BT" not in content:
            continue
        page_no += 1
        cells = merge_horizontal_cells(
            _cells_from_content(content, page_height))
        for cell in cells:
            cell_text = " ".join(cell.text.split())
            if cell_text and cell_text in needle:
                boxes.append({
                    "page": page_no,
                    "type": "text",
                    "bbox": {
                        "l": cell.l / page_width,
                        "t": cell.t / page_height,
                        "r": cell.r / page_width,
                        "b": cell.b / page_height,
                    },
                })
    return merge_overlapping_bboxes(
        boxes, x_tolerance=1 / page_width, y_tolerance=1 / page_height
    )


def chunk_bboxes_json(data: bytes, chunk_text: str) -> str:
    """The GenOSVectorMeta ``chunk_bboxes`` flattening: JSON string
    (src/preprocessor.py:102-103 — nested metadata flattens to JSON)."""
    return json.dumps(pdf_chunk_bboxes(data, chunk_text),
                      separators=(",", ":"))
