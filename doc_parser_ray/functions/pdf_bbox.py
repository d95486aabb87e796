"""PDF chunk-bbox back-matching (C6) — the analog of the reference's
basic-service provenance pass: chunk text searched in the rendered PDF
pages, hit rectangles normalized to page units and merged with the
overlap-tolerance rule (genon/preprocessor/src/preprocessor.py:266-338
+ genos_utils.py:114-151 ``merge_overlapping_bboxes``).

The reference uses ``fitz_page.search_for(chunk_text)``; this module
emulates that search over the engine's own positioned text cells:

- page text is reconstructed line by line (one space between cells on a
  line, line breaks searchable as whitespace — fitz finds phrases that
  span lines), with a trailing line-end hyphen joined to the next line
  (fitz's default TEXT_DEHYPHENATE behavior);
- the needle matches case-insensitively with any whitespace run in the
  page standing in for a single space in the needle;
- every hit yields ONE rectangle per line portion, horizontally clipped
  to the matched characters (x interpolated linearly inside a cell —
  the one remaining approximation, since the content-stream parser
  does not keep per-glyph advances).

If the exact search finds nothing (chunk text can drift from page text
through sanitize_text), the previous CELL-granularity pass — a cell
participates when its text occurs in the chunk — is the fallback, so
provenance never silently vanishes for extracted chunks.
"""

from __future__ import annotations

import json
import re

from doc_parser_ray.functions.pdf_extract import (
    _cells_from_content,
    _extract_streams,
    group_rows,
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


class _PageChars:
    """Per-page searchable character stream with x-interpolated rects.

    Each entry is ``(ch, line_id, x0, x1)``; separator whitespace (cell
    gaps, line breaks) carries ``line_id = -1`` and contributes no rect.
    """

    def __init__(self, cells) -> None:
        self.chars: list[tuple[str, int, float, float]] = []
        self.line_bounds: list[tuple[float, float]] = []  # (t, b) per line
        lines = [
            sorted(row, key=lambda c: c.l)
            for row in group_rows(sorted(cells, key=lambda c: (c.t, c.l)))
        ]
        for li, line in enumerate(lines):
            self.line_bounds.append(
                (min(c.t for c in line), max(c.b for c in line))
            )
            if li > 0:
                self._join_line_break()
            for ci, cell in enumerate(line):
                if ci > 0:
                    self.chars.append((" ", -1, 0.0, 0.0))
                n = len(cell.text)
                if n == 0:
                    continue
                w = (cell.r - cell.l) / n
                for k, ch in enumerate(cell.text):
                    self.chars.append(
                        (ch, li, cell.l + k * w, cell.l + (k + 1) * w)
                    )

    def _join_line_break(self) -> None:
        # fitz TEXT_DEHYPHENATE default: a line-end hyphen joins the two
        # line fragments into one searchable word (hyphen dropped)
        if self.chars and self.chars[-1][0] == "-":
            self.chars.pop()
        else:
            self.chars.append((" ", -1, 0.0, 0.0))

    def text(self) -> str:
        return "".join(c[0] for c in self.chars)

    def search(self, needle: str) -> list[tuple[int, float, float, float, float]]:
        """All non-overlapping hits as per-line-portion raw rectangles
        ``(line_id, l, t, r, b)`` — the search_for contract."""
        tokens = needle.split()
        if not tokens:
            return []
        pattern = re.compile(
            r"\s+".join(re.escape(tok) for tok in tokens), re.IGNORECASE
        )
        rects: list[tuple[int, float, float, float, float]] = []
        for m in pattern.finditer(self.text()):
            by_line: dict[int, tuple[float, float]] = {}
            for ch, li, x0, x1 in self.chars[m.start():m.end()]:
                if li < 0:
                    continue
                cur = by_line.get(li)
                by_line[li] = (
                    (x0, x1) if cur is None
                    else (min(cur[0], x0), max(cur[1], x1))
                )
            for li in sorted(by_line):
                x0, x1 = by_line[li]
                t, b = self.line_bounds[li]
                rects.append((li, x0, t, x1, b))
        return rects


def pdf_chunk_bboxes(data: bytes, chunk_text: str,
                     page_width: float = 612.0,
                     page_height: float = 792.0) -> list[dict]:
    """Normalized, merged hit rectangles of ``chunk_text`` searched in
    the document's pages (content-stream order), per the search_for
    emulation above."""
    if not data or not chunk_text or not chunk_text.strip():
        return []
    needle = " ".join(chunk_text.split())
    boxes: list[dict] = []
    fallback: list[dict] = []
    page_no = 0
    for content in _extract_streams(data):
        if b"BT" not in content:
            continue
        page_no += 1
        cells = merge_horizontal_cells(
            _cells_from_content(content, page_height))
        if not cells:
            continue
        page = _PageChars(cells)
        for _, l, t, r, b in page.search(needle):
            boxes.append({
                "page": page_no,
                "type": "text",
                "bbox": {
                    "l": l / page_width,
                    "t": t / page_height,
                    "r": r / page_width,
                    "b": b / page_height,
                },
            })
        if not boxes:
            # cell-granularity fallback (pre-exact-search behavior)
            for cell in cells:
                cell_text = " ".join(cell.text.split())
                if cell_text and cell_text in needle:
                    fallback.append({
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
        boxes or fallback,
        x_tolerance=1 / page_width, y_tolerance=1 / page_height
    )


def chunk_bboxes_json(data: bytes, chunk_text: str) -> str:
    """The GenOSVectorMeta ``chunk_bboxes`` flattening: JSON string
    (src/preprocessor.py:102-103 — nested metadata flattens to JSON)."""
    return json.dumps(pdf_chunk_bboxes(data, chunk_text),
                      separators=(",", ":"))
