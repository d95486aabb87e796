"""PDF text extraction — a from-scratch layout-block parser covering the
reference's PDF text path at the semantics level:

  - content-stream text cells (the analog of pypdfium2 text rects,
    /root/reference/docling/backend/pypdfium2_backend.py:100-153);
  - fragmented-cell repair: group cells into rows by vertical overlap
    (threshold 0.5 x row height), merge horizontally when the gap is at
    most the average cell height — same thresholds and grouping rule as
    the reference (pypdfium2_backend.py:155-249);
  - layout-block segmentation via recursive XY-cut (column gutters first
    at each level, then vertical whitespace), the classic published
    layout-analysis algorithm (Nagy & Seth 1984) — this replaces the
    reference's ML layout model + reading-order model (M3/M4/M7) for the
    born-digital text path, giving deterministic column-aware reading
    order;
  - per-block line join through ``sanitize_text`` (de-hyphenation +
    punctuation normalization, docling/models/page_assemble_model.py:34-65),
    one PARAGRAPH item per block — mirroring the PyMuPDF backend's
    "paragraph per blank-line gap" output shape
    (docling/backend/pymupdf_backend.py:88-121).

The content-stream reader handles the subset a text-centric PDF uses:
optional FlateDecode, BT/ET blocks, Tf/Td/TD/Tm/T*, Tj/TJ/'/" with
literal and hex strings. It never raises: unparseable payloads yield a
``parse_error`` status row (ConversionStatus semantics,
docling/datamodel/base_models.py:36-42).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

from doc_parser_ray.datamodel import (
    PARAGRAPH,
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_ERROR,
    Item,
    ParseResult,
)
from doc_parser_ray.functions import layout_post
from doc_parser_ray.functions.sanitize import sanitize_text


@dataclass
class TextCell:
    """One positioned text run, top-left origin (t < b)."""

    text: str
    l: float
    t: float
    r: float
    b: float

    @property
    def height(self) -> float:
        return self.b - self.t


_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")


def _decode_stream(dict_bytes: bytes, raw: bytes) -> bytes | None:
    if b"/FlateDecode" in dict_bytes:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


def _extract_streams(data: bytes) -> list[bytes]:
    """All decoded stream payloads in file order."""
    out = []
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            break
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            break
        raw = data[start:end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n"):
            raw = raw[:-1]
        decoded = _decode_stream(m.group(1), raw)
        if decoded is not None:
            out.append(decoded)
        pos = end + len(b"endstream")
    return out


def _pdf_string(tok: bytes) -> str:
    """Decode a PDF literal string body (backslash escapes + octal)."""
    out = []
    i = 0
    n = len(tok)
    while i < n:
        c = tok[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = tok[i + 1]
            i += 2
            mapping = {0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x62: "\b", 0x66: "\f"}
            if nxt in mapping:
                out.append(mapping[nxt])
            elif 0x30 <= nxt <= 0x37:
                oct_digits = chr(nxt)
                while i < n and len(oct_digits) < 3 and 0x30 <= tok[i] <= 0x37:
                    oct_digits += chr(tok[i])
                    i += 1
                out.append(chr(int(oct_digits, 8)))
            else:
                out.append(chr(nxt))
        else:
            out.append(chr(c))
            i += 1
    return "".join(out)


# tokenizer for content streams: strings, hex strings, arrays, numbers, operators
_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"  # literal string (no nested parens support needed)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|/[^\s\[\]()<>/]*"  # name
    rb"|[-+]?\d*\.?\d+"  # number
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]+"  # operator
)

_CHAR_WIDTH = 0.5  # Helvetica-ish average advance as a fraction of font size


def _cells_from_content(content: bytes, page_height: float) -> list[TextCell]:
    cells: list[TextCell] = []
    font_size = 12.0
    x = 0.0
    y = 0.0
    leading = 0.0
    stack: list = []

    def show(text: str) -> None:
        nonlocal x
        if text == "":
            return
        width = _CHAR_WIDTH * font_size * len(text)
        top = page_height - y - font_size
        cells.append(TextCell(text=text, l=x, t=top, r=x + width, b=page_height - y))
        x += width

    in_array: list | None = None
    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        if tok == b"[":
            in_array = []
        elif tok == b"]":
            stack.append(in_array)
            in_array = None
        elif tok.startswith(b"("):
            s = _pdf_string(tok[1:-1])
            if in_array is not None:
                in_array.append(s)
            else:
                stack.append(s)
        elif tok.startswith(b"<"):
            hx = re.sub(rb"\s", b"", tok[1:-1])
            try:
                s = bytes.fromhex(hx.decode()).decode("latin-1")
            except ValueError:
                s = ""
            if in_array is not None:
                in_array.append(s)
            else:
                stack.append(s)
        elif tok.startswith(b"/"):
            stack.append(tok)
        elif re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
            v = float(tok)
            if in_array is not None:
                in_array.append(v)
            else:
                stack.append(v)
        else:
            op = tok
            try:
                if op == b"Tf" and len(stack) >= 1 and isinstance(stack[-1], float):
                    font_size = stack[-1]
                elif op in (b"Td", b"TD") and len(stack) >= 2:
                    tx, ty = stack[-2], stack[-1]
                    x += tx
                    y += ty
                    if op == b"TD":
                        leading = -ty
                elif op == b"Tm" and len(stack) >= 6:
                    x, y = stack[-2], stack[-1]
                elif op == b"TL" and stack:
                    leading = stack[-1]
                elif op == b"T*":
                    y -= leading
                elif op == b"Tj" and stack and isinstance(stack[-1], str):
                    show(stack[-1])
                elif op == b"'" and stack and isinstance(stack[-1], str):
                    y -= leading
                    show(stack[-1])
                elif op == b'"' and stack and isinstance(stack[-1], str):
                    y -= leading
                    show(stack[-1])
                elif op == b"TJ" and stack and isinstance(stack[-1], list):
                    for el in stack[-1]:
                        if isinstance(el, str):
                            show(el)
                        elif isinstance(el, float):
                            # kerning adjustment: thousandths of text space
                            x -= el / 1000.0 * font_size
                elif op == b"BT":
                    x = 0.0
                    y = 0.0
            finally:
                stack.clear()
    return cells


# --- fragmented-cell repair (pypdfium2_backend.py:155-249 semantics) ----


def group_rows(cells: list[TextCell], vertical_threshold_factor: float = 0.5) -> list[list[TextCell]]:
    if not cells:
        return []
    rows: list[list[TextCell]] = []
    current = [cells[0]]
    row_top, row_bottom = cells[0].t, cells[0].b
    row_height = cells[0].height
    for cell in cells[1:]:
        vt = row_height * vertical_threshold_factor
        if abs(cell.t - row_top) <= vt and abs(cell.b - row_bottom) <= vt:
            current.append(cell)
            row_top = min(row_top, cell.t)
            row_bottom = max(row_bottom, cell.b)
            row_height = row_bottom - row_top
        else:
            rows.append(current)
            current = [cell]
            row_top, row_bottom = cell.t, cell.b
            row_height = cell.height
    rows.append(current)
    return rows


def merge_horizontal_cells(
    cells: list[TextCell],
    horizontal_threshold_factor: float = 1.0,
    vertical_threshold_factor: float = 0.5,
) -> list[TextCell]:
    """Merge sub-word fragments within rows. Thresholds match the
    reference (pypdfium2_backend.py:157-161). Merged text: members joined
    in x-order, with a space when the inter-cell gap exceeds 0.2 x the
    average height (the reference re-reads glyphs from pdfium instead,
    which we cannot do — this rule reproduces it on our cell model)."""

    def merge_group(group: list[TextCell]) -> TextCell:
        if len(group) == 1:
            return group[0]
        group = sorted(group, key=lambda c: c.l)
        parts = [group[0].text]
        for prev, cur in zip(group, group[1:]):
            gap = cur.l - prev.r
            avg_h = (prev.height + cur.height) / 2
            if gap > 0.2 * avg_h:
                parts.append(" ")
            parts.append(cur.text)
        return TextCell(
            text="".join(parts),
            l=min(c.l for c in group),
            t=min(c.t for c in group),
            r=max(c.r for c in group),
            b=max(c.b for c in group),
        )

    merged: list[TextCell] = []
    for row in group_rows(cells, vertical_threshold_factor):
        row = sorted(row, key=lambda c: c.l)
        current = [row[0]]
        for cell in row[1:]:
            prev = current[-1]
            avg_height = (prev.height + cell.height) / 2
            if cell.l - prev.r <= avg_height * horizontal_threshold_factor:
                current.append(cell)
            else:
                merged.append(merge_group(current))
                current = [cell]
        merged.append(merge_group(current))
    return merged


# --- XY-cut layout-block segmentation ----------------------------------


def _xy_cut(cells: list[TextCell], min_gutter: float, para_gap: float) -> list[list[TextCell]]:
    """Recursive XY-cut: split on the x-gutter first (columns, left to
    right), then on y-gaps larger than ``para_gap`` (top to bottom).
    Leaves are layout blocks."""
    if not cells:
        return []

    # try vertical gutter (column split)
    xs = sorted(cells, key=lambda c: c.l)
    intervals = [(c.l, c.r) for c in xs]
    merged_x: list[list[float]] = []
    for l, r in intervals:
        if merged_x and l <= merged_x[-1][1] + min_gutter:
            merged_x[-1][1] = max(merged_x[-1][1], r)
        else:
            merged_x.append([l, r])
    if len(merged_x) > 1:
        out: list[list[TextCell]] = []
        for l, r in merged_x:
            part = [c for c in cells if c.l >= l - 1e-6 and c.r <= r + 1e-6]
            out.extend(_xy_cut(part, min_gutter, para_gap))
        return out

    # split on vertical whitespace
    ys = sorted(cells, key=lambda c: c.t)
    groups: list[list[TextCell]] = [[ys[0]]]
    cur_bottom = ys[0].b
    for c in ys[1:]:
        if c.t - cur_bottom > para_gap:
            groups.append([c])
        else:
            groups[-1].append(c)
        cur_bottom = max(cur_bottom, c.b)
    return groups


def cells_to_items(cells: list[TextCell]) -> list[Item]:
    """Row-repair → XY-cut blocks → M4 cluster cleanup → PARAGRAPH items.

    The XY-cut blocks are fed through the ported LayoutPostprocessor
    (functions/layout_post.py, from the reference's
    docling/utils/layout_postprocessor.py) as TEXT proposals at confidence
    1.0 with sort_mode="input": on clean pages the cleanup is an identity
    pass (disjoint hull bboxes, every cell assigned), while overlapping or
    degenerate blocks get the reference's Union-Find dedup and orphan-cell
    promotion instead of silently duplicating text.
    """
    if not cells:
        return []
    merged = merge_horizontal_cells(cells)
    med_h = sorted(c.height for c in merged)[len(merged) // 2]
    blocks = _xy_cut(merged, min_gutter=med_h * 2.0, para_gap=med_h * 0.75)

    # Index cells in XY-cut emission order so layout_post's min-cell-index
    # ("id") ordering inside special clusters agrees with reading order.
    lcells: list[layout_post.LCell] = []
    clusters: list[layout_post.Cluster] = []
    cell_map: dict[int, TextCell] = {}
    idx = 0
    for ci, block in enumerate(blocks):
        cluster_cells = []
        for c in block:
            lc = layout_post.LCell(
                index=idx, text=c.text, bbox=layout_post.BBox(c.l, c.t, c.r, c.b)
            )
            cell_map[idx] = c
            lcells.append(lc)
            cluster_cells.append(lc)
            idx += 1
        hull = layout_post.BBox(
            l=min(c.l for c in block),
            t=min(c.t for c in block),
            r=max(c.r for c in block),
            b=max(c.b for c in block),
        )
        clusters.append(
            layout_post.Cluster(
                id=ci, label=layout_post.TEXT, bbox=hull, cells=cluster_cells
            )
        )
    page_w = max((c.r for c in merged), default=612.0)
    page_h = max((c.b for c in merged), default=792.0)
    post = layout_post.LayoutPostprocessor(
        lcells, clusters, page_width=page_w, page_height=page_h, sort_mode="input"
    )
    final_clusters, _ = post.postprocess()

    items: list[Item] = []
    for cluster in final_clusters:
        block = [cell_map[c.index] for c in cluster.cells]
        lines = [
            " ".join(c.text for c in sorted(row, key=lambda c: c.l)).strip()
            for row in group_rows(sorted(block, key=lambda c: (c.t, c.l)))
        ]
        lines = [ln for ln in lines if ln]
        text = sanitize_text(lines)
        if text:
            items.append(Item(label=PARAGRAPH, text=text))
    return items


def extract_pdf(data: bytes, page_height: float = 792.0) -> ParseResult:
    """PDF bytes → PARAGRAPH items in layout reading order."""
    try:
        if not data.lstrip()[:5].startswith(b"%PDF-"):
            return ParseResult(
                items=[], status=STATUS_PARSE_ERROR, error="not a PDF: missing %PDF header"
            )
        streams = _extract_streams(data)
        items: list[Item] = []
        for content in streams:
            if b"BT" not in content:
                continue
            cells = _cells_from_content(content, page_height)
            items.extend(cells_to_items(cells))
        if not items:
            return ParseResult(items=[], status=STATUS_EMPTY)
        return ParseResult(items=items, status=STATUS_OK)
    except Exception as e:
        return ParseResult(items=[], status=STATUS_PARSE_ERROR, error=f"{type(e).__name__}: {e}")
