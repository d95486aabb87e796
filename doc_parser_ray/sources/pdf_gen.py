"""Deterministic minimal PDF writer for fixtures and benchmarks.

Produces small, valid, uncompressed (or optionally Flate-compressed)
single/multi-page PDFs with absolutely positioned text — the analog of
the reference's test PDFs under /root/reference/tests/data/pdf/, which we
cannot ship. Only Helvetica, only ``BT .. Td (..) Tj .. ET`` text ops, so
the paired extractor (functions/pdf_extract.py) and any standard PDF
reader agree on content.

No randomness: output bytes are a pure function of the input spec.
"""

from __future__ import annotations

import zlib


def _esc(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(
    pages: list[list[tuple[float, float, float, str]]],
    page_width: float = 612.0,
    page_height: float = 792.0,
    compress: bool = False,
) -> bytes:
    """Build a PDF.

    ``pages``: one list per page of (x, y_baseline, font_size, text)
    tuples in PDF user space (origin bottom-left).
    """
    objects: list[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)  # 1-based object number

    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    page_nums: list[int] = []
    content_nums: list[int] = []
    for cells in pages:
        ops = [b"BT"]
        for x, y, size, text in cells:
            ops.append(f"/F1 {size:g} Tf".encode())
            ops.append(f"1 0 0 1 {x:g} {y:g} Tm".encode())
            ops.append(b"(" + _esc(text).encode("latin-1", "replace") + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if compress:
            comp = zlib.compress(stream)
            content = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                + comp
                + b"\nendstream"
            )
        else:
            content = (
                b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream"
            )
        content_nums.append(add(content))

    pages_num_placeholder = len(objects) + len(pages) + 1  # pages tree object number
    for content_num in content_nums:
        page_nums.append(
            add(
                (
                    f"<< /Type /Page /Parent {pages_num_placeholder} 0 R "
                    f"/MediaBox [0 0 {page_width:g} {page_height:g}] "
                    f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                    f"/Contents {content_num} 0 R >>"
                ).encode()
            )
        )

    kids = " ".join(f"{n} 0 R" for n in page_nums)
    pages_num = add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_nums)} >>".encode()
    )
    assert pages_num == pages_num_placeholder
    catalog_num = add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog_num, xref_pos)
    )
    return bytes(out)


def simple_text_pdf(paragraphs: list[str], two_column: bool = False) -> bytes:
    """Lay out paragraphs as fixed-width wrapped 12pt lines; optionally in
    two columns (exercises the layout-block / XY-cut ordering)."""
    page_w, page_h = 612.0, 792.0
    size = 12.0
    leading = 14.0
    margin = 54.0
    col_w = (page_w - 3 * margin) / 2 if two_column else page_w - 2 * margin
    max_chars = max(10, int(col_w / (size * 0.5)))

    lines: list[str] = []
    for para in paragraphs:
        words = para.split()
        cur = ""
        for w in words:
            if cur and len(cur) + 1 + len(w) > max_chars:
                lines.append(cur)
                cur = w
            else:
                cur = f"{cur} {w}" if cur else w
        if cur:
            lines.append(cur)
        lines.append("")  # paragraph break

    pages: list[list[tuple[float, float, float, str]]] = []
    cells: list[tuple[float, float, float, str]] = []
    col = 0
    y = page_h - margin

    def next_slot() -> None:
        nonlocal y, col, cells
        y -= leading
        if y < margin:
            if two_column and col == 0:
                col = 1
                y = page_h - margin - leading
            else:
                pages.append(cells)
                cells = []
                col = 0
                y = page_h - margin - leading

    for line in lines:
        next_slot()
        if line:
            x = margin + col * (col_w + margin)
            cells.append((x, y, size, line))
    if cells:
        pages.append(cells)
    if not pages:
        pages = [[]]
    return make_pdf(pages)
