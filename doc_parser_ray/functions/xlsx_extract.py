"""XLSX (OOXML spreadsheet) extraction — from-scratch reimplementation
of the observable semantics of the reference's ``MsExcelDocumentBackend``
(/root/reference/docling/backend/msexcel_backend.py:72-538, openpyxl
based), built on stdlib ``zipfile`` + ``xml.etree`` only.

Semantics reproduced:
  - every worksheet is walked in workbook order (":171-207");
  - contiguous cell regions become tables: a table starts at the first
    unvisited non-empty cell, its bottom/right bounds extend while cells
    are non-empty OR covered by a merged range (":289-474");
  - merged ranges span cells; the origin cell's text repeats across the
    span in the rendered grid (matching docling's offset-grid export);
  - cell values stringify like openpyxl: shared/inline strings as-is,
    integers without decimal point, floats via ``str(float)``, booleans
    "True"/"False" (":330-378", ``str(cell.value)``);
  - drawing parts referenced by a sheet yield one PICTURE placeholder
    per embedded picture (charts are not pictures) (":476-518").

Documented deviations: formula cells use the CACHED value from <v>
(openpyxl with ``data_only=False`` would return the formula string);
date-formatted numbers stay numeric (no datetime conversion).
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

from doc_parser_ray.datamodel import (
    PICTURE,
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_ERROR,
    TABLE,
    Item,
    ParseResult,
)

_S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_XDR = "http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing"


def _s(tag: str) -> str:
    return f"{{{_S}}}{tag}"


_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _ref_to_rc(ref: str) -> tuple[int, int]:
    """'B3' → (row0, col0)."""
    m = _CELL_REF_RE.match(ref)
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - 64)
    return int(m.group(2)) - 1, col - 1


_INT_RE = re.compile(r"^-?\d+$")


def _num_str(v: str) -> str:
    """openpyxl numeric cast + str(): int when integral, else float."""
    if _INT_RE.match(v):
        return str(int(v))
    try:
        return str(float(v))
    except ValueError:
        return v


class _Sheet:
    def __init__(self, name: str):
        self.name = name
        self.cells: dict[tuple[int, int], str] = {}
        self.merged: list[tuple[int, int, int, int]] = []  # r0,c0,r1,c1 incl
        self.n_pictures = 0
        self.max_row = -1
        self.max_col = -1

    def merged_at(self, r: int, c: int):
        for mr in self.merged:
            if mr[0] <= r <= mr[2] and mr[1] <= c <= mr[3]:
                return mr
        return None


def _parse_sheet(xml: bytes, name: str, shared: list[str]) -> _Sheet:
    sheet = _Sheet(name)
    root = ET.fromstring(xml)
    for c in root.iter(_s("c")):
        ref = c.get("r")
        if not ref:
            continue
        r, col = _ref_to_rc(ref)
        t = c.get("t", "n")
        text: str | None = None
        if t == "s":
            v = c.find(_s("v"))
            if v is not None and v.text is not None:
                idx = int(v.text)
                text = shared[idx] if 0 <= idx < len(shared) else ""
        elif t == "inlineStr":
            is_el = c.find(_s("is"))
            if is_el is not None:
                text = "".join(tt.text or "" for tt in is_el.iter(_s("t")))
        elif t == "b":
            v = c.find(_s("v"))
            if v is not None and v.text is not None:
                text = "True" if v.text.strip() == "1" else "False"
        elif t in ("str", "e"):
            v = c.find(_s("v"))
            if v is not None and v.text is not None:
                text = v.text
        else:  # numeric
            v = c.find(_s("v"))
            if v is not None and v.text is not None:
                text = _num_str(v.text)
        if text is not None:
            sheet.cells[(r, col)] = text
        sheet.max_row = max(sheet.max_row, r)
        sheet.max_col = max(sheet.max_col, col)
    for mc in root.iter(_s("mergeCell")):
        ref = mc.get("ref", "")
        if ":" in ref:
            a, b = ref.split(":")
            r0, c0 = _ref_to_rc(a)
            r1, c1 = _ref_to_rc(b)
            sheet.merged.append((r0, c0, r1, c1))
            sheet.max_row = max(sheet.max_row, r1)
            sheet.max_col = max(sheet.max_col, c1)
    return sheet


def _find_table_bottom(sheet: _Sheet, start_row: int, start_col: int) -> int:
    """msexcel_backend.py:408-432."""
    max_row = start_row
    for ri in range(start_row + 1, sheet.max_row + 1):
        mr = sheet.merged_at(ri, start_col)
        if (ri, start_col) not in sheet.cells and mr is None:
            break
        if mr is not None:
            max_row = max(max_row, mr[2])
        else:
            max_row = ri
    return max_row


def _find_table_right(sheet: _Sheet, start_row: int, start_col: int) -> int:
    """msexcel_backend.py:434-474."""
    max_col = start_col
    for rj in range(start_col + 1, sheet.max_col + 1):
        mr = sheet.merged_at(start_row, rj)
        if (start_row, rj) not in sheet.cells and mr is None:
            break
        if mr is not None:
            max_col = max(max_col, mr[3])
        else:
            max_col = rj
    return max_col


def _find_tables(sheet: _Sheet) -> list[list[list[str | None]]]:
    """Contiguous-region discovery (":289-406") → rendered text grids."""
    grids: list[list[list[str | None]]] = []
    visited: set[tuple[int, int]] = set()
    for ri in range(0, sheet.max_row + 1):
        for rj in range(0, sheet.max_col + 1):
            if (ri, rj) not in sheet.cells or (ri, rj) in visited:
                continue
            max_row = _find_table_bottom(sheet, ri, rj)
            max_col = _find_table_right(sheet, ri, rj)
            n_rows = max_row + 1 - ri
            n_cols = max_col + 1 - rj
            grid: list[list[str | None]] = [
                [None] * n_cols for _ in range(n_rows)
            ]
            local_visited: set[tuple[int, int]] = set()
            for r in range(ri, max_row + 1):
                for c in range(rj, max_col + 1):
                    if (r, c) in local_visited:
                        continue
                    mr = sheet.merged_at(r, c)
                    if mr is not None:
                        row_span = mr[2] - mr[0] + 1
                        col_span = mr[3] - mr[1] + 1
                    else:
                        row_span = col_span = 1
                    # openpyxl parity: only the merge origin holds the
                    # value; covered cells are None
                    text = sheet.cells.get((r, c), "")
                    for sr in range(r, r + row_span):
                        for sc in range(c, c + col_span):
                            local_visited.add((sr, sc))
                            if ri <= sr <= max_row and rj <= sc <= max_col:
                                gr, gc = sr - ri, sc - rj
                                if grid[gr][gc] is None:
                                    grid[gr][gc] = text
                    # merged origin text must repeat across the span even
                    # when the origin lies above/left of this region
                    if mr is not None and (mr[0], mr[1]) != (r, c):
                        origin_text = sheet.cells.get((mr[0], mr[1]), "")
                        for sr in range(max(mr[0], ri),
                                        min(mr[2], max_row) + 1):
                            for sc in range(max(mr[1], rj),
                                            min(mr[3], max_col) + 1):
                                grid[sr - ri][sc - rj] = origin_text
            visited.update(local_visited)
            grids.append(grid)
    return grids


def extract_xlsx(data: bytes) -> ParseResult:
    """XLSX bytes → ordered extraction items (P8 semantics)."""
    if not data:
        return ParseResult(items=[], status=STATUS_EMPTY)
    try:
        zf = zipfile.ZipFile(BytesIO(data))
        names = set(zf.namelist())
        if "xl/workbook.xml" not in names:
            return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                               error="not an XLSX: xl/workbook.xml missing")
        # shared strings
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall(_s("si")):
                shared.append(
                    "".join(t.text or "" for t in si.iter(_s("t")))
                )
        # workbook rels: rId -> worksheet part
        rels: dict[str, str] = {}
        if "xl/_rels/workbook.xml.rels" in names:
            rroot = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
            for rel in rroot.iter(f"{{{_REL}}}Relationship"):
                rels[rel.get("Id", "")] = rel.get("Target", "")
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        items: list[Item] = []
        for sheet_el in wb.iter(_s("sheet")):
            rid = sheet_el.get(f"{{{_R}}}id")
            target = rels.get(rid or "", "")
            if not target:
                continue
            part = "xl/" + target.lstrip("/") if not target.startswith("xl/") \
                else target
            part = part.replace("xl/../", "")
            if part not in names:
                continue
            sheet = _parse_sheet(zf.read(part), sheet_el.get("name", ""),
                                 shared)
            for grid in _find_tables(sheet):
                # openpyxl parity: cell text is str(value) VERBATIM —
                # trailing spaces in shared strings are significant for
                # the golden column widths; only newlines are folded
                rows_txt = [
                    " | ".join("" if cell is None
                               else cell.replace("\n", " ")
                               for cell in row)
                    for row in grid
                ]
                text = "\n".join(rows_txt)
                if text.strip():
                    items.append(Item(label=TABLE, text=text))
            # pictures: sheet -> drawing part -> count xdr:pic
            sheet_rels_name = ("xl/worksheets/_rels/"
                               + part.rsplit("/", 1)[-1] + ".rels")
            if sheet_rels_name in names:
                srels = ET.fromstring(zf.read(sheet_rels_name))
                for rel in srels.iter(f"{{{_REL}}}Relationship"):
                    tgt = rel.get("Target", "")
                    if "drawing" in tgt:
                        dpart = "xl/" + tgt.replace("../", "")
                        if dpart in names:
                            droot = ET.fromstring(zf.read(dpart))
                            for _pic in droot.iter(f"{{{_XDR}}}pic"):
                                items.append(Item(label=PICTURE, text=""))
        if not items:
            return ParseResult(items=[], status=STATUS_EMPTY)
        return ParseResult(items=items, status=STATUS_OK)
    except Exception as e:  # never raise across block boundaries
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error=f"{type(e).__name__}: {e}")
