"""PPTX (OOXML presentation) extraction — from-scratch reimplementation
of the observable semantics of the reference's
``MsPowerpointDocumentBackend``
(/root/reference/docling/backend/mspowerpoint_backend.py:37-465,
python-pptx based), built on stdlib ``zipfile`` + ``xml.etree`` only.

Semantics reproduced:
  - slides walked in presentation order; shapes in spTree order; group
    shapes recurse with children sorted by (top, left) EMU position
    (":423-440");
  - per-shape text frames: a paragraph is a list item when it carries
    a:buChar / a:buAutoNum or an indent level > 0 (":148-163");
    numbered bullets count per shape ("1.", "2."...); one list group
    per shape (":151-202");
  - title/center-title placeholders → TITLE; the reference's subtitle
    branch is a no-op statement, so subtitles stay TEXT — replicated
    (":204-219");
  - line breaks inside a paragraph become spaces (":139-146");
  - tables from graphicFrames: grid with gridSpan/rowSpan arithmetic,
    merge-placeholder cells (hMerge/vMerge) contribute nothing, origin
    text repeats across the span (":330-370");
  - pictures and charts → placeholder items (":262-301");
  - notes slides → FURNITURE text (excluded from markdown, ":446-464").
"""

from __future__ import annotations

import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

from doc_parser_ray.datamodel import (
    CAPTION,
    FURNITURE,
    LIST_ITEM,
    PICTURE,
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_ERROR,
    TABLE,
    TEXT,
    TITLE,
    Item,
    ParseResult,
)

_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_REL = "http://schemas.openxmlformats.org/package/2006/relationships"


def _p(tag: str) -> str:
    return f"{{{_P}}}{tag}"


def _a(tag: str) -> str:
    return f"{{{_A}}}{tag}"


def _parse_rels(data: bytes | None) -> dict[str, str]:
    out: dict[str, str] = {}
    if not data:
        return out
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return out
    for rel in root.iter(f"{{{_REL}}}Relationship"):
        rid, target = rel.get("Id"), rel.get("Target")
        if rid and target:
            out[rid] = target
    return out


def _para_text(p_el) -> str:
    """Paragraph text: runs + fields; line breaks become spaces
    (mspowerpoint_backend.py:139-146)."""
    parts: list[str] = []
    for child in p_el:
        tag = child.tag
        if tag in (_a("r"), _a("fld")):
            t = child.find(_a("t"))
            parts.append(t.text or "" if t is not None else "")
        elif tag == _a("br"):
            parts.append(" ")
    return "".join(parts)


def _is_list_item(p_el) -> tuple[bool, str]:
    """mspowerpoint_backend.py:148-163."""
    if p_el.find(f".//{_a('buChar')}") is not None:
        return True, "Bullet"
    if p_el.find(f".//{_a('buAutoNum')}") is not None:
        return True, "Numbered"
    ppr = p_el.find(_a("pPr"))
    lvl = int(ppr.get("lvl", "0")) if ppr is not None else 0
    if lvl > 0:
        return True, "None"
    return False, "None"


class _SlideWalker:
    def __init__(self):
        self.items: list[Item] = []
        self._group_seq = 0

    # ---- text shapes -------------------------------------------------

    def _shape_text(self, sp) -> str:
        return "\n".join(_para_text(p_el)
                         for p_el in sp.iter(_a("p")))

    def _placeholder_type(self, sp) -> str | None:
        ph = sp.find(f".//{_p('nvSpPr')}/{_p('nvPr')}/{_p('ph')}")
        if ph is None:
            return None
        return ph.get("type", "body")

    def handle_text(self, sp) -> None:
        """mspowerpoint_backend.py:142-236 (handle_text_elements)."""
        ph_type = self._placeholder_type(sp)
        txbody = sp.find(f"{_p('txBody')}")
        if txbody is None:
            return
        list_group = None
        enum_value = 0
        for p_el in txbody.findall(_a("p")):
            text = _para_text(p_el)
            is_list, bullet_type = _is_list_item(p_el)
            if is_list:
                if list_group is None:
                    self._group_seq += 1
                    list_group = self._group_seq
                    enum_value = 0
                enumerated = bullet_type == "Numbered"
                if enumerated:
                    enum_value += 1
                    marker = f"{enum_value}."
                else:
                    marker = "-"
                if text.strip():
                    self.items.append(Item(
                        label=LIST_ITEM, text=text, level=1,
                        marker=marker, group=list_group,
                    ))
            else:
                label = TEXT
                if ph_type in ("ctrTitle", "title"):
                    label = TITLE
                # subtitle: the reference's branch is a bare expression
                # statement (no-op) — subtitles stay TEXT
                stripped = text.lstrip()
                if (stripped.startswith("자료:")
                        or stripped.startswith("참고:")
                        or stripped.startswith("출처:")):
                    label = CAPTION
                if text.strip():
                    self.items.append(Item(label=label, text=text,
                                           level=1))

    # ---- tables ------------------------------------------------------

    def handle_table(self, tbl) -> None:
        """mspowerpoint_backend.py:330-370 (handle_tables)."""
        trs = tbl.findall(_a("tr"))
        num_rows = len(trs)
        num_cols = max((len(tr.findall(_a("tc"))) for tr in trs), default=0)
        if not num_rows or not num_cols:
            return
        grid: list[list[str | None]] = [
            [None] * num_cols for _ in range(num_rows)
        ]
        any_text = False
        for r, tr in enumerate(trs):
            for c, tc in enumerate(tr.findall(_a("tc"))):
                if tc.get("hMerge") or tc.get("vMerge"):
                    continue  # merge placeholder: no content
                text = "".join(
                    _para_text(p_el) for p_el in tc.iter(_a("p"))
                )
                row_span = int(tc.get("rowSpan", "1"))
                col_span = int(tc.get("gridSpan", "1"))
                if text.strip():
                    any_text = True
                for rr in range(r, min(r + row_span, num_rows)):
                    for cc in range(c, min(c + col_span, num_cols)):
                        grid[rr][cc] = text
        if not any_text:
            return  # fully empty table is dropped (":366-369")
        rows_txt = [
            " | ".join("" if cell is None else " ".join(cell.split())
                       for cell in row)
            for row in grid
        ]
        self.items.append(Item(label=TABLE, text="\n".join(rows_txt)))

    # ---- shape dispatch ----------------------------------------------

    @staticmethod
    def _shape_pos(shape) -> tuple[int, int]:
        off = shape.find(f".//{_a('xfrm')}/{_a('off')}")
        if off is None:
            return (0, 0)
        return (int(off.get("y", "0") or 0), int(off.get("x", "0") or 0))

    def handle_shape(self, shape) -> None:
        tag = shape.tag
        if tag == _p("grpSp"):
            children = [c for c in shape
                        if c.tag in (_p("sp"), _p("pic"),
                                     _p("graphicFrame"), _p("grpSp"))]
            for child in sorted(children, key=self._shape_pos):
                self.handle_shape(child)
            return
        if tag == _p("graphicFrame"):
            tbl = shape.find(f".//{_a('tbl')}")
            if tbl is not None:
                self.handle_table(tbl)
            elif shape.find(f".//{{{_A.replace('/main', '/chart')}}}chart") \
                    is not None:
                self.items.append(Item(label=PICTURE, text=""))
            return
        if tag == _p("pic"):
            self.items.append(Item(label=PICTURE, text=""))
            return
        if tag == _p("sp"):
            if self._shape_text(shape).strip():
                self.handle_text(shape)


def extract_pptx(data: bytes) -> ParseResult:
    """PPTX bytes → ordered extraction items (P7 semantics)."""
    if not data:
        return ParseResult(items=[], status=STATUS_EMPTY)
    try:
        zf = zipfile.ZipFile(BytesIO(data))
        names = set(zf.namelist())
        if "ppt/presentation.xml" not in names:
            return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                               error="not a PPTX: ppt/presentation.xml "
                                     "missing")
        pres = ET.fromstring(zf.read("ppt/presentation.xml"))
        rels = _parse_rels(
            zf.read("ppt/_rels/presentation.xml.rels")
            if "ppt/_rels/presentation.xml.rels" in names else None
        )
        walker = _SlideWalker()
        for sld_id in pres.iter(_p("sldId")):
            rid = sld_id.get(f"{{{_R}}}id")
            target = rels.get(rid or "", "")
            if not target:
                continue
            part = "ppt/" + target.lstrip("./").lstrip("/") \
                if not target.startswith("ppt/") else target
            part = part.replace("ppt/../", "")
            if part not in names:
                continue
            slide = ET.fromstring(zf.read(part))
            sp_tree = slide.find(f"{_p('cSld')}/{_p('spTree')}")
            if sp_tree is None:
                continue
            for shape in sp_tree:
                if shape.tag in (_p("sp"), _p("pic"), _p("graphicFrame"),
                                 _p("grpSp")):
                    walker.handle_shape(shape)
            # notes slide → FURNITURE text (excluded from markdown)
            slide_rels = _parse_rels(
                zf.read(f"ppt/slides/_rels/{part.rsplit('/', 1)[-1]}.rels")
                if f"ppt/slides/_rels/{part.rsplit('/', 1)[-1]}.rels"
                in names else None
            )
            for tgt in slide_rels.values():
                if "notesSlide" in tgt:
                    npart = "ppt/" + tgt.replace("../", "")
                    if npart in names:
                        nroot = ET.fromstring(zf.read(npart))
                        ntext = "\n".join(
                            _para_text(p_el)
                            for p_el in nroot.iter(_a("p"))
                        ).strip()
                        if ntext:
                            walker.items.append(Item(
                                label=TEXT, text=ntext,
                                content_layer=FURNITURE,
                            ))
        if not walker.items:
            return ParseResult(items=[], status=STATUS_EMPTY)
        return ParseResult(items=walker.items, status=STATUS_OK)
    except Exception as e:  # never raise across block boundaries
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error=f"{type(e).__name__}: {e}")
