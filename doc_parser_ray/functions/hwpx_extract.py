"""HWPX (Korean Hangul OWPML zip+XML) extraction — PARTIAL
reimplementation of the core semantics of the reference's
``HwpxDocumentBackend``
(/root/reference/docling/backend/xml/hwpx_backend.py:28-1314, a
genonai-fork addition, lxml based), on stdlib ``zipfile`` +
``xml.etree``.

Covered (reference cites):
  - ``Contents/section{N}.xml`` files walked in order, top-level
    paragraphs processed (":241-287");
  - secPr-only metadata paragraphs skipped (":289-293");
  - header heuristics: small decorated tables (1×1 / 1×2 / 1×3, text
    ≤ 200 chars, whitespace-normalized dedup against seen section
    texts) and rectangle drawText boxes become level-1 section
    headers (":325-380", ":712-760"); numeric "1. " / roman "Ⅰ."
    prefixed paragraphs become headers unless the paragraph looks
    like a TOC entry (tab + trailing page number) (":404-440");
  - list-symbol paragraphs (□ o - *) become list items with the
    symbol-depth mapping (":115-163");
  - real tables: cellAddr/cellSpan grid reconstruction, merged cells
    repeat their text (":672-1140", simplified);
  - pictures → placeholder items; equations → their script text
    (":1221-1282").

NOT covered (documented): WMF/image byte extraction, TOC-table
re-flow, per-cell nested-object recursion beyond text, and the
rect-reentry bookkeeping — the reference's regression baselines are
chunk-level (post-chunking vectors), so this backend is verified by
structural/content assertions on the reference's own sample document
rather than byte goldens.
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

from doc_parser_ray.datamodel import (
    LIST_ITEM,
    PICTURE,
    SECTION_HEADER,
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_ERROR,
    TABLE,
    TEXT,
    Item,
    ParseResult,
)

_HP = "http://www.hancom.co.kr/hwpml/2011/paragraph"


def _hp(tag: str) -> str:
    return f"{{{_HP}}}{tag}"


_HEADING_RE = re.compile(r"^(?:\d+\.\s+|[ⅠⅡⅢⅣⅤⅥⅦⅧⅨⅩ]+\.\s*)")
_SYMBOL_LEVEL = {"□": 0, "o": 1, "-": 2, "*": 2}


def _text_of(el) -> str:
    """All hp:t descendant text of ``el`` (tabs render as spaces)."""
    parts = []
    for t in el.iter(_hp("t")):
        parts.append("".join(t.itertext()))
    return " ".join(p for p in parts)


class _HwpxWalker:
    def __init__(self) -> None:
        self.items: list[Item] = []
        self._seen_sections: set[str] = set()
        self._group_seq = 0
        self._list_stack: list[tuple[int, int]] = []  # (group, sym level)

    # ------------------------------------------------------------ emit

    def _add_header(self, text: str) -> None:
        self._list_stack.clear()
        self.items.append(Item(label=SECTION_HEADER, text=text, level=1))

    def _add_paragraph(self, text: str) -> None:
        self.items.append(Item(label=TEXT, text=text))

    def _handle_list_symbol(self, txt: str) -> bool:
        """hwpx_backend.py:115-163: leading symbol → nested list item."""
        if not txt or txt[0] not in _SYMBOL_LEVEL:
            return False
        level = _SYMBOL_LEVEL[txt[0]]
        while self._list_stack and self._list_stack[-1][1] >= level:
            self._list_stack.pop()
        self._group_seq += 1
        self._list_stack.append((self._group_seq, level))
        depth = len(self._list_stack)
        # the reference adds the item as a plain PARAGRAPH inside the
        # list group (hwpx_backend.py:152-161) — the bullet symbol stays
        # embedded in the text and NO marker is prepended, so render
        # verbatim (marker="") while keeping the list structure.
        self.items.append(Item(label=LIST_ITEM, text=txt, level=depth,
                               marker="", group=self._group_seq))
        return True

    # ----------------------------------------------------------- tables

    def _small_table_header(self, tbl) -> bool:
        """1×1 / 1×2 / 1×3 decorated tables are section headers."""
        rows = int(tbl.get("rowCnt", "0") or 0)
        cols = int(tbl.get("colCnt", "0") or 0)
        if not rows:
            trs = tbl.findall(_hp("tr"))
            rows = len(trs)
            cols = len(trs[0].findall(_hp("tc"))) if trs else 0
        if (rows, cols) not in ((1, 1), (1, 2), (1, 3)):
            return False
        txt = _text_of(tbl).strip()
        norm = "".join(txt.split())
        if not txt or len(txt) > 200 or norm in self._seen_sections \
                or norm == "여백":
            return False
        self._seen_sections.add(norm)
        self._add_header(txt)
        return True

    def _process_table(self, tbl) -> None:
        if self._small_table_header(tbl):
            return
        rows = int(tbl.get("rowCnt", "0") or 0)
        cols = int(tbl.get("colCnt", "0") or 0)
        trs = tbl.findall(_hp("tr"))
        if not rows:
            rows = len(trs)
        if not cols:
            cols = max((len(tr.findall(_hp("tc"))) for tr in trs),
                       default=0)
        if not rows or not cols:
            return
        grid: list[list[str | None]] = [[None] * cols for _ in range(rows)]
        for ri, tr in enumerate(trs):
            ci = 0
            for tc in tr.findall(_hp("tc")):
                addr = tc.find(_hp("cellAddr"))
                span = tc.find(_hp("cellSpan"))
                r = int(addr.get("rowAddr", ri)) if addr is not None else ri
                c = int(addr.get("colAddr", ci)) if addr is not None else ci
                rs = int(span.get("rowSpan", "1")) if span is not None else 1
                cs = int(span.get("colSpan", "1")) if span is not None else 1
                text = " ".join(_text_of(tc).split())
                for rr in range(r, min(r + rs, rows)):
                    for cc in range(c, min(c + cs, cols)):
                        if grid[rr][cc] is None:
                            grid[rr][cc] = text
                ci = c + cs
        rows_txt = [
            " | ".join("" if cell is None else cell for cell in row)
            for row in grid
        ]
        text = "\n".join(rows_txt)
        if text.strip():
            self.items.append(Item(label=TABLE, text=text))

    # ------------------------------------------------------- paragraphs

    def _process_paragraph(self, p) -> None:
        has_secpr = p.find(f".//{_hp('secPr')}") is not None
        has_text = p.find(f".//{_hp('run')}/{_hp('t')}") is not None
        if has_secpr and not has_text:
            return

        runs = p.findall(_hp("run"))
        emitted_header = False
        body_texts: list[str] = []
        for run in runs:
            handled = False
            for child in run:
                tag = child.tag.rsplit("}", 1)[-1]
                if tag == "tbl":
                    if self._small_table_header(child):
                        emitted_header = True
                    else:
                        self._process_table(child)
                    handled = True
                elif tag == "rect":
                    draw = child.find(f".//{_hp('drawText')}")
                    if draw is not None:
                        txt = _text_of(draw).strip()
                        norm = "".join(txt.split())
                        if txt and len(txt) <= 200 \
                                and norm not in self._seen_sections:
                            self._seen_sections.add(norm)
                            self._add_header(txt)
                            emitted_header = True
                            handled = True
                elif tag == "pic":
                    self.items.append(Item(label=PICTURE, text=""))
                elif tag == "equation":
                    script = child.find(f".//{_hp('script')}")
                    eq = ("".join(script.itertext()) if script is not None
                          else "")
                    if eq.strip():
                        self._add_paragraph(eq.strip())
                    handled = True
            if not handled:
                parts = ["".join(t.itertext())
                         for t in run.findall(f".//{_hp('t')}")]
                full = " ".join(parts).strip()
                if full:
                    body_texts.append(full)

        full_para = " ".join(body_texts).strip()
        if not full_para:
            return
        if emitted_header:
            for text in body_texts:
                self._add_paragraph(text)
            return

        # TOC candidate: tab + trailing page number stays a paragraph
        toc_candidate = (
            p.find(f".//{_hp('tab')}") is not None
            and re.search(r"\d+\s*$", full_para) is not None
        )
        if not toc_candidate and _HEADING_RE.match(full_para):
            norm = "".join(full_para.split())
            if norm not in self._seen_sections:
                self._seen_sections.add(norm)
                self._add_header(full_para)
                return
        if self._handle_list_symbol(full_para):
            return
        self._add_paragraph(full_para)


def extract_hwpx(data: bytes) -> ParseResult:
    """HWPX bytes → ordered extraction items (P13, partial)."""
    if not data:
        return ParseResult(items=[], status=STATUS_EMPTY)
    try:
        zf = zipfile.ZipFile(BytesIO(data))
        names = zf.namelist()
        sections = sorted(
            n for n in names
            if re.fullmatch(r"Contents/section\d+\.xml", n)
        )
        if not sections:
            return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                               error="not an HWPX: no Contents/sectionN.xml")
        walker = _HwpxWalker()
        for section in sorted(
                sections, key=lambda s: int(re.findall(r"\d+", s)[-1])):
            root = ET.fromstring(zf.read(section))
            for el in root:
                tag = el.tag.rsplit("}", 1)[-1]
                if tag == "p":
                    walker._process_paragraph(el)
        if not walker.items:
            return ParseResult(items=[], status=STATUS_EMPTY)
        return ParseResult(items=walker.items, status=STATUS_OK)
    except Exception as e:  # never raise across block boundaries
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error=f"{type(e).__name__}: {e}")
