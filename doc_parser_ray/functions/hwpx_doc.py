"""HWPX → document-tree parser with docling-compatible refs (P13 full).

Reimplements the observable behavior of the reference's
``HwpxDocumentBackend`` (/root/reference/docling/backend/xml/hwpx_backend.py:
28-1313) on stdlib ``zipfile`` + ``xml.etree``, building a light document
TREE (groups / headings / texts / tables / pictures with ``#/texts/N``-style
refs and parent links) instead of a flat item list, so the chunk-level
regression baselines of the reference (``genon/preprocessor/tests/
regression/baselines/hwpx_*.json``) can be reproduced through the
genos chunker port (``functions/genos_chunk.py``).

Behavioral quirks of the reference are reproduced deliberately — they are
load-bearing for baseline parity (reference cites):

  - the list stack is never cleared by ``_end_list`` (:1311-1313), so list
    groups created early keep collecting same-symbol items from later
    sections, which reorders them in the traversal;
  - small (1×1/1×2/1×3) decorated tables become headers; on a SECOND
    occurrence the run-scan dedup (:342) rejects them but the table
    processor re-admits them without a seen-check (:731-741), yielding
    duplicate heading items;
  - rect text boxes use tab-aware text in the run scan (:353) but RAW
    ``t.text`` in ``_process_rect`` (:1153);
  - table cell items are flushed in COLUMN-major order (:1062);
  - ``has_picture`` / ``nested_in_this`` leak from the last loop iteration
    (:999-1004, :1012-1015) — reproduced;
  - a paragraph inside a table cell whose pre-nested-table inline text is
    non-empty would crash the reference with UnboundLocalError
    (:462-467); we raise ``HwpxEmulationError`` to surface the same
    "cannot convert" outcome without a silent divergence.

Pictures are counted when the referenced ``BinData/<id>.<ext>`` exists for
the non-WMF extensions and its magic bytes look like a decodable image —
the env has no PIL, so magic sniffing stands in for ``Image.open``
(:198-218); the bytes themselves are not decoded.
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

_HP = "http://www.hancom.co.kr/hwpml/2011/paragraph"
_HC = "http://www.hancom.co.kr/hwpml/2011/core"


def _hp(tag: str) -> str:
    return f"{{{_HP}}}{tag}"


def _local(el) -> str:
    return el.tag.rsplit("}", 1)[-1]


class HwpxEmulationError(Exception):
    """Raised where the reference backend would crash (documented)."""


# --------------------------------------------------------------- tree


class Node:
    __slots__ = ("kind", "label", "text", "level", "ref", "parent",
                 "children", "data", "bin_name")

    def __init__(self, kind, label=None, text=None, level=None, ref=None,
                 parent=None, data=None, bin_name=None):
        self.kind = kind          # "group" | "text" | "table" | "picture"
        self.label = label        # paragraph/section_header/caption/formula
        self.text = text
        self.level = level
        self.ref = ref
        self.parent = parent
        self.children = []
        self.data = data          # table: (num_rows, num_cols, cells)
        self.bin_name = bin_name  # picture: BinData member name


class TableCellData:
    __slots__ = ("text", "row_span", "col_span", "start_row", "end_row",
                 "start_col", "end_col", "column_header")

    def __init__(self, text, row_span, col_span, start_row, end_row,
                 start_col, end_col, column_header):
        self.text = text
        self.row_span = row_span
        self.col_span = col_span
        self.start_row = start_row
        self.end_row = end_row
        self.start_col = start_col
        self.end_col = end_col
        self.column_header = column_header


class HwpxDoc:
    """Minimal docling-document analog: ref arrays + a body tree."""

    def __init__(self):
        self.body = Node("group", label="body")
        self.texts: list[Node] = []
        self.tables: list[Node] = []
        self.pictures: list[Node] = []
        self.groups: list[Node] = []
        self.num_pages = 1

    def _attach(self, node: Node, parent: Node | None) -> Node:
        parent = parent if parent is not None else self.body
        node.parent = parent
        parent.children.append(node)
        return node

    def add_group(self, parent=None, label="section", name=None) -> Node:
        node = Node("group", label=label)
        node.ref = f"#/groups/{len(self.groups)}"
        self.groups.append(node)
        return self._attach(node, parent)

    def add_heading(self, parent=None, text="", level=1) -> Node:
        node = Node("text", label="section_header", text=text, level=level)
        node.ref = f"#/texts/{len(self.texts)}"
        self.texts.append(node)
        return self._attach(node, parent)

    def add_text(self, label, text, parent=None) -> Node:
        node = Node("text", label=label, text=text)
        node.ref = f"#/texts/{len(self.texts)}"
        self.texts.append(node)
        return self._attach(node, parent)

    def add_table(self, data, parent=None) -> Node:
        node = Node("table", label="table", data=data)
        node.ref = f"#/tables/{len(self.tables)}"
        self.tables.append(node)
        return self._attach(node, parent)

    def add_picture(self, parent=None, bin_name=None) -> Node:
        node = Node("picture", label="picture", bin_name=bin_name)
        node.ref = f"#/pictures/{len(self.pictures)}"
        self.pictures.append(node)
        return self._attach(node, parent)

    def iterate_items(self):
        """Preorder DFS over the body tree (docling iterate_items shape);
        yields every node, group or item — callers filter."""
        stack = list(reversed(self.body.children))
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))


def export_table_html(table: Node) -> str:
    """docling_core ``TableItem.export_to_html`` emulation: resolve the
    cell list onto a grid, emit each cell once at its start position as
    ``th`` (column headers) / ``td`` with row/colspan attrs; grid gaps
    become empty ``<td>``. Matches the baseline vectors' table HTML."""
    num_rows, num_cols, cells = table.data
    grid: list[list[TableCellData | None]] = [
        [None] * num_cols for _ in range(num_rows)
    ]
    for cell in cells:
        for r in range(cell.start_row, min(cell.end_row, num_rows)):
            for c in range(cell.start_col, min(cell.end_col, num_cols)):
                if grid[r][c] is None:
                    grid[r][c] = cell
    parts = ["<table><tbody>"]
    for i in range(num_rows):
        parts.append("<tr>")
        for j in range(num_cols):
            cell = grid[i][j]
            if cell is None:
                parts.append("<td></td>")
                continue
            if cell.start_row != i or cell.start_col != j:
                continue
            attrs = ""
            if cell.row_span > 1:
                attrs += f' rowspan="{cell.row_span}"'
            if cell.col_span > 1:
                attrs += f' colspan="{cell.col_span}"'
            tag = "th" if cell.column_header else "td"
            parts.append(f"<{tag}{attrs}>{cell.text.strip()}</{tag}>")
        parts.append("</tr>")
    parts.append("</tbody></table>")
    return "".join(parts)


# -------------------------------------------------------------- walker


_HEADING_FULL_RE = re.compile(r"^(?:\d+\.\s+|[ⅠⅡⅢⅣⅤⅥⅦⅧⅨⅩ]+\.\s*)")
_HEADING_FINAL_RE = re.compile(r"^(?:\d+|[ⅠⅡⅢⅣⅤⅥⅦⅧⅨⅩ]+)\.\s+")
_COMMENT_RE = re.compile(r"^\s*(?:(?:주|자료)\s*[:：]|\*)")
_SYMBOL_LEVEL = {"□": 0, "o": 1, "-": 2, "*": 2}

_IMAGE_MAGIC = (
    (b"BM", "bmp"), (b"\x89PNG", "png"), (b"\xff\xd8", "jpg"),
    (b"II*\x00", "tif"), (b"MM\x00*", "tif"),
)


def _jpeg_n_components(raw: bytes) -> int | None:
    """Component count from the JPEG SOF marker (4 → CMYK)."""
    import struct
    i = 2
    while i < len(raw) - 9:
        if raw[i] != 0xFF:
            i += 1
            continue
        marker = raw[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", raw[i + 2:i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return raw[i + 9]
        i += 2 + seglen
    return None


def _looks_like_image(data: bytes) -> bool:
    """Stand-in for the reference's PIL open + PNG re-encode
    (``ImageRef.from_pil``, :236-240): basic magic check, plus the one
    re-encode failure PIL actually hits — CMYK JPEGs (4 SOF components)
    raise ``OSError: cannot write mode CMYK as PNG`` there, so the
    reference silently drops them."""
    if not any(data.startswith(m) for m, _ in _IMAGE_MAGIC):
        return False
    if data.startswith(b"\xff\xd8") and _jpeg_n_components(data) == 4:
        return False
    return True


class _Walker:
    def __init__(self, zf: zipfile.ZipFile, save_images: bool = True):
        self.zf = zf
        self.zip_names = set(zf.namelist())
        self.save_images = save_images
        self.doc = HwpxDoc()
        self.parents: dict[int, Node | None] = {i: None for i in range(-1, 10)}
        self.max_levels = 10
        self.seen: set[str] = set()
        self.list_stack: list[tuple[Node, int]] = []
        self.current_list_group: Node | None = None
        self.current_list_item: Node | None = None
        self.ancestry: dict[int, ET.Element] = {}  # id(child) -> parent

    # ---------------------------------------------------------- helpers

    def _index_section(self, root: ET.Element) -> None:
        for parent in root.iter():
            for child in parent:
                self.ancestry[id(child)] = parent

    def _ancestor_locals(self, el: ET.Element) -> list[str]:
        out = []
        cur = self.ancestry.get(id(el))
        while cur is not None:
            out.append(_local(cur))
            cur = self.ancestry.get(id(cur))
        return out

    @staticmethod
    def _extract_text(el: ET.Element) -> str:
        """hwpx_backend.py:65-76 — hp:t text with tab/fwSpace/linesegarray
        rendered as one space, inline tails kept, stripped."""
        parts = []
        if el.text:
            parts.append(el.text)
        for inline in el:
            if _local(inline) in ("tab", "fwSpace", "linesegarray"):
                parts.append(" ")
            if inline.tail:
                parts.append(inline.tail)
        return "".join(parts).strip()

    @staticmethod
    def _is_toc_numbered_entry(el: ET.Element) -> bool:
        """:95-113 — direct hp:tab child whose tail starts with digits."""
        for tab in el.findall(_hp("tab")):
            tail = (tab.tail or "").lstrip()
            if re.match(r"^\d+", tail):
                return True
        return False

    def _end_list(self) -> None:
        """:1311-1313 — clears only the current group; the list STACK
        survives (quirk, see module docstring)."""
        self.current_list_group = None

    def _add_header(self, level: int, text: str) -> None:
        """:1283-1309 — fill missing ancestor groups, clear deeper
        levels, attach the heading under parents[level-1]."""
        for lvl in range(0, level):
            if self.parents.get(lvl) is None:
                self.parents[lvl] = self.doc.add_group(
                    parent=self.parents[lvl - 1] if lvl - 1 >= 0 else None,
                    name=f"header-{lvl}")
        for lvl in range(level, self.max_levels):
            self.parents[lvl] = None
        parent_node = self.parents[level - 1] if level - 1 >= 0 else None
        self.parents[level] = self.doc.add_heading(
            parent=parent_node, text=text, level=level)

    def _handle_list_symbol(self, txt: str) -> bool:
        """:115-162 — symbol-keyed nested list groups; items carry the
        PARAGRAPH label (the reference never uses list_item here)."""
        if not txt or txt[0] not in _SYMBOL_LEVEL:
            return False
        level = _SYMBOL_LEVEL[txt[0]]
        while self.list_stack and self.list_stack[-1][1] >= level:
            self.list_stack.pop()
        parent_group = (self.list_stack[-1][0] if self.list_stack
                        else self.current_section_group)
        new_group = self.doc.add_group(parent=parent_group, label="list",
                                       name="ul")
        self.list_stack.append((new_group, level))
        self.doc.add_text("paragraph", txt, parent=new_group)
        return True

    def _picture_bin_name(self, pic_elem: ET.Element) -> str | None:
        """:198-240 — resolve binaryItemIDRef to a decodable BinData
        member (non-WMF extensions; magic sniff stands in for PIL)."""
        img = pic_elem.find(f"{{{_HC}}}img")
        if img is None:
            return None
        bin_id = img.get("binaryItemIDRef")
        if not bin_id:
            return None
        for ext in (".bmp", ".png", ".jpg", ".jpeg", ".tif"):
            name = f"BinData/{bin_id}{ext}"
            if name in self.zip_names:
                if _looks_like_image(self.zf.read(name)):
                    return name
                return None
        return None

    def _process_picture(self, pic_elem: ET.Element) -> None:
        """:1221-1270."""
        if not self.save_images:
            return
        parent = self.current_list_item or self.current_section_group
        name = self._picture_bin_name(pic_elem)
        if name is None:
            return
        self.doc.add_picture(parent=parent, bin_name=name)

    def _process_equation(self, eq_elem: ET.Element) -> None:
        """:1272-1281."""
        parent = self.current_list_item or self.current_section_group
        formula = "".join(eq_elem.itertext()).strip()
        self.doc.add_text("formula", formula, parent=parent)

    def _process_rect(self, rect_elem: ET.Element) -> None:
        """:1147-1171 — RAW t.text (no tab handling) here, unlike the
        run-scan path."""
        draw = rect_elem.find(f".//{_hp('drawText')}")
        if draw is None:
            return
        full = "".join(t.text for t in draw.findall(f".//{_hp('t')}")
                       if t.text).strip()
        if not full:
            return
        if len(full) <= 100:
            self.seen.add("".join(full.split()))
            self._end_list()
            self._add_header(1, full)
            self.current_section_group = self.parents[1]
            return
        for p in draw.findall(f".//{_hp('p')}"):
            self._process_paragraph(p)

    # -------------------------------------------------------- paragraph

    def _process_paragraph(self, p_elem: ET.Element) -> None:
        """:288-669 — the full multi-stage pipeline, stage for stage."""
        has_secpr = p_elem.find(f".//{_hp('secPr')}") is not None
        has_text = p_elem.find(f".//{_hp('run')}/{_hp('t')}") is not None
        if has_secpr and not has_text:
            return

        ancestors = self._ancestor_locals(p_elem)
        runs = p_elem.findall(f"./{_hp('run')}")

        valid_runs: list[ET.Element] = []
        run_texts: dict[int, str] = {}
        for run in runs:
            if run.find(f".//{_hp('t')}") is None:
                continue
            parts = [self._extract_text(t0)
                     for t0 in run.findall(f".//{_hp('t')}")]
            valid_runs.append(run)
            run_texts[len(valid_runs) - 1] = " ".join(parts).strip()

        any_header_added = False
        header_runs: set[int] = set()

        # stage 2 (:319-374): per-run header scan (small tables / rects)
        for idx, run in enumerate(valid_runs):
            header_text = None
            norm_text = None
            for child in run:
                tag = _local(child)
                if tag == "tbl" and not self._is_toc_numbered_entry(child):
                    rc = child.get("rowCnt")
                    trs = child.findall(_hp("tr"))
                    rows = int(rc) if rc is not None else len(trs)
                    cc = child.get("colCnt")
                    cols = (int(cc) if cc is not None
                            else len(trs[0].findall(_hp("tc"))))
                    if (rows, cols) in ((1, 1), (1, 2), (1, 3)):
                        parts = [self._extract_text(t0) for t0 in
                                 child.findall(f".//{_hp('t')}")]
                        txt = " ".join(parts).strip()
                        norm = "".join(txt.split())
                        if txt and len(txt) <= 200 and norm not in self.seen:
                            header_text, norm_text = txt, norm
                            break
                elif tag == "rect":
                    draw = child.find(f".//{_hp('drawText')}")
                    if draw is None:
                        break
                    parts = [self._extract_text(t0) for t0 in
                             draw.findall(f".//{_hp('t')}")]
                    full = "".join(parts).strip()
                    norm = "".join(full.split())
                    if not full:
                        continue
                    if len(full) <= 200 and norm not in self.seen:
                        header_text, norm_text = full, norm
                        break
            if header_text is not None:
                self.seen.add(norm_text)
                self._end_list()
                self._add_header(1, header_text)
                self.current_section_group = self.parents[1]
                any_header_added = True
                header_runs.add(idx)

        # stage 3 (:376-391): header emitted → leftover run texts become
        # paragraphs under the (new) section group
        if any_header_added:
            for idx, text in run_texts.items():
                if idx not in header_runs and text:
                    self.doc.add_text("paragraph", text,
                                      parent=self.current_section_group)
            return

        if "drawText" in ancestors:  # :393-395
            return

        full_para = " ".join(
            self._extract_text(t)
            for run in p_elem.findall(_hp("run"))
            for t in run.findall(_hp("t"))
        )
        toc_candidate = bool(
            p_elem.findall(f".//{_hp('tab')}")
            and re.search(r"\d+\s*$", full_para)
        )
        if not toc_candidate and _HEADING_FULL_RE.match(full_para.strip()):
            # :429-439 — no seen-CHECK (duplicates intended)
            self.seen.add("".join(full_para.split()))
            self._end_list()
            self._add_header(1, full_para)
            self.current_section_group = self.parents[1]
            return

        # stage "2) cell-internal nested table" (:441-538)
        if "tc" in ancestors:
            runs2 = p_elem.findall(_hp("run"))
            inlines = [(ri, inline) for ri, run in enumerate(runs2)
                       for inline in run]
            nested_idx = next(
                (i for i, (_, el) in enumerate(inlines)
                 if _local(el) == "tbl"), None)
            if nested_idx is not None:
                for _, el in inlines[:nested_idx]:
                    tag = _local(el)
                    if tag == "t":
                        txt = self._extract_text(el).strip()
                        if not txt and not self._is_toc_numbered_entry(el):
                            continue
                        # the reference hits UnboundLocalError here
                        # (:466 uses final_text before assignment)
                        raise HwpxEmulationError(
                            "non-empty text before a nested cell table "
                            "(reference backend would crash here)")
                    elif tag == "pic":
                        self._process_picture(el)
                    elif tag == "rect":
                        self._process_rect(el)
                    elif tag == "equation":
                        self._process_equation(el)
                _, tbl_el = inlines[nested_idx]
                self._process_table(tbl_el)
                parent_node = (self.current_list_item
                               or self.current_section_group)
                for _, el in inlines[nested_idx + 1:]:
                    tag = _local(el)
                    if tag == "t":
                        txt = self._extract_text(el).strip()
                        if txt:
                            self.doc.add_text("paragraph", txt,
                                              parent=parent_node)
                    elif tag == "pic":
                        self._process_picture(el)
                    elif tag == "rect":
                        self._process_rect(el)
                    elif tag == "equation":
                        self._process_equation(el)
                if self.current_list_group and self.current_list_item is None:
                    self._end_list()
                return

        # stage 4 (:540-669): flattened accumulation over DESCENDANT runs
        parent_node = self.current_list_item or self.current_section_group
        text_buffer = ""
        children = [c for run in p_elem.findall(f".//{_hp('run')}")
                    for c in run]
        seen_ids: set[int] = set()
        for child in children:
            cid = id(child)
            if cid in seen_ids:
                continue
            seen_ids.add(cid)
            tag = _local(child)
            if tag == "t":
                text_buffer += child.text or ""
                for inline in child:
                    if _local(inline) in ("tab", "fwSpace", "lineBreak"):
                        text_buffer += " "
                    if inline.tail:
                        text_buffer += inline.tail
            if tag == "tbl":
                if text_buffer.strip():
                    self.doc.add_text("paragraph", text_buffer.rstrip(),
                                      parent=parent_node)
                    text_buffer = ""
                self._process_table(child)
                for desc in child.iter():
                    seen_ids.add(id(desc))
            elif tag == "rect":
                if text_buffer.strip():
                    self.doc.add_text("paragraph", text_buffer.rstrip(),
                                      parent=parent_node)
                    text_buffer = ""
                self._process_rect(child)
                if child.tail:
                    text_buffer += child.tail
            elif tag == "pic":
                if text_buffer.strip():
                    self.doc.add_text("paragraph", text_buffer.rstrip(),
                                      parent=parent_node)
                    text_buffer = ""
                self._process_picture(child)
                if child.tail:
                    text_buffer += child.tail
            elif tag == "equation":
                self._process_equation(child)
                if child.tail:
                    text_buffer += child.tail

        final_text = text_buffer.rstrip()
        if final_text.startswith("<참고"):  # :633-645
            self.doc.add_text("paragraph", final_text,
                              parent=self.current_section_group)
            return
        if self._handle_list_symbol(final_text):
            return
        if final_text:
            if _HEADING_FINAL_RE.match(final_text):  # :652-658
                self.seen.add("".join(final_text.split()))
                self._end_list()
                self._add_header(1, final_text)
                self.current_section_group = self.parents[1]
                return
            self.doc.add_text("paragraph", final_text,
                              parent=self.current_section_group)

    # ----------------------------------------------------------- table

    def _process_table(self, tbl_elem: ET.Element) -> None:
        """:672-1145."""
        # TOC table (:674-698)
        for t in tbl_elem.findall(f".//{_hp('t')}"):
            if self._is_toc_numbered_entry(t):
                for p in tbl_elem.findall(f".//{_hp('p')}"):
                    parts = []
                    for run in p.findall(_hp("run")):
                        t0 = run.find(_hp("t"))
                        if t0 is None:
                            continue
                        parts.append(self._extract_text(t0))
                    full = " ".join(parts).strip()
                    if full:
                        self.doc.add_text(
                            "paragraph", full,
                            parent=self.current_section_group)
                return

        try:
            num_rows = int(tbl_elem.get("rowCnt", "0"))
            num_cols = int(tbl_elem.get("colCnt", "0"))
        except ValueError:
            trs = tbl_elem.findall(_hp("tr"))
            num_rows = len(trs)
            num_cols = (len(trs[0].findall(_hp("tc"))) if trs else 0)

        parent = self.current_list_item or self.current_section_group

        # 1×1 special (:713-741)
        if (num_rows, num_cols) == (1, 1):
            parts = [self._extract_text(t0)
                     for t0 in tbl_elem.findall(f".//{_hp('t')}")]
            txt = " ".join(parts).strip()
            has_pic = bool(tbl_elem.findall(f".//{_hp('pic')}"))
            nested_tbl = len(tbl_elem.findall(f".//{_hp('tbl')}")) > 1
            if txt and has_pic and len(txt) <= 50 and not nested_tbl:
                self._process_paragraph(tbl_elem)
                return
            norm = "".join(txt.split())
            if txt and len(txt) <= 200 and norm != "여백":
                # no seen-check (:733) — duplicate headers intended
                self.seen.add(norm)
                self._end_list()
                self._add_header(1, txt)
                self.current_section_group = self.parents[1]
                return

        # 1×2 / 1×3 header (:744-763) — "".join here, no seen-check
        if (num_rows, num_cols) in ((1, 2), (1, 3)):
            parts = [self._extract_text(t0)
                     for t0 in tbl_elem.findall(f".//{_hp('t')}")]
            txt = "".join(parts).strip()
            if txt and len(txt) <= 200:
                self.seen.add("".join(txt.split()))
                self._end_list()
                self._add_header(1, txt)
                self.current_section_group = self.parents[1]
                return

        cells: list[TableCellData] = []
        occupied = [[False] * num_cols for _ in range(num_rows)]
        cell_items: dict[tuple[int, int], list] = {}
        skip_caption: set[tuple[int, int]] = set()
        rows = tbl_elem.findall(_hp("tr"))
        has_top_title = False
        c = 0  # leaks out of the loop, as in the reference (:1002)
        nested_in_this = False  # same leak (:1015)

        for r_idx, tr in enumerate(rows):
            tcs = tr.findall(_hp("tc"))
            num_tcs_curr_row = len(tcs)
            for tc in tcs:
                addr = tc.find(_hp("cellAddr"))
                span = tc.find(_hp("cellSpan"))
                if addr is None or span is None:
                    continue
                r = int(addr.get("rowAddr"))
                c = int(addr.get("colAddr"))
                rs = int(span.get("rowSpan"))
                cs = int(span.get("colSpan"))
                if occupied[r][c]:
                    continue
                for rr in range(r, r + rs):
                    for cc2 in range(c, c + cs):
                        occupied[rr][cc2] = True

                # caption replicated over a picture row (:800-833)
                if num_tcs_curr_row == 1 and r_idx + 1 < len(rows):
                    next_row_tcs = rows[r_idx + 1].findall(_hp("tc"))
                    if len(next_row_tcs) >= 2:
                        next_has_pic = any(
                            tc2.findall(f".//{_hp('pic')}")
                            for tc2 in next_row_tcs)
                        if next_has_pic:
                            cap = "".join(
                                self._extract_text(t0) for t0 in
                                tc.findall(f".//{_hp('t')}")).strip()
                            norm_cap = re.sub(r"\s+", "", cap)
                            if cap and norm_cap not in self.seen:
                                self.seen.add(norm_cap)
                                for tc2 in next_row_tcs:
                                    addr2 = tc2.find(_hp("cellAddr"))
                                    if addr2 is None:
                                        continue
                                    key2 = (int(addr2.get("rowAddr")),
                                            int(addr2.get("colAddr")))
                                    cell_items.setdefault(key2, []).append(
                                        ("caption", cap))
                            continue

                nested_in_this = bool(tc.findall(f".//{_hp('tbl')}"))
                if (r, c) in skip_caption:
                    continue

                # caption cell above nested table / picture (:839-887)
                next_nested = next_pic = False
                if r_idx + rs < len(rows):
                    for tc2 in rows[r_idx + rs].findall(_hp("tc")):
                        addr2 = tc2.find(_hp("cellAddr"))
                        if addr2 is None:
                            continue
                        if int(addr2.get("colAddr")) == c:
                            if tc2.findall(f".//{_hp('tbl')}"):
                                next_nested = True
                            if tc2.findall(f".//{_hp('pic')}"):
                                next_pic = True
                if not nested_in_this and (next_nested or next_pic):
                    if 0 <= r_idx - 1 < len(rows):
                        prev = rows[r_idx - 1].findall(_hp("tc"))
                        cell_texts = ["".join(x.itertext()).strip()
                                      for x in prev]
                        if cell_texts and len(set(cell_texts)) == 1:
                            toptitle = cell_texts[0]
                            if not _COMMENT_RE.match(toptitle):
                                norm_tt = re.sub(r"\s+", "", toptitle)
                                if norm_tt not in self.seen:
                                    cell_items.setdefault(
                                        (r - 1, c), []).append(
                                        ("top_caption", toptitle))
                                    skip_caption.add((r - 1, c))
                                    has_top_title = True
                    title = "".join(
                        self._extract_text(t) for t in
                        tc.findall(f".//{_hp('t')}")).strip()
                    cell_items.setdefault((r, c), []).append(
                        ("caption", title))
                    continue

                # nested table cell (:890-898)
                if nested_in_this:
                    for p in tc.findall(f"./{_hp('subList')}/{_hp('p')}"):
                        tbl = p.find(f".//{_hp('tbl')}")
                        if tbl is not None:
                            cell_items.setdefault((r, c), []).append(
                                ("table", tbl))
                        else:
                            cell_items.setdefault((r, c), []).append(
                                ("paragraph", p))
                    continue

                # picture cell (:900-922)
                if tc.findall(f".//{_hp('pic')}"):
                    for p in tc.findall(f"./{_hp('subList')}/{_hp('p')}"):
                        t_el = p.find(f".//{_hp('t')}")
                        pic_el = p.find(f".//{_hp('pic')}")
                        if t_el is not None and \
                                self._extract_text(t_el).strip():
                            cell_items.setdefault((r, c), []).append(
                                ("paragraph", p))
                        if pic_el is not None:
                            name = self._picture_bin_name(pic_el)
                            cell_items.setdefault((r, c), []).append(
                                ("picture", name))
                    continue

                # comment cell (:924-966)
                texts = [
                    "".join(self._extract_text(t)
                            for t in p.findall(f".//{_hp('t')}"))
                    for p in tc.findall(f".//{_hp('p')}")
                ]
                txt = " ".join(filter(None, texts)).strip()
                if _COMMENT_RE.match(txt):
                    prev_row_tcs = (rows[r_idx - 1].findall(_hp("tc"))
                                    if r_idx - 1 >= 0 else [])
                    if num_tcs_curr_row == 1 and len(prev_row_tcs) >= 2:
                        prev_has_pic = any(
                            ptc.findall(f".//{_hp('pic')}")
                            for ptc in prev_row_tcs)
                        if prev_has_pic:
                            if cs > 1:
                                cell_items.setdefault((r, c + 1), []).append(
                                    ("comment", txt))
                            cell_items.setdefault((r, c), []).append(
                                ("comment", txt))
                            continue
                    cell_items.setdefault((r, c), []).append(
                        ("comment", txt))
                    continue

                # pure data cell (:968-991)
                parts = [self._extract_text(t)
                         for p in tc.findall(f".//{_hp('p')}")
                         for t in p.findall(f".//{_hp('t')}")]
                cell_text = "\n".join(parts).strip()
                if len(cell_text) > 200:
                    for sub_p in tc.findall(f".//{_hp('p')}"):
                        cell_items.setdefault((r, c), []).append(
                            ("paragraph", sub_p))
                    continue
                cells.append(TableCellData(
                    text=cell_text, row_span=rs, col_span=cs,
                    start_row=r, end_row=r + rs, start_col=c,
                    end_col=c + cs, column_header=(r == 0)))

        has_table = any(typ == "table" for items in cell_items.values()
                        for typ, _ in items)
        has_picture = any(
            typ == "picture"
            for (ri, ci), items in cell_items.items() if ci == c
            for typ, _ in items)  # column filter leaks `c` (:999-1004)
        has_comment = any(typ == "comment" for items in cell_items.values()
                          for typ, _ in items)

        # table-with-trailing-comments (:1011-1058)
        if not has_table and has_comment and not has_picture \
                and not nested_in_this:
            if any(cell.text for cell in cells):
                self.doc.add_table(
                    (num_rows, num_cols, list(cells)), parent=parent)
                for items in cell_items.values():
                    for typ, payload in items:
                        if typ == "comment":
                            self.doc.add_text("caption", payload,
                                              parent=parent)
                cells.clear()
                for key in list(cell_items.keys()):
                    kept = [(t2, p2) for t2, p2 in cell_items[key]
                            if t2 != "comment"]
                    if kept:
                        cell_items[key] = kept
                    else:
                        del cell_items[key]

        # flush cell items COLUMN-major (:1062-1126)
        for key in sorted(cell_items.keys(), key=lambda x: (x[1], x[0])):
            for typ, payload in cell_items[key]:
                if typ == "top_caption":
                    if re.sub(r"\s+", "", payload) in self.seen:
                        continue
                    self.doc.add_text("paragraph", payload,
                                      parent=self.current_section_group)
                elif typ == "caption":
                    parent = self.current_section_group
                    if _HEADING_FULL_RE.match(payload):
                        self.seen.add("".join(payload.split()))
                        self._end_list()
                        self._add_header(1, payload)
                        self.current_section_group = self.parents[1]
                        continue
                    self.doc.add_text("paragraph", payload, parent=parent)
                elif typ == "paragraph":
                    self._process_paragraph(payload)
                elif typ == "table":
                    self._process_table(payload)
                elif typ == "picture":
                    if not self.save_images or payload is None:
                        continue
                    self.doc.add_picture(parent=parent, bin_name=payload)
                elif typ == "comment":
                    self.doc.add_text("caption", payload, parent=parent)

        if not any(cell.text for cell in cells) or has_top_title:
            return
        self.doc.add_table((num_rows, num_cols, cells),
                           parent=self.current_section_group)

    # --------------------------------------------------------- convert

    def convert(self) -> HwpxDoc:
        root_group = self.doc.add_group(parent=None, name="root")
        self.parents[0] = root_group
        self.current_section_group = root_group
        section_index = 0
        while True:
            path = f"Contents/section{section_index}.xml"
            if path not in self.zip_names:
                break
            root = ET.fromstring(self.zf.read(path))
            self._index_section(root)
            for el in root:
                if _local(el) == "p":
                    self._process_paragraph(el)
            section_index += 1
        self._end_list()
        return self.doc


def parse_hwpx_tree(data: bytes, save_images: bool = True) -> HwpxDoc:
    """HWPX bytes → HwpxDoc tree (raises on invalid input — callers that
    need a ParseResult use ``hwpx_extract.extract_hwpx``)."""
    zf = zipfile.ZipFile(BytesIO(data))
    if "Contents/section0.xml" not in zf.namelist():
        raise ValueError("not an HWPX: no Contents/section0.xml")
    return _Walker(zf, save_images=save_images).convert()
