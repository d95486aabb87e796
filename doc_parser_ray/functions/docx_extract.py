"""DOCX (OOXML) main-content extraction — from-scratch reimplementation
of the observable semantics of the reference's ``MsWordDocumentBackend``
(/root/reference/docling/backend/msword_backend.py:40-1163, python-docx
based). Built on stdlib ``zipfile`` + ``xml.etree`` only — no native
binaries, no python-docx — so it stays picklable and cheap in Ray tasks.

Semantics reproduced (reference file:line cites):
  - linear walk of ``word/document.xml`` body children: w:p, w:tbl,
    w:sdt containers, drawings with a:blip → picture (":168-279");
  - style resolution via ``word/styles.xml``: style id / name /
    basedOn chain; any of them containing "heading" yields the
    ("Heading", level) pair via the split-text-and-number rule
    (":291-365");
  - Title style resets the whole parent stack (":753-759"); headings
    maintain a level hierarchy with implicit section groups on level
    jumps and tail trimming on level drops (":861-895");
  - numbered-heading styles (w:numPr in the style or paragraph XML)
    get hierarchical "2.1.3 "-style prefixes with MSWord's
    no-empty-sublevel convention (":896-921");
  - paragraph runs grouped by (bold, italic, underline) formatting,
    whitespace-only runs merging into the current group; hyperlinks
    resolved through document.xml.rels and emitted immediately
    (":381-436"); formatting/links surface only in the markdown
    export (``Item.md_text``), plain item text stays clean;
  - lists via w:numPr numId/ilvl with the reference's open/indent/
    close state machine incl. its fall-through case where a new numId
    at a different indent level emits nothing (":967-1060");
  - tables: grid reconstruction honoring w:gridSpan and w:vMerge
    (merged cells repeat their text, matching docling's offset-based
    grid export); a 1x1 table is unwrapped and its cell content walked
    as body (":1061-1123");
  - textbox content (w:txbxContent / v:textbox) extracted per
    container in position order with (text, position) dedup
    (":508-633");
  - pictures → placeholder items (no image bytes decoded) (":1125-1163").

OMML equations convert to LaTeX through the stdlib port in
``functions/omml.py`` and follow the reference's standalone/inline
assembly (":634-683", ":771-812") — equations.docx is byte-exact.
``dedup_lines=True`` applies the genos-variant adjacent-duplicate
suppression (genos_msword_backend.py:1225-1240, invariant tested by
genon/preprocessor/tests/unit/test_no_duplicate_lines_docx.py).
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

from doc_parser_ray.datamodel import (
    BODY,
    FORMULA,
    LIST_ITEM,
    PICTURE,
    SECTION_HEADER,
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_ERROR,
    TABLE,
    TEXT,
    TITLE,
    Item,
    ParseResult,
)

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_M = "http://schemas.openxmlformats.org/officeDocument/2006/math"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_V = "urn:schemas-microsoft-com:vml"
_REL = "http://schemas.openxmlformats.org/package/2006/relationships"


def _w(tag: str) -> str:
    return f"{{{_W}}}{tag}"


def _a(tag: str) -> str:
    return f"{{{_A}}}{tag}"


def _m(tag: str) -> str:
    return f"{{{_M}}}{tag}"


_FALSY = {"false", "0", "none"}


def _esc_md(t: str) -> str:
    # the canonical serializer escaping (incl. angle brackets)
    from doc_parser_ray.functions.export import esc_md_prose

    return esc_md_prose(t)


def _split_text_and_number(s: str) -> list[str]:
    """msword_backend.py:291-297 verbatim."""
    m = re.match(r"(\D+)(\d+)$|^(\d+)(\D+)", s)
    if m:
        return [p for p in m.groups() if p]
    return [s]


def _str_to_int(s, default=0):
    if s is None:
        return None
    try:
        return int(s)
    except ValueError:
        return default


def _get_heading_and_level(style_label: str):
    """msword_backend.py:318-333 verbatim."""
    parts = _split_text_and_number(style_label)
    if len(parts) == 2:
        parts.sort()
        label_str = ""
        label_level = 0
        if parts[0].strip().lower() == "heading":
            label_str = "Heading"
            label_level = _str_to_int(parts[1], None)
        if parts[1].strip().lower() == "heading":
            label_str = "Heading"
            label_level = _str_to_int(parts[0], None)
        return label_str, label_level
    return style_label, None


def _pathify(addr: str) -> str:
    """Replicates the reference's ``Path(address)`` normalization of
    hyperlink targets (msword_backend.py:393): duplicate slashes
    collapse, trailing slash drops, empty → '.'."""
    if not addr:
        return "."
    s = re.sub(r"/{2,}", "/", addr)
    if len(s) > 1:
        s = s.rstrip("/")
    return s or "."


class _Styles:
    """word/styles.xml lookup: id → (name, basedOn, has w:numPr)."""

    def __init__(self, styles_xml: bytes | None):
        self.by_id: dict[str, dict] = {}
        self.default_para = "Normal"
        if not styles_xml:
            return
        try:
            root = ET.fromstring(styles_xml)
        except ET.ParseError:
            return
        for st in root.iter(_w("style")):
            sid = st.get(_w("styleId"))
            if not sid:
                continue
            name_el = st.find(_w("name"))
            based_el = st.find(_w("basedOn"))
            self.by_id[sid] = {
                "name": (name_el.get(_w("val")) if name_el is not None
                         else ""),
                "basedOn": (based_el.get(_w("val")) if based_el is not None
                            else None),
                "has_numpr": st.find(f".//{_w('numPr')}") is not None,
            }
            if (st.get(_w("type")) == "paragraph"
                    and st.get(_w("default")) in ("1", "true")):
                self.default_para = sid

    def label_and_level(self, style_id: str | None):
        """msword_backend.py:335-365 (_get_label_and_level)."""
        if style_id is None:
            style_id = self.default_para
        info = self.by_id.get(style_id, {})
        label = style_id
        name = info.get("name", "") or ""
        base_label = info.get("basedOn")
        base_name = ""
        if base_label:
            base_name = self.by_id.get(base_label, {}).get("name", "") or ""

        if ":" in label:
            parts = label.split(":")
            if len(parts) == 2:
                return parts[0], _str_to_int(parts[1], None)
        if "heading" in label.lower():
            return _get_heading_and_level(label)
        if "heading" in name.lower():
            return _get_heading_and_level(name)
        if base_label and "heading" in base_label.lower():
            return _get_heading_and_level(base_label)
        if base_name and "heading" in base_name.lower():
            return _get_heading_and_level(base_name)
        return label, None

    def has_numpr(self, style_id: str | None) -> bool:
        return bool(self.by_id.get(style_id or "", {}).get("has_numpr"))


def _parse_rels(rels_xml: bytes | None) -> dict[str, str]:
    out: dict[str, str] = {}
    if not rels_xml:
        return out
    try:
        root = ET.fromstring(rels_xml)
    except ET.ParseError:
        return out
    for rel in root.iter(f"{{{_REL}}}Relationship"):
        rid, target = rel.get("Id"), rel.get("Target")
        if rid and target:
            out[rid] = target
    return out


def _run_format(r) -> tuple[bool, bool, bool]:
    """(bold, italic, underline) — msword_backend.py:367-380."""
    rpr = r.find(_w("rPr"))
    if rpr is None:
        return (False, False, False)

    def flag(tag: str) -> bool:
        el = rpr.find(_w(tag))
        if el is None:
            return False
        val = el.get(_w("val"))
        return val is None or val.lower() not in _FALSY

    u_el = rpr.find(_w("u"))
    underline = False
    if u_el is not None:
        uval = u_el.get(_w("val"))
        underline = uval is None or uval.lower() not in _FALSY
    return (flag("b"), flag("i"), underline)


def _run_text(r) -> str:
    """python-docx Run.text analog: direct w:t / w:tab / w:br / w:cr."""
    parts: list[str] = []
    for child in r:
        tag = child.tag
        if tag == _w("t"):
            parts.append(child.text or "")
        elif tag == _w("tab"):
            parts.append("\t")
        elif tag in (_w("br"), _w("cr")):
            parts.append("\n")
    return "".join(parts)


class _Walker:
    """Stateful linear body walker (msword_backend state machine)."""

    MAX_LEVELS = 10

    def __init__(self, styles: _Styles, rels: dict[str, str],
                 dedup_lines: bool = False, media=None):
        self.styles = styles
        self.rels = rels
        self.dedup_lines = dedup_lines
        self.media = media or (lambda rel_id: None)
        self._content_hashes: set[str] = set()
        self.items: list[Item] = []
        # parents slot values: None | "title" | "heading" | "group" |
        # ("list", group_id); keys 0..MAX (reference's range(len(parents))
        # loops touch one past max_levels)
        self.parents: dict[int, object] = {
            i: None for i in range(-1, self.MAX_LEVELS + 1)
        }
        self.level = 0
        self.listIter = 0
        self.level_at_new_list: int | None = None
        self.numbered_headers: dict[int, int] = {}
        self.history = {"names": [None], "levels": [None],
                        "numids": [None], "indents": [None]}
        self._group_seq = 0
        self._processed_tb: set[int] = set()

    # ---------------------------------------------------------- history

    def _update_history(self, name, level, numid, ilevel):
        self.history["names"].append(name)
        self.history["levels"].append(level)
        self.history["numids"].append(numid)
        self.history["indents"].append(ilevel)

    def _prev_numid(self):
        return self.history["numids"][-1]

    def _prev_indent(self):
        return self.history["indents"][-1]

    def _get_level(self) -> int:
        for k in range(0, self.MAX_LEVELS + 1):
            if self.parents[k] is None:
                return k
        return 0

    # ------------------------------------------------------------- emit

    def _emit(self, item: Item) -> None:
        # genos `_is_duplicate_content` (genos_msword_backend.py:
        # 1222-1250): GLOBAL whole-document dedup of plain-text items by
        # normalized (lowercased, whitespace-collapsed) content hash;
        # texts under 5 chars are exempt. Applied only to paragraph text
        # — headings, titles, list items and preserved tables are added
        # without the check in the reference (:1770-1930 call sites).
        if self.dedup_lines and item.label == TEXT:
            t = item.text.strip()
            if len(t) >= 5:
                key = re.sub(r"\s+", " ", t.lower())
                if key in self._content_hashes:
                    return
                self._content_hashes.add(key)
        self.items.append(item)

    # ------------------------------------------------------- paragraphs

    def _iter_inner(self, p):
        # python-docx parity: paragraph text covers runs + hyperlinks;
        # math content is handled by the equations flow separately
        for child in p:
            tag = child.tag
            if tag == _w("r"):
                yield ("run", child)
            elif tag == _w("hyperlink"):
                yield ("hyperlink", child)

    def _para_text(self, p) -> str:
        parts: list[str] = []
        for kind, el in self._iter_inner(p):
            if kind == "run":
                parts.append(_run_text(el))
            else:
                parts.append("".join(_run_text(r)
                                     for r in el.iter(_w("r"))))
        return "".join(parts)

    def _para_elements(self, p):
        """msword_backend.py:381-436 (_get_paragraph_elements):
        [(text, fmt, href)] with runs grouped by formatting."""
        if self._para_text(p).strip() == "":
            return [("", None, None)]
        elements: list[tuple] = []
        group_text = ""
        prev_fmt = None
        fmt = None
        for kind, el in self._iter_inner(p):
            if kind == "hyperlink":
                text = "".join(_run_text(r) for r in el.iter(_w("r")))
                rid = el.get(f"{{{_R}}}id")
                href = _pathify(self.rels.get(rid, "") if rid else "")
                runs = list(el.iter(_w("r")))
                fmt = _run_format(runs[0]) if runs else None
            else:
                text = _run_text(el)
                href = None
                fmt = _run_format(el)
            if (len(text.strip()) and fmt != prev_fmt) or href is not None:
                if len(group_text.strip()) > 0:
                    elements.append((group_text.strip(), prev_fmt, None))
                group_text = ""
                if href is not None:
                    elements.append((text.strip(), fmt, href))
                    text = ""
                else:
                    prev_fmt = fmt
            group_text += text
        if len(group_text.strip()) > 0:
            # reference quirk: the final flush uses the LAST seen format
            # (not prev_fmt) — replicated for parity
            elements.append((group_text.strip(), fmt, None))
        return elements

    @staticmethod
    def _el_md(text: str, fmt, href) -> str:
        body = _esc_md(text)
        if fmt:
            bold, italic, _u = fmt
            if bold and italic:
                body = f"***{body}***"
            elif bold:
                body = f"**{body}**"
            elif italic:
                body = f"*{body}*"
        if href is not None:
            body = f"[{body}]({href})"
        return body

    def _numid_ilvl(self, p):
        numpr = p.find(f".//{_w('numPr')}")
        if numpr is None:
            return None, None
        numid_el = numpr.find(_w("numId"))
        ilvl_el = numpr.find(_w("ilvl"))
        numid = numid_el.get(_w("val")) if numid_el is not None else None
        ilvl = ilvl_el.get(_w("val")) if ilvl_el is not None else None
        return _str_to_int(numid, None), _str_to_int(ilvl, None)

    def _style_id(self, p):
        ppr = p.find(_w("pPr"))
        if ppr is not None:
            pstyle = ppr.find(_w("pStyle"))
            if pstyle is not None:
                return pstyle.get(_w("val"))
        return None

    def handle_text(self, p) -> None:
        """msword_backend.py:697-860 (_handle_text_elements)."""
        elements = self._para_elements(p)
        para_text = self._para_text(p)
        text, equations = self._equations_in_text(p, para_text)
        text = text.strip()
        raw_style = self._style_id(p)
        p_style_id, p_level = self.styles.label_and_level(raw_style)
        numid, ilevel = self._numid_ilvl(p)
        if numid == 0:
            numid = None

        if (numid is not None and ilevel is not None
                and p_style_id not in ("Title", "Heading")):
            self._add_list_item(numid, ilevel, elements)
            self._update_history(p_style_id, p_level, numid, ilevel)
            return
        elif (numid is None and self._prev_numid() is not None
                and p_style_id not in ("Title", "Heading")):  # close list
            if self.level_at_new_list:
                for k in range(0, self.MAX_LEVELS + 1):
                    if k >= self.level_at_new_list:
                        self.parents[k] = None
                self.level = self.level_at_new_list - 1
                self.level_at_new_list = None
            else:
                for k in range(0, self.MAX_LEVELS + 1):
                    self.parents[k] = None
                self.level = 0

        if p_style_id == "Title":
            for k in range(0, self.MAX_LEVELS + 1):
                self.parents[k] = None
            self.parents[0] = "title"
            if text:
                self._emit(Item(label=TITLE, text=text, level=1))
        elif "Heading" in p_style_id:
            is_numbered_style = (
                self.styles.has_numpr(raw_style)
                or p.find(f".//{_w('numPr')}") is not None
            )
            self._add_header(p_level, text, is_numbered_style)
        elif equations:
            # msword_backend.py:771-812: standalone vs inline equations
            if not para_text.strip() and text:
                self._emit(Item(
                    label=FORMULA,
                    text=text.replace("<eq>", "").replace("</eq>", ""),
                ))
            else:
                self._emit_inline_equations(text, equations)
        else:
            # Normal/Subtitle/Author/... and every unknown style: plain
            # paragraph items (":816-852")
            self._emit_paragraph(elements)

        self._update_history(p_style_id, p_level, numid, ilevel)

    def _emit_paragraph(self, elements) -> None:
        texts = [t for t, _f, _h in elements if t]
        if not texts:
            return
        text = " ".join(texts)
        md = " ".join(self._el_md(t, f, h) for t, f, h in elements if t)
        self._emit(Item(label=TEXT, text=text, md_text=md))

    def _equations_in_text(self, p, text: str):
        """msword_backend.py:634-683 (_handle_equations_in_text): OMML
        equations converted to LaTeX, bookended with <eq>..</eq> and
        inserted into the raw paragraph text, preserving whitespace;
        bail out (no equations) when the text cannot be reconstructed
        from the w:t pieces."""
        from doc_parser_ray.functions.omml import omml_to_latex

        only_texts: list[str] = []
        texts_and_equations: list[str] = []
        only_equations: list[str] = []
        for subt in p.iter():
            tag = subt.tag if isinstance(subt.tag, str) else ""
            if tag == _w("t"):
                if isinstance(subt.text, str):
                    only_texts.append(subt.text)
                    texts_and_equations.append(subt.text)
            elif tag == _m("oMath"):
                latex = omml_to_latex(subt).strip()
                if latex:
                    only_equations.append(f"<eq>{latex}</eq>")
                    texts_and_equations.append(f"<eq>{latex}</eq>")
        if not only_equations:
            return text, []
        if (re.sub(r"\s+", "", "".join(only_texts)).strip()
                != re.sub(r"\s+", "", text).strip()):
            return text, []
        output_text = text[:]
        init_i = 0
        for i_s, substr in enumerate(texts_and_equations):
            if len(substr) == 0:
                continue
            if substr in output_text[init_i:]:
                init_i += output_text[init_i:].find(substr) + len(substr)
            else:
                if i_s > 0:
                    output_text = (output_text[:init_i] + substr
                                   + output_text[init_i:])
                    init_i += len(substr)
                else:
                    output_text = substr + output_text
        return output_text, only_equations

    def _emit_inline_equations(self, text: str, equations: list[str]):
        """Inline-equation paragraph (msword_backend.py:782-812): pre
        text parts keep their trailing whitespace (the serializer's
        space-join yields the reference's double spaces before '$'),
        formulas render as $..$, the tail is stripped."""
        md_parts: list[str] = []
        plain_parts: list[str] = []
        text_tmp = text
        for eq in equations:
            if len(text_tmp) == 0:
                break
            seg = text_tmp.split(eq.strip(), 1)
            pre = seg[0]
            text_tmp = "" if len(seg) == 1 else seg[1]
            if len(pre) > 0:
                md_parts.append(_esc_md(pre))
                plain_parts.append(pre)
            inner = eq.strip()
            inner = inner[4:-5] if inner.startswith("<eq>") else inner
            md_parts.append(f"${inner}$")
            plain_parts.append(inner)
        if len(text_tmp) > 0:
            md_parts.append(_esc_md(text_tmp.strip()))
            plain_parts.append(text_tmp.strip())
        plain = "".join(plain_parts).strip()
        if plain:
            self._emit(Item(label=TEXT, text=plain,
                            md_text=" ".join(md_parts)))

    def _add_header(self, curr_level, text: str,
                    is_numbered_style: bool) -> None:
        """msword_backend.py:861-922 (_add_header)."""
        level = self._get_level()
        if isinstance(curr_level, int):
            if curr_level > level:
                for i in range(level, curr_level):
                    self.parents[i] = "group"
            elif curr_level < level:
                for k in range(0, self.MAX_LEVELS + 1):
                    if k >= curr_level:
                        self.parents[k] = None
            current_level = curr_level
            add_level = curr_level
        else:
            current_level = self.level
            add_level = 1

        if is_numbered_style:
            if add_level in self.numbered_headers:
                self.numbered_headers[add_level] += 1
            else:
                self.numbered_headers[add_level] = 1
            text = f"{self.numbered_headers[add_level]} {text}"
            next_level = add_level + 1
            while next_level in self.numbered_headers:
                self.numbered_headers[next_level] = 0
                next_level += 1
            previous_level = add_level - 1
            while previous_level in self.numbered_headers:
                # MSWord convention: no empty sublevels
                if self.numbered_headers[previous_level] == 0:
                    self.numbered_headers[previous_level] += 1
                text = f"{self.numbered_headers[previous_level]}.{text}"
                previous_level -= 1

        self.parents[current_level] = "heading"
        if text:
            self._emit(Item(label=SECTION_HEADER, text=text,
                            level=max(add_level, 1)))

    # ------------------------------------------------------------ lists

    def _add_formatted_list_item(self, elements, level: int) -> None:
        parent = self.parents.get(level)
        if not (isinstance(parent, tuple) and parent[0] == "list"):
            return
        texts = [t for t, _f, _h in elements if t]
        if not texts:
            return
        text = " ".join(texts)
        md = " ".join(self._el_md(t, f, h) for t, f, h in elements if t)
        base = self.level_at_new_list
        depth = (level - base + 1) if base is not None else 1
        self._emit(Item(label=LIST_ITEM, text=text, level=max(depth, 1),
                        marker="-", group=parent[1], md_text=md))

    def _add_list_item(self, numid: int, ilevel: int, elements) -> None:
        """msword_backend.py:967-1060 (_add_list_item), is_numbered
        hardcoded False by the reference (":717")."""
        if not elements:
            return
        level = self._get_level()
        prev_indent = self._prev_indent()
        if self._prev_numid() is None:  # open new list
            self.level_at_new_list = level
            self._group_seq += 1
            self.parents[level] = ("list", self._group_seq)
            self.listIter += 1
            self._add_formatted_list_item(elements, level)
        elif (self._prev_numid() == numid
                and self.level_at_new_list is not None
                and prev_indent is not None and prev_indent < ilevel):
            # open indented list(s)
            for i in range(self.level_at_new_list + prev_indent + 1,
                           self.level_at_new_list + ilevel + 1):
                self.listIter = 0
                self._group_seq += 1
                self.parents[i] = ("list", self._group_seq)
            self.listIter += 1
            self._add_formatted_list_item(
                elements, self.level_at_new_list + ilevel)
        elif (self._prev_numid() == numid
                and self.level_at_new_list is not None
                and prev_indent is not None and ilevel < prev_indent):
            # close nested list level(s)
            for k in list(self.parents):
                if k > self.level_at_new_list + ilevel:
                    self.parents[k] = None
            self.listIter += 1
            self._add_formatted_list_item(
                elements, self.level_at_new_list + ilevel)
            self.listIter = 0
        elif self._prev_numid() == numid or prev_indent == ilevel:
            self.listIter += 1
            self._add_formatted_list_item(elements, level - 1)
        # else: reference fall-through — different numid at a different
        # indent emits nothing

    # ----------------------------------------------------------- tables

    def handle_table(self, tbl) -> None:
        """msword_backend.py:1061-1123 (_handle_tables)."""
        trs = [c for c in tbl if c.tag == _w("tr")]
        grid_el = tbl.find(_w("tblGrid"))
        num_cols = (len(grid_el.findall(_w("gridCol")))
                    if grid_el is not None else 0)
        num_rows = len(trs)
        if not num_cols:
            num_cols = max(
                (sum(self._grid_span(tc) for tc in tr if tc.tag == _w("tc"))
                 for tr in trs), default=0)
        if num_rows == 1 and num_cols == 1:
            # single-cell table: unwrap, walk content as body
            tcs = [c for c in trs[0] if c.tag == _w("tc")]
            if tcs:
                self.walk_body(tcs[0])
            return
        if not num_rows or not num_cols:
            return

        grid: list[list[str | None]] = [
            [None] * num_cols for _ in range(num_rows)
        ]
        for r, tr in enumerate(trs):
            c = self._grid_before(tr)
            for tc in tr:
                if tc.tag != _w("tc"):
                    continue
                span = self._grid_span(tc)
                # advance past already-filled (vertically merged) slots
                while c < num_cols and grid[r][c] is not None:
                    c += 1
                if c >= num_cols:
                    break
                if self._vmerge_continue(tc) and r > 0:
                    text = grid[r - 1][c] if grid[r - 1][c] is not None else ""
                else:
                    text = self._cell_text(tc)
                for cc in range(c, min(c + span, num_cols)):
                    grid[r][cc] = text
                c += span
        rows_txt = [
            " | ".join("" if cell is None else " ".join(cell.split())
                       for cell in row)
            for row in grid
        ]
        # NO strip(): a leading/trailing empty cell is significant — the
        # " | "-joined row must round-trip through the table renderer
        text = "\n".join(rows_txt)
        if text.strip():
            self._emit(Item(label=TABLE, text=text))

    @staticmethod
    def _grid_span(tc) -> int:
        tcpr = tc.find(_w("tcPr"))
        if tcpr is not None:
            gs = tcpr.find(_w("gridSpan"))
            if gs is not None:
                return _str_to_int(gs.get(_w("val")), 1) or 1
        return 1

    @staticmethod
    def _grid_before(tr) -> int:
        trpr = tr.find(_w("trPr"))
        if trpr is not None:
            gb = trpr.find(_w("gridBefore"))
            if gb is not None:
                return _str_to_int(gb.get(_w("val")), 0) or 0
        return 0

    @staticmethod
    def _vmerge_continue(tc) -> bool:
        tcpr = tc.find(_w("tcPr"))
        if tcpr is None:
            return False
        vm = tcpr.find(_w("vMerge"))
        if vm is None:
            return False
        return (vm.get(_w("val")) or "continue") != "restart"

    def _cell_text(self, tc) -> str:
        paras = [c for c in tc if c.tag == _w("p")]
        return "\n".join(self._para_text(p) for p in paras)

    # -------------------------------------------------------- textboxes

    def _handle_textboxes(self, containers) -> None:
        """msword_backend.py:508-633, simplified to document order with
        (text, position) dedup SHARED across the element's containers —
        mc:AlternateContent carries the same textbox twice (DrawingML
        choice + VML fallback) and the duplicate copy must not re-emit."""
        seen: set[tuple] = set()
        for container in containers:
            if id(container) in self._processed_tb:
                continue
            self._processed_tb.add(id(container))
            for pos, p in enumerate(container.iter(_w("p"))):
                key = (self._para_text(p), pos)
                if key in seen:
                    continue
                seen.add(key)
                self.handle_text(p)

    # ---------------------------------------------------------- images

    # magic numbers PIL can actually open (genos_msword_backend.py
    # :2260-2270 image_signatures, minus WMF/EMF — those fail PIL and,
    # with Wand absent in production and here, emit nothing (:2327-2388
    # only adds the placeholder inside the WAND_AVAILABLE branch))
    _PIL_MAGICS = (b"\x89PNG", b"\xff\xd8\xff", b"GIF8", b"BM",
                   b"RIFF", b"\x00\x00\x01\x00", b"II*\x00", b"MM\x00*")

    def _any_decodable_image(self, blips) -> bool:
        """genos image gate: resolve each blip's relationship to its
        media bytes; emit a picture only when some blob passes
        ``is_valid_image_format`` AND would open under PIL (:2220-2320).
        XML/too-short/unknown blobs and WMF/EMF both end with nothing
        added. Unresolvable relationships keep the placeholder (the
        reference adds a picture when PIL opens external parts we cannot
        see; a missing media part here means a synthetic/truncated file,
        where dropping would diverge from the plain walker for no
        reference-observable reason)."""
        resolved_any = False
        for blip in blips:
            rel_id = (blip.get(f"{{{_R}}}embed")
                      or blip.get(f"{{{_R}}}id")
                      or blip.get(f"{{{_R}}}link"))
            if not rel_id:
                continue
            data = self.media(rel_id)
            if data is None:
                continue
            resolved_any = True
            if len(data) >= 4 and not data.startswith((b"<?xm", b"<xml")) \
                    and data.startswith(self._PIL_MAGICS):
                return True
        return not resolved_any

    # ------------------------------------------------------------- walk

    def walk_body(self, body) -> None:
        for el in body:
            tag = el.tag.rsplit("}", 1)[-1]
            containers = el.findall(f".//{_w('txbxContent')}")
            if not containers:
                vml = el.findall(f".//{{{_V}}}textbox")
                containers = vml
            if containers:
                self._handle_textboxes(containers)
            blips = el.findall(f".//{_a('blip')}")
            if not blips:
                # VML images (EMF/WMF via v:imagedata) also count as
                # pictures for placeholder purposes
                blips = el.findall(f".//{{{_V}}}imagedata")
            if tag == "tbl":
                try:
                    self.handle_table(el)
                except Exception:
                    pass  # broken table: reference logs and skips
            elif blips:
                if not self.dedup_lines or self._any_decodable_image(blips):
                    self._emit(Item(label=PICTURE, text=""))
                if tag == "p" and el.find(f".//{_w('t')}") is not None:
                    self.handle_text(el)
            elif tag == "sdt":
                content = el.find(f".//{_w('sdtContent')}")
                if content is not None:
                    for p in content.findall(f".//{_w('p')}"):
                        self.handle_text(p)
            elif tag == "p":
                self.handle_text(el)
            # all other tags (sectPr, bookmarks, ...) are ignored


def extract_docx(data: bytes, dedup_lines: bool = False) -> ParseResult:
    """DOCX bytes → ordered extraction items (P6 semantics)."""
    if not data:
        return ParseResult(items=[], status=STATUS_EMPTY)
    try:
        zf = zipfile.ZipFile(BytesIO(data))
        names = set(zf.namelist())
        if "word/document.xml" not in names:
            return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                               error="not a DOCX: word/document.xml missing")
        doc_root = ET.fromstring(zf.read("word/document.xml"))
        styles = _Styles(zf.read("word/styles.xml")
                         if "word/styles.xml" in names else None)
        rels = _parse_rels(zf.read("word/_rels/document.xml.rels")
                           if "word/_rels/document.xml.rels" in names
                           else None)
        body = doc_root.find(_w("body"))
        if body is None:
            return ParseResult(items=[], status=STATUS_EMPTY)

        def media(rel_id: str) -> bytes | None:
            """Resolve a blip relationship to its media-part bytes, the
            genos ``owner_part.rels[rId].target_part.blob`` analog
            (genos_msword_backend.py:2223-2230). Targets in the rels file
            are relative to ``word/``."""
            target = rels.get(rel_id)
            if not target:
                return None
            for cand in (f"word/{target.lstrip('/')}",
                         target.lstrip("/")):
                if cand in names:
                    try:
                        return zf.read(cand)
                    except Exception:
                        return None
            return None

        walker = _Walker(styles, rels, dedup_lines=dedup_lines,
                         media=media if dedup_lines else None)
        walker.walk_body(body)
        if not walker.items:
            return ParseResult(items=[], status=STATUS_EMPTY)
        return ParseResult(items=walker.items, status=STATUS_OK)
    except Exception as e:  # never raise across block boundaries
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error=f"{type(e).__name__}: {e}")
