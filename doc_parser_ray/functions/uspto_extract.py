"""USPTO patent extraction (P12) — from-scratch reimplementation of the
observable semantics of the reference's ``PatentUsptoDocumentBackend``
(/root/reference/docling/backend/xml/uspto_backend.py:60-1905), on
stdlib ``xml.sax`` + ``xml.etree`` only (the reference uses SAX too,
plus BeautifulSoup for tables).

Four dialects, selected from DOCTYPE / "PATN" lines exactly like the
reference (":87-104"):
  - ICE (grant/application v4.x, 2005+): abstract, title, claims with
    the unclosed-claim-text quirk, heading lvl attribute, paragraph
    whitespace folding, sup/sub styled via Unicode super/subscript
    characters, maths suppressed (":167-501");
  - GrantV2 (v2.5, 2002-2004): PDAT-wrapped text, B540 title, SDOAB
    abstract, CL/CLM claims, H headings with LVL, ITALIC as
    mathematical-italic codepoints, CWU suppressed (":503-846");
  - Grant APS (1976-2001, plain text): two-space key/value split with
    continuation lines, ABST/BSUM/DETD/CLMS/DRWD sections, PAC
    captions as headings, claim accumulation onto the last text item
    (":848-1061");
  - AppV1 (application v1.x, 2001-2004): subdoc-* containers,
    claim-text without space joins (":1063-1398").

ABSTRACT / CLAIMS get fixed "###"-level headings (":43-57"); OASIS
Open Exchange tables are re-parsed from the raw XML with the colspec
offset-unification algorithm (":1400-1695") and fill the table
placeholders in document order. ISO-8879 Greek entities and
super/subscript/math-italic styling map straight to the Unicode
codepoints the reference reaches via HTML entities (":1697-1905").
"""

from __future__ import annotations

import html
import re
import xml.sax
from xml.etree import ElementTree as ET

from doc_parser_ray.datamodel import (
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

# --------------------------------------------------------- styling maps

_SUPERSCRIPT = str.maketrans({
    "1": "¹", "2": "²", "3": "³", "4": "⁴",
    "5": "⁵", "6": "⁶", "7": "⁷", "8": "⁸",
    "9": "⁹", "0": "⁰", "+": "⁺", "-": "⁻",
    "−": "⁻", "=": "⁼", "(": "⁽", ")": "⁾",
    "a": "ª", "o": "º", "i": "ⁱ", "n": "ⁿ",
})
_SUBSCRIPT = str.maketrans({
    "1": "₁", "2": "₂", "3": "₃", "4": "₄",
    "5": "₅", "6": "₆", "7": "₇", "8": "₈",
    "9": "₉", "0": "₀", "+": "₊", "-": "₋",
    "−": "₋", "=": "₌", "(": "₍", ")": "₎",
    "a": "ₐ", "e": "ₑ", "o": "ₒ", "x": "ₓ",
})
# mathematical italic letters (U+1D434..): same codepoints the
# reference reaches via numeric entities (Y maps in, X is absent there
# too; lowercase h uses the codepoint the reference lists)
_MATH_ITALIC = str.maketrans({
    **{chr(ord("A") + i): chr(119860 + i)
       for i in range(25) if chr(ord("A") + i) != "X"},
    **{chr(ord("a") + i): chr(119886 + i) for i in range(26)},
})

# ISO 8879 Greek entity names → Unicode (reference: name → HTML Greek
# entity → unescape; collapsed to one lookup here)
_GREEK_HTML = {
    "Agr": "Alpha", "Bgr": "Beta", "Ggr": "Gamma", "Dgr": "Delta",
    "Egr": "Epsilon", "Zgr": "Zeta", "EEgr": "Eta", "THgr": "Theta",
    "Igr": "Iota", "Kgr": "Kappa", "Lgr": "Lambda", "Mgr": "Mu",
    "Ngr": "Nu", "Xgr": "Xi", "Ogr": "Omicron", "Pgr": "Pi",
    "Rgr": "Rho", "Sgr": "Sigma", "Tgr": "Tau", "Ugr": "Upsilon",
    "PHgr": "Phi", "KHgr": "Chi", "PSgr": "Psi", "OHgr": "Omega",
    "agr": "alpha", "bgr": "beta", "ggr": "gamma", "dgr": "delta",
    "egr": "epsilon", "zgr": "zeta", "eegr": "eta", "thgr": "theta",
    "igr": "iota", "kgr": "kappa", "lgr": "lambda", "mgr": "mu",
    "ngr": "nu", "xgr": "xi", "ogr": "omicron", "pgr": "pi",
    "rgr": "rho", "sgr": "sigmaf", "tgr": "tau", "ugr": "upsilon",
    "phgr": "phi", "khgr": "chi", "psgr": "psi", "ohgr": "omega",
}


def _resolve_entity(name: str) -> str | None:
    """Entity name → text, or None when unrecognized (dropped, like the
    reference's skippedEntity)."""
    mapped = _GREEK_HTML.get(name)
    ent = f"&{mapped or name};"
    unescaped = html.unescape(ent)
    return unescaped if unescaped != ent else None


_ABSTRACT_HEADING = ("ABSTRACT", 2)
_CLAIMS_HEADING = ("CLAIMS", 2)

_TABLE_RE = re.compile(r"^(<table .*?</table>)", re.MULTILINE | re.DOTALL)


class _Doc:
    """Flat item builder with the reference's parents/level
    bookkeeping (parents keys only ever grow; min key is 1)."""

    def __init__(self) -> None:
        self.items: list[Item] = []
        self.level = 1
        self.parent_keys: set[int] = {1}

    def add_title(self, text: str) -> None:
        self.items.append(Item(label=TITLE, text=text, level=1))
        self.parent_keys.add(self.level + 1)
        self.level += 1

    def add_heading(self, text: str, level: int, track: bool = True) -> None:
        self.items.append(Item(label=SECTION_HEADER, text=text,
                               level=max(level, 1)))
        if track:
            self.parent_keys.add(self.level + 1)
            self.level += 1

    def fixed_heading(self, spec: tuple[str, int]) -> None:
        """ABSTRACT/CLAIMS heading: fixed level, parents untouched."""
        text, lvl = spec
        level = lvl if lvl in self.parent_keys else 1
        self.items.append(Item(label=SECTION_HEADER, text=text, level=level))

    def add_paragraph(self, text: str) -> None:
        self.items.append(Item(label=TEXT, text=text))

    def add_table_placeholder(self) -> None:
        self.items.append(Item(label=TABLE, text=""))

    def heading_enter_level(self, attr_level: str) -> None:
        """ICE/AppV1/GrantV2 heading start (":369-377")."""
        new_level = int(attr_level) if attr_level.isnumeric() else 1
        self.level = (new_level + 1 if (new_level + 1) in self.parent_keys
                      else 1)


class _SaxBase(xml.sax.handler.ContentHandler):
    """Shared SAX scaffolding: a property stack of registered tags,
    text capture for is_text tags, styled sup/sub under text parents."""

    ELEMENTS: dict[str, bool] = {}  # tag -> is_text
    SUP_TAG = ""
    SUB_TAG = ""

    def __init__(self) -> None:
        super().__init__()
        self.doc: _Doc | None = None
        self.property: list[str] = []
        self.text = ""

    # -- styling ------------------------------------------------------

    def _apply_style(self, text: str, style_tag: str) -> str:
        if style_tag == self.SUP_TAG:
            return text.translate(_SUPERSCRIPT)
        if style_tag == self.SUB_TAG:
            return text.translate(_SUBSCRIPT)
        return text

    def _capture(self, content: str) -> None:
        if not self.property:
            return
        elm = self.property[-1]
        if not self.ELEMENTS.get(elm, False):
            return
        if elm in (self.SUP_TAG, self.SUB_TAG):
            if len(self.property) < 2:
                return
            parent = self.property[-2]
            if self.ELEMENTS.get(parent, False):
                self.text += self._apply_style(content, elm)
        else:
            self.text += content

    def characters(self, content):
        self._capture(content)

    def skippedEntity(self, name):
        resolved = _resolve_entity(name)
        if resolved is not None:
            self._capture(resolved)


class _IceHandler(_SaxBase):
    """ICE v4.x handler (uspto_backend.py:212-501)."""

    DOC_ELEMENTS = ("us-patent-application", "us-patent-grant")
    ELEMENTS = {
        "abstract": True, "invention-title": True, "claims": False,
        "claim": False, "claim-text": True, "p": True, "heading": True,
        "description": False, "table": False,
        "description-of-drawings": True, "sup": True, "sub": True,
        "maths": False,
    }
    SUP_TAG = "sup"
    SUB_TAG = "sub"

    def __init__(self) -> None:
        super().__init__()
        self.claim = ""
        self.claims: list[str] = []
        self.abstract = ""

    def startElement(self, tag, attributes):
        if tag in self.DOC_ELEMENTS:
            self.doc = _Doc()
            self.text = ""
        if tag in self.ELEMENTS:
            if (tag == "claim-text" and self.property
                    and self.property[-1] == tag and self.text.strip()):
                self.claim += " " + self.text.strip()
                self.text = ""
            elif tag == "heading" and self.doc:
                self.doc.heading_enter_level(attributes.get("level", ""))
            self.property.append(tag)

    def endElement(self, tag):
        if tag in self.DOC_ELEMENTS:
            self.claim, self.claims, self.abstract = "", [], ""
        if tag in self.ELEMENTS and self.property:
            current = self.property.pop()
            self._add_property(current, self.text.strip())

    def _add_property(self, name: str, text: str) -> None:
        doc = self.doc
        if not name or doc is None:
            return
        if name == "invention-title":
            if text:
                doc.add_title(text)
            self.text = ""
        elif name == "abstract":
            if self.abstract:
                doc.fixed_heading(_ABSTRACT_HEADING)
                doc.add_paragraph(self.abstract)
        elif name == "claim-text":
            text = re.sub(r"\s+", " ", text).strip()
            if text:
                self.claim += " " + text
            self.text = ""
        elif name == "claim" and self.claim:
            self.claims.append(self.claim.strip())
            self.claim = ""
        elif name == "claims" and self.claims:
            doc.fixed_heading(_CLAIMS_HEADING)
            for claim in self.claims:
                doc.add_paragraph(claim)
        elif name == "p" and text:
            text = re.sub(r"\s+", " ", text)
            if "abstract" in self.property:
                self.abstract = ((self.abstract + " " + text)
                                 if self.abstract else text)
            else:
                doc.add_paragraph(text)
            self.text = ""
        elif name == "heading" and text:
            doc.add_heading(text, doc.level)
            self.text = ""
        elif name == "table":
            doc.add_table_placeholder()


class _GrantV2Handler(_SaxBase):
    """Grant v2.5 handler (uspto_backend.py:549-846)."""

    DOC_ELEMENT = "PATDOC"
    ELEMENTS = {
        "PDAT": True, "SDOAB": False, "SDOCL": False, "B540": False,
        "CL": False, "CLM": False, "PARA": True, "H": True,
        "DRWDESC": False, "SP": False, "SB": False, "ITALIC": False,
        "CWU": False, "table": False,
    }
    SUP_TAG = "SP"
    SUB_TAG = "SB"

    def __init__(self) -> None:
        super().__init__()
        self.claim = ""
        self.claims: list[str] = []
        self.paragraph = ""
        self.abstract = ""

    def _apply_style(self, text: str, style_tag: str) -> str:
        if style_tag == "ITALIC":
            return text.translate(_MATH_ITALIC)
        return super()._apply_style(text, style_tag)

    def startElement(self, tag, attributes):
        if tag == self.DOC_ELEMENT:
            self.doc = _Doc()
            self.text = ""
        if tag in self.ELEMENTS:
            if tag == "H" and "SDOCL" not in self.property and self.doc:
                self.doc.heading_enter_level(attributes.get("LVL", ""))
            self.property.append(tag)

    def endElement(self, tag):
        if tag == self.DOC_ELEMENT:
            self.claim, self.claims = "", []
            self.paragraph, self.abstract, self.text = "", "", ""
        if tag in self.ELEMENTS and self.property:
            current = self.property.pop()
            self._add_property(current, self.text)

    def _add_property(self, name: str, text: str) -> None:
        doc = self.doc
        if not name or doc is None:
            return
        if name == "PDAT" and text:
            if not self.property:
                self.text = ""
                return
            wrapper = self.property[-1]
            text = self._apply_style(text, wrapper)
            if "B540" in self.property and text.strip():
                doc.add_title(text.strip())
            elif "SDOAB" in self.property:
                self.abstract += text
            elif "CLM" in self.property:
                self.claim += text
            elif ("PARA" in self.property and "CLM" not in self.property
                    and "SDOAB" not in self.property):
                self.paragraph += text
            elif ("H" in self.property and "SDOCL" not in self.property
                    and text.strip()):
                doc.add_heading(text.strip(), doc.level)
            self.text = ""
        elif name == "CLM" and self.claim.strip():
            self.claims.append(self.claim.strip())
            self.claim = ""
        elif name == "CL" and self.claims:
            doc.fixed_heading(_CLAIMS_HEADING)
            for claim in self.claims:
                doc.add_paragraph(claim)
        elif name == "SDOAB" and self.abstract.strip():
            doc.fixed_heading(_ABSTRACT_HEADING)
            doc.add_paragraph(self.abstract.strip())
        elif name == "PARA":
            paragraph = self.paragraph.strip()
            if paragraph and "CLM" not in self.property:
                doc.add_paragraph(paragraph)
            elif "CLM" in self.property:
                self.claim += " "
            self.paragraph = ""
        elif name == "table":
            doc.add_table_placeholder()


class _AppV1Handler(_SaxBase):
    """Application v1.x handler (uspto_backend.py:1110-1398)."""

    DOC_ELEMENT = "patent-application-publication"
    ELEMENTS = {
        "brief-description-of-drawings": False, "subdoc-abstract": False,
        "title-of-invention": True, "subdoc-claims": False,
        "claim": False, "claim-text": True, "number": False,
        "paragraph": True, "heading": True, "superscript": True,
        "subscript": True, "table": False, "math-cwu": False,
    }
    SUP_TAG = "superscript"
    SUB_TAG = "subscript"

    def __init__(self) -> None:
        super().__init__()
        self.claim = ""
        self.claims: list[str] = []
        self.abstract = ""

    def _apply_style(self, text: str, style_tag: str) -> str:
        return super()._apply_style(html.unescape(text), style_tag)

    def startElement(self, tag, attributes):
        if tag == self.DOC_ELEMENT:
            self.doc = _Doc()
            self.text = ""
        if tag in self.ELEMENTS:
            if (tag == "claim-text" and self.property
                    and self.property[-1] == tag and self.text.strip()):
                self.claim += " " + self.text.strip("\n")
                self.text = ""
            elif tag == "heading" and self.doc:
                self.doc.heading_enter_level(attributes.get("lvl", ""))
            self.property.append(tag)

    def endElement(self, tag):
        if tag == self.DOC_ELEMENT:
            self.claim, self.claims = "", []
            self.abstract, self.text = "", ""
        if tag in self.ELEMENTS and self.property:
            current = self.property.pop()
            self._add_property(current, self.text)

    def _add_property(self, name: str, text: str) -> None:
        doc = self.doc
        if not name or doc is None:
            return
        if name == "title-of-invention":
            title = text.strip()
            if title:
                doc.add_title(title)
            self.text = ""
        elif name == "subdoc-abstract":
            abstract = self.abstract.strip()
            if abstract:
                doc.fixed_heading(_ABSTRACT_HEADING)
                doc.add_paragraph(self.abstract)
                self.abstract = ""
            self.text = ""
        elif name == "claim-text":
            if text:
                self.claim += self.text.strip("\n")
            self.text = ""
        elif name == "claim":
            claim = self.claim.strip()
            if claim:
                self.claims.append(claim)
            self.claim = ""
        elif name == "subdoc-claims" and self.claims:
            doc.fixed_heading(_CLAIMS_HEADING)
            for claim in self.claims:
                doc.add_paragraph(claim)
        elif name in ("paragraph", "heading"):
            if text and "subdoc-abstract" in self.property:
                self.abstract = (self.abstract + text) if self.abstract \
                    else text
            elif text.strip():
                text = re.sub(r"\s+", " ", text).strip()
                if name == "heading":
                    doc.add_heading(text, doc.level)
                else:
                    doc.add_paragraph(text)
            self.text = ""
        elif name == "table":
            doc.add_table_placeholder()


# --------------------------------------------------------- APS (text)

_APS_SECTIONS_PAR = ("BSUM", "DETD", "DRWD")
_APS_PAR_FIELDS = ("PAR", "PA1", "PA2", "PA3")


class _ApsParser:
    """Grant APS key/value text parser (uspto_backend.py:848-1061)."""

    def __init__(self) -> None:
        self.doc = _Doc()
        self._last_text: Item | None = None

    def _reset_last(self) -> None:
        self._last_text = None

    def store_section(self, section: str) -> None:
        if section == "ABST":
            spec = _ABSTRACT_HEADING
        elif section == "CLMS":
            spec = _CLAIMS_HEADING
        else:
            return
        doc = self.doc
        level = spec[1] if spec[1] in doc.parent_keys else 1
        doc.level = level
        doc.add_heading(spec[0], level)
        self._reset_last()

    def store_content(self, section: str, field: str, value: str) -> None:
        doc = self.doc
        if field == "TTL":
            doc.add_title(value)
            self._reset_last()
        elif field == "PAL" and section == "ABST":
            if self._last_text is not None:
                self._last_text.text += " " + value
            else:
                doc.add_paragraph(value)
                self._last_text = doc.items[-1]
        elif field == "NUM" and section == "CLMS":
            doc.add_paragraph("")
            self._last_text = doc.items[-1]
        elif field in _APS_PAR_FIELDS and section == "CLMS":
            if self._last_text is None:
                doc.add_paragraph("")
                self._last_text = doc.items[-1]
            item = self._last_text
            item.text += (f" {value.strip()}" if item.text
                          else value.strip())
        elif field == "PAC" and section in _APS_SECTIONS_PAR:
            level = (_ABSTRACT_HEADING[1]
                     if _ABSTRACT_HEADING[1] in doc.parent_keys else 1)
            doc.level = level
            doc.add_heading(value, level)
            self._reset_last()
        elif field in _APS_PAR_FIELDS and section in _APS_SECTIONS_PAR:
            doc.add_paragraph(value)
            self._last_text = doc.items[-1]

    def parse(self, content: str) -> list[Item]:
        section = key = value = ""
        for line in content.splitlines():
            cols = re.split(r"\s{2,}", line, maxsplit=1)
            if key and value and (len(cols) == 1
                                  or (len(cols) == 2 and cols[0])):
                self.store_content(section, key, value)
                key = value = ""
            if len(cols) == 1:  # section title
                section = cols[0]
                self.store_section(section)
            elif len(cols) == 2:
                if cols[0]:
                    key, value = cols
                elif not re.match(r"^##STR\d+##$", cols[1]):
                    value += " " + cols[1]
        if key and value:
            self.store_content(section, key, value)
        return self.doc.items


# ------------------------------------------------------- OASIS tables

_ENTITY_RE = re.compile(r"&([A-Za-z][A-Za-z0-9.-]*);")


def _sanitize_xml(raw: str) -> str:
    """DROP undefined named entities so stdlib ET can parse the
    fragment — the reference's BeautifulSoup("xml") (lxml recover mode)
    silently removes them, so "ZEOCIN&thinsp;&trade;" becomes "ZEOCIN"
    in its table cells; replicated for golden parity."""
    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name in ("amp", "lt", "gt", "quot", "apos"):
            return m.group(0)
        return ""

    return _ENTITY_RE.sub(sub, raw)


def _parse_oasis_table(raw: str) -> list[list[str]] | None:
    """Port of XmlTable (uspto_backend.py:1400-1695): colspec width
    unification across tgroups, namest/nameend spans, thead detection,
    empty-row dropping. Returns the rendered text grid."""
    try:
        root = ET.fromstring(_sanitize_xml(raw))
    except ET.ParseError:
        return None
    table = root if root.tag == "table" else root.find(".//table")
    if table is None:
        return None
    tgroups = [el for el in table.iter("tgroup")]

    # column specifications per tgroup
    tg_colinfo: list[list[float]] = []
    for tg in tgroups:
        widths: list[float] = []
        for cs in tg.iter("colspec"):
            cw = cs.get("colwidth", "") or "0"
            cw = re.sub("pt", "", cw, flags=re.I)
            cw = re.sub("mm", "", cw, flags=re.I)
            try:
                widths.append(int(cw))
            except ValueError:
                try:
                    widths.append(float(cw))
                except ValueError:
                    widths.append(0)
        tg_colinfo.append(widths)
    if not tg_colinfo:
        return None

    # unified offsets (":1430-1509")
    offsets: list[list[float]] = []
    for widths in tg_colinfo:
        offs = [0.0]
        for w in widths:
            offs.append(offs[-1] + w)
        offsets.append(offs)
    zero_offs = {offs[i] for offs, widths in zip(offsets, tg_colinfo)
                 for i, w in enumerate(widths) if w == 0}
    min_offsets = sorted(set(offsets[0]).union(*[set(o) for o in offsets]))
    min_offsets = sorted(min_offsets + list(zero_offs))
    # reference: ncols_max is the max COLSPEC count across tgroups
    # (":1511-1524") — cells spanning beyond it are clipped by the
    # docling grid, replicated by the row slice below
    ncols_max = max(len(w) for w in tg_colinfo)
    if ncols_max <= 0 or len(min_offsets) < 2:
        return None

    # per-tgroup cell offsets into the unified grid
    tg_cell_offst: list[list[int] | None] = []
    for offs in offsets:
        cell_offst = [0]
        i = 1
        range_ = 1
        broken = False
        for min_i in range(1, len(min_offsets)):
            if i >= len(offs):
                break
            min_offst = min_offsets[min_i]
            offst = offs[i]
            if min_offst == offst:
                if len(offs) == i + 1 and len(min_offsets) > min_i + 1:
                    range_ += 1
                else:
                    cell_offst.append(cell_offst[-1] + range_)
                    range_ = 1
                    i += 1
            elif min_offst < offst:
                range_ += 1
            else:
                broken = True
                break
        tg_cell_offst.append(None if broken else cell_offst)
    if any(c is None for c in tg_cell_offst):
        return None

    parent = {c: p for p in table.iter() for c in p}
    rows_out: list[list[str]] = []
    for tg, cell_offst in zip(tgroups, tg_cell_offst):
        assert cell_offst is not None
        for row in [el for el in tg.iter() if el.tag in ("row", "tr")]:
            entries = [el for el in row if el.tag in ("entry", "td")]
            cells: list[str] = []
            is_row_empty = True
            wrong_nbr = False
            for ientry, entry in enumerate(entries):
                text = "".join(entry.itertext()).strip()
                namest = entry.get("namest")
                nameend = entry.get("nameend")
                start = (int(namest) if namest and namest.isnumeric()
                         else ientry + 1)
                if nameend and nameend.isnumeric():
                    end, shift = int(nameend), 0
                else:
                    end, shift = ientry + 2, 1
                if end > len(cell_offst):
                    wrong_nbr = True
                    break
                lo = cell_offst[start - 1]
                hi = cell_offst[end - 1] - shift
                if text:
                    is_row_empty = False
                for _ in range(lo, hi + 1):
                    cells.append(text)
            if wrong_nbr:
                cells = []
            cells.extend("" for _ in range(len(cells), ncols_max))
            if not is_row_empty:
                rows_out.append(cells[:ncols_max])
    return rows_out or None


def _fill_tables(items: list[Item], content: str) -> None:
    """Parse raw <table> fragments and fill placeholders in order; on a
    count mismatch placeholders stay empty (":190-209")."""
    raw_tables = _TABLE_RE.findall(content)
    placeholders = [it for it in items if it.label == TABLE]
    grids = []
    for raw in raw_tables:
        grid = _parse_oasis_table(raw)
        if grid:
            grids.append(grid)
    if len(grids) != len(placeholders):
        return
    for item, grid in zip(placeholders, grids):
        item.text = "\n".join(
            " | ".join(" ".join(c.split()) for c in row) for row in grid
        )


# ----------------------------------------------------------- dispatch

def _select_dialect(content: str) -> str | None:
    """uspto_backend.py:87-104 (_set_parser over the scanned lines)."""
    dialect = None
    for line in content.splitlines():
        if line == "PATN":
            dialect = dialect or "aps"
        elif line.startswith("<!DOCTYPE"):
            low = line.lower()
            if ("us-patent-application-v4" in low
                    or "us-patent-grant-v4" in low):
                dialect = "ice"
            elif "us-grant-025" in low:
                dialect = "grant_v2"
            elif ("patent-application-publication" in low
                    and "pap-v1" in low):
                dialect = "app_v1"
    return dialect


def extract_uspto(payload: str | bytes) -> ParseResult:
    """USPTO patent text/XML → ordered extraction items."""
    if isinstance(payload, bytes):
        try:
            payload = payload.decode("utf-8")
        except UnicodeDecodeError:
            payload = payload.decode("latin-1")
    if not payload or not payload.strip():
        return ParseResult(items=[], status=STATUS_EMPTY)
    try:
        dialect = _select_dialect(payload)
        if dialect is None:
            return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                               error="unrecognized USPTO dialect")
        if dialect == "aps":
            items = _ApsParser().parse(payload)
        else:
            handler: _SaxBase = {
                "ice": _IceHandler,
                "grant_v2": _GrantV2Handler,
                "app_v1": _AppV1Handler,
            }[dialect]()
            try:
                xml.sax.parseString(payload.encode("utf-8"), handler)
            except xml.sax.SAXParseException as e:
                return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                                   error=f"sax: {e}")
            if handler.doc is None:
                return ParseResult(items=[], status=STATUS_EMPTY)
            items = handler.doc.items
            _fill_tables(items, payload)
        if not items:
            return ParseResult(items=[], status=STATUS_EMPTY)
        return ParseResult(items=items, status=STATUS_OK)
    except Exception as e:  # never raise across block boundaries
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error=f"{type(e).__name__}: {e}")
