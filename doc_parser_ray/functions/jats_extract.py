"""JATS (Journal Article Tag Suite) XML extraction — from-scratch
reimplementation of the observable semantics of the reference's
``JatsDocumentBackend``
(/root/reference/docling/backend/xml/jats_backend.py:68-707, lxml
based), built on stdlib ``xml.etree`` only.

Semantics reproduced:
  - metadata first: title ("# "), authors paragraph, affiliations
    paragraph (de-duplicated, "; "-joined), one heading+paragraph per
    abstract (":299-341", ":601-607");
  - linear walk of <body> then <back> (":141-171"): sec/ack →
    headings (depth-nested), list/list-item → list groups, fig →
    caption + picture placeholder, table-wrap → caption + grid parsed
    with the HTML table-grid rules, ref-list → "References" heading +
    list of citations, element-citation flattened through the exact
    field order of ":350-474", mixed-citation flattened via the
    recursive text rule, tex-math "$$..$$" → formula, inline formulas
    skipped (":609-707");
  - the recursive text flattening skips term / disp-formula /
    inline-formula subtrees and folds newlines to spaces (":172-187");
  - paragraph text is flushed before nested flush-tags (ack, sec,
    list, boxed-text, disp-formula, fig) and tail text backpropagates
    exactly as in the reference (":620-706").
"""

from __future__ import annotations

import re

from xml.etree import ElementTree as ET

from doc_parser_ray.datamodel import (
    CAPTION,
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

_SKIP_TEXT_TAGS = ("term", "disp-formula", "inline-formula")
_FLUSH_TAGS = ("ack", "sec", "list", "boxed-text", "disp-formula", "fig")
_DEFAULT_HEADER_ACK = "Acknowledgments"
_DEFAULT_HEADER_ABSTRACT = "Abstract"
_DEFAULT_HEADER_REFERENCES = "References"
_DEFAULT_TEXT_ETAL = "et al."


def _tag(el) -> str | None:
    return el.tag if isinstance(el.tag, str) else None


def _get_text(node) -> str:
    """jats_backend.py:172-187 (_get_text), sep=None path."""
    tag = _tag(node)
    text = (node.text.replace("\n", " ")
            if (tag not in _SKIP_TEXT_TAGS and node.text) else "")
    for child in list(node):
        ctag = _tag(child)
        if ctag is not None and ctag not in _SKIP_TEXT_TAGS:
            text += _get_text(child)
        text += child.tail.replace("\n", " ") if child.tail else ""
    return text


def _first_title_or_label(node):
    """lxml ``xpath("title|label")[0]`` analog: first direct child in
    document order whose tag is title or label."""
    for child in node:
        if _tag(child) in ("title", "label"):
            return child
    return None


def _parse_element_citation(node) -> str:
    """jats_backend.py:350-474 verbatim field order."""
    c = {"author_names": "", "title": "", "source": "", "year": "",
         "volume": "", "page": "", "pub_id": "", "publisher_name": "",
         "publisher_loc": ""}
    names = []
    for name_node in node.iter("name"):
        sur = name_node.find("surname")
        giv = name_node.find("given-names")
        if sur is None or giv is None:
            continue
        names.append((sur.text or "").replace("\n", " ").strip() + " "
                     + (giv.text or "").replace("\n", " ").strip())
    etal = node.find(".//etal")
    if etal is not None:
        names.append(etal.text or _DEFAULT_TEXT_ETAL)
    c["author_names"] = ", ".join(names)

    title_node = None
    for tname in ("article-title", "chapter-title", "data-title",
                  "issue-title", "part-title", "trans-title"):
        found = node.find(tname)
        if found is not None:
            title_node = found
            break
    c["title"] = (_get_text(title_node) if title_node is not None
                  else (node.text or "").replace("\n", " ").strip())

    for field in ("source", "year", "publisher-name", "publisher-loc",
                  "volume"):
        el = node.find(field)
        if el is not None and el.text:
            c[field.replace("-", "_")] = el.text.replace("\n", " ").strip()

    pub_ids = []
    for id_node in node.findall("pub-id"):
        id_type = (id_node.get("assigning-authority")
                   or id_node.get("pub-id-type"))
        if id_type and id_node.text:
            pub_ids.append(id_type.replace("\n", " ").strip().upper()
                           + ": " + id_node.text.replace("\n", " ").strip())
    if pub_ids:
        c["pub_id"] = ", ".join(pub_ids)

    eloc = node.find("elocation-id")
    fpage = node.find("fpage")
    if eloc is not None and eloc.text:
        c["page"] = eloc.text.replace("\n", " ").strip()
    elif fpage is not None and fpage.text:
        c["page"] = fpage.text.replace("\n", " ").strip()
        lpage = node.find("lpage")
        if lpage is not None and lpage.text:
            c["page"] += "–" + lpage.text.replace("\n", " ").strip()  # noqa: RUF001

    text = ""
    if c["author_names"]:
        text += c["author_names"].rstrip(".") + ". "
    if c["title"]:
        text += c["title"] + ". "
    if c["source"]:
        text += c["source"] + ". "
    if c["publisher_name"]:
        if c["publisher_loc"]:
            text += f"{c['publisher_loc']}: "
        text += c["publisher_name"] + ". "
    if c["volume"]:
        text = text.rstrip(". ")
        text += f" {c['volume']}. "
    if c["page"]:
        text = text.rstrip(". ")
        if c["volume"]:
            text += ":"
        text += c["page"] + ". "
    if c["year"]:
        text = text.rstrip(". ")
        text += f" ({c['year']})."
    if c["pub_id"]:
        text = text.rstrip(".") + ". "
        text += c["pub_id"]
    return text


def _xml_to_dom(el):
    """ET element → html_extract._Node tree (lowercased tags, text and
    tails as string children) so parse_table_grid applies unchanged.

    An <inline-formula> whose text splits into exactly three "$$" parts
    is replaced by the "$$"-wrapped middle part, matching the
    reference's pre-processing of table cells
    (html_backend.py:487-492)."""
    from doc_parser_ray.functions.html_extract import _Node

    node = _Node((_tag(el) or "").lower(), dict(el.attrib))
    if el.text:
        node.children.append(el.text)
    for child in el:
        ctag = _tag(child)
        if ctag == "inline-formula":
            ftext = "".join(child.itertext())
            parts = ftext.split("$$")
            node.children.append(f"$${parts[1]}$$" if len(parts) == 3
                                 else ftext)
        elif ctag is not None:
            node.children.append(_xml_to_dom(child))
        if child.tail:
            node.children.append(child.tail)
    return node


class _Ctx:
    """Walk context — the analog of the docling parent NodeItem."""

    __slots__ = ("kind", "depth", "group")

    def __init__(self, kind: str, depth: int, group: int = 0):
        self.kind = kind
        self.depth = depth
        self.group = group


class _JatsWalker:
    def __init__(self):
        self.items: list[Item] = []
        self._group_seq = 0

    # --------------------------------------------------------- metadata

    def add_metadata(self, root) -> None:
        title = self._parse_title(root)
        self.items.append(Item(label=TITLE, text=title, level=1))
        authors = self._parse_authors(root)
        authors_str = ", ".join(a["name"] for a in authors)
        affs = [aff for a in authors for aff in a["affiliation_names"]]
        affs_str = "; ".join(dict.fromkeys(affs))
        if authors_str:
            self.items.append(Item(label=TEXT, text=authors_str))
        if affs_str:
            self.items.append(Item(label=TEXT, text=affs_str))
        for abstract in self._parse_abstracts(root):
            if not abstract["content"]:
                continue
            self.items.append(Item(
                label=SECTION_HEADER,
                text=abstract["label"] or _DEFAULT_HEADER_ABSTRACT,
                level=1,
            ))
            self.items.append(Item(label=TEXT, text=abstract["content"]))

    @staticmethod
    def _find_meta(root):
        for name in ("article-meta", "book-part-meta"):
            node = root.find(f".//{name}")
            if node is not None:
                return node
        return None

    @staticmethod
    def _parse_title(root) -> str:
        title_names = ("article-title", "subtitle", "title", "label")
        titles = []
        for meta in ("article-meta", "collection-meta", "book-meta",
                     "book-part-meta"):
            for tg in root.findall(f".//{meta}/title-group"):
                titles.append(" ".join(
                    (el.text or "").replace("\n", " ").strip()
                    for el in list(tg) if _tag(el) in title_names
                ).strip())
        return " - ".join(titles)

    def _parse_authors(self, root) -> list[dict]:
        authors: list[dict] = []
        meta = self._find_meta(root)
        if meta is None:
            return authors
        aff_names = {}
        for aff in meta.findall(".//aff[@id]"):
            txt = ", ".join(t for t in aff.itertext() if t.strip())
            txt = txt.replace("\n", " ")
            label = aff.find("label")
            if label is not None and label.text:
                prefix = f"{label.text}, "
                if txt.startswith(prefix):
                    txt = txt[len(prefix):]
            aff_names[aff.get("id")] = txt
        for contrib in meta.findall(
                './/contrib-group/contrib[@contrib-type="author"]'):
            name = contrib.find("name")
            if name is None:
                continue
            giv, sur = name.find("given-names"), name.find("surname")
            if giv is None or sur is None:
                continue
            affiliations = []
            for xref in contrib.findall('xref[@ref-type="aff"]'):
                rid = xref.get("rid")
                if rid in aff_names:
                    affiliations.append(aff_names[rid])
            authors.append({
                "name": (giv.text or "") + " " + (sur.text or ""),
                "affiliation_names": affiliations,
            })
        return authors

    @staticmethod
    def _parse_abstracts(root) -> list[dict]:
        out = []
        for abs_node in root.findall(".//abstract"):
            texts = [
                _get_text(p).strip() for p in abs_node.findall("p")
            ]
            label_node = _first_title_or_label(abs_node)
            out.append({
                "label": (label_node.text.strip()
                          if label_node is not None and label_node.text
                          else ""),
                "content": " ".join(texts),
            })
        return out

    # ------------------------------------------------------------- body

    def _emit_citation(self, ctx: _Ctx, text: str) -> None:
        if ctx.kind == "list":
            self.items.append(Item(label=LIST_ITEM, text=text, level=1,
                                   marker="-", group=ctx.group))
        else:
            self.items.append(Item(label=TEXT, text=text))

    def _add_figure(self, node) -> None:
        label_node = node.find("label")
        label = (_get_text(label_node).strip()
                 if label_node is not None else "")
        caption_node = node.find("caption")
        caption = None
        if caption_node is not None:
            caption = ""
            for par in list(caption_node):
                if par.find(".//supplementary-material") is not None:
                    continue
                caption += _get_text(par).strip() + " "
            caption = caption.strip()
        fig_text = f"{label}{' ' if label and caption else ''}{caption or ''}"
        if fig_text:
            self.items.append(Item(label=CAPTION, text=fig_text))
        self.items.append(Item(label=PICTURE, text=""))

    def _add_table_wrap(self, node) -> None:
        from doc_parser_ray.functions.html_extract import parse_table_grid

        table_el = node.find("table")
        if table_el is None:
            table_el = node.find("alternatives/table")
        caption_node = node.find("caption")
        caption = None
        if caption_node is not None:
            caption = ""
            for par in list(caption_node):
                if par.find(".//supplementary-material") is not None:
                    continue
                caption += _get_text(par).strip() + " "
            caption = caption.strip()
        label_node = node.find("label")
        label = (label_node.text or "") if label_node is not None else ""
        table_text = f"{label}{' ' if label and caption else ''}{caption or ''}"
        if table_text:
            self.items.append(Item(label=CAPTION, text=table_text))
        if table_el is None:
            return
        try:
            grid = parse_table_grid(_xml_to_dom(table_el))
        except Exception:
            return
        if grid is None:
            return
        # docling passes bs4 ``.text`` verbatim to tabulate — trailing
        # spaces in cells/headers are width-significant; only newlines
        # are folded (grid rows must stay one line each) and no-break
        # spaces dropped (goldens strip nbsp indentation in cells while
        # keeping it in prose)
        def cell_txt(c: str | None) -> str:
            if c is None:
                return ""
            # leading/trailing newlines are width-invisible to tabulate
            # (it measures per line); interior ones fold to spaces;
            # nbsp/em-space indentation is dropped (goldens strip it in
            # cells while keeping it in prose)
            return re.sub("[\xa0\u2000-\u200b\u202f\u205f\u3000]", "",
                          c.strip("\n").replace("\n", " "))

        rows_txt = [" | ".join(cell_txt(c) for c in row) for row in grid]
        text = "\n".join(rows_txt)
        if text.strip():
            from doc_parser_ray.functions.export import _md_table

            # JATS goldens escape table text AFTER tabulate padding —
            # pre-render so the generic exporter keeps HTML semantics
            self.items.append(Item(label=TABLE, text=text,
                                   md_text=_md_table(text,
                                                     escape_after=True)))

    def walk(self, node, ctx: _Ctx, parent_tag: str | None) -> str:
        """jats_backend.py:609-707 (_walk_linear)."""
        tag = _tag(node)
        new_ctx = ctx
        node_text = (node.text.replace("\n", " ")
                     if (tag != "term" and node.text) else "")
        for child in list(node):
            ctag = _tag(child)
            stop_walk = False
            if tag == "p" and node_text.strip() and ctag in _FLUSH_TAGS:
                self.items.append(Item(label=TEXT, text=node_text.strip()))
                node_text = ""
            if ctag is None:
                stop_walk = True
            elif ctag in ("sec", "ack"):
                header = _first_title_or_label(child)
                text = None
                if header is not None:
                    text = _get_text(header)
                elif ctag == "ack":
                    text = _DEFAULT_HEADER_ACK
                if text:
                    new_ctx = _Ctx("heading", ctx.depth + 1)
                    self.items.append(Item(
                        label=SECTION_HEADER, text=text,
                        level=ctx.depth + 1,
                    ))
            elif ctag == "list":
                self._group_seq += 1
                new_ctx = _Ctx("list", ctx.depth, self._group_seq)
            elif ctag == "list-item":
                text = _get_text(child).strip()
                if ctx.kind == "list":
                    self.items.append(Item(
                        label=LIST_ITEM, text=text, level=1, marker="-",
                        group=ctx.group,
                    ))
                else:
                    self.items.append(Item(label=TEXT, text=text))
                stop_walk = True
            elif ctag == "fig":
                self._add_figure(child)
                stop_walk = True
            elif ctag == "table-wrap":
                self._add_table_wrap(child)
                stop_walk = True
            elif ctag == "suplementary-material":  # sic — reference typo
                stop_walk = True
            elif ctag == "fn-group":
                stop_walk = True
            elif ctag == "ref-list" and tag != "ref-list":
                header = _first_title_or_label(child)
                text = (_get_text(header) if header is not None
                        else _DEFAULT_HEADER_REFERENCES)
                self.items.append(Item(
                    label=SECTION_HEADER, text=text, level=ctx.depth + 1,
                ))
                self._group_seq += 1
                new_ctx = _Ctx("list", ctx.depth + 1, self._group_seq)
            elif ctag == "element-citation":
                self._emit_citation(ctx, _parse_element_citation(child))
                stop_walk = True
            elif ctag == "mixed-citation":
                self._emit_citation(ctx, _get_text(child).strip())
                stop_walk = True
            elif ctag == "tex-math":
                math_parts = (child.text or "").split("$$")
                if len(math_parts) == 3:
                    self.items.append(Item(label=FORMULA,
                                           text=math_parts[1]))
                stop_walk = True
            elif ctag == "inline-formula":
                stop_walk = True

            if not stop_walk:
                new_text = self.walk(child, new_ctx, tag)
                if not (parent_tag == "p" and tag in _FLUSH_TAGS):
                    node_text += new_text
            node_text += child.tail.replace("\n", " ") if child.tail else ""

        if tag == "p" and node_text.strip():
            self.items.append(Item(label=TEXT, text=node_text.strip()))
            return ""
        return node_text


def extract_jats(payload: str | bytes) -> ParseResult:
    """JATS XML → ordered extraction items (P11 semantics)."""
    if isinstance(payload, bytes):
        try:
            payload = payload.decode("utf-8")
        except UnicodeDecodeError:
            payload = payload.decode("latin-1")
    if not payload or not payload.strip():
        return ParseResult(items=[], status=STATUS_EMPTY)
    try:
        try:
            root = ET.fromstring(payload)
        except ET.ParseError as e:
            return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                               error=f"xml: {e}")
        local = (root.tag or "").rsplit("}", 1)[-1]
        if local not in ("article", "book-part", "book"):
            return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                               error=f"not a JATS article: root <{local}>")
        walker = _JatsWalker()
        walker.add_metadata(root)
        body = root.find(".//body")
        if body is not None:
            walker.walk(body, _Ctx("root", 0), None)
        back = root.find(".//back")
        if back is not None:
            walker.walk(back, _Ctx("root", 0), None)
        if not walker.items or all(not i.text for i in walker.items):
            return ParseResult(items=[], status=STATUS_EMPTY)
        return ParseResult(items=walker.items, status=STATUS_OK)
    except Exception as e:  # never raise across block boundaries
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error=f"{type(e).__name__}: {e}")
