"""Markdown extraction — reimplements the observable semantics of the
reference's ``MarkdownDocumentBackend`` (/root/reference/docling/backend/
md_backend.py, marko-AST based) with a self-contained block parser (no
markdown lib in this environment).

Semantics mirrored (cites into md_backend.py):
  - ATX headings: level 1 → TITLE, deeper → SECTION_HEADER (heading
    creation payloads, ":409-420");
  - fenced / indented code blocks → CODE with stripped text (":451-469");
  - pipe-table lines buffered and emitted as one TABLE (":376-386",
    ``_close_table``); rendered as " | "-joined cells, "\\n"-joined rows
    (same rendering as our HTML tables);
  - list items (-, *, + and "1."/"1)") → LIST_ITEM with display marker,
    ordered lists numbered from their first index (marko list start);
  - embedded HTML blocks are delegated to the HTML extractor
    (":476-497" marker mechanism + ":578-611" delegation) — here we parse
    the raw HTML block directly with ``extract_html`` and splice its
    items, which is the same observable result without the export/re-parse
    round-trip;
  - images ``![alt](src)`` → PICTURE (no text), links keep their text.

Inline formatting: the reference emits one TEXT item per marko inline
run and its serializer re-joins them ("a **b**." → "a **b** ."); this
engine emits ONE item per block whose ``text`` is the plain resolution
(cleaner main-content extraction) and whose ``md_text`` carries the
run-exact serialized rendering — byte-parity with the
inline_and_formatting groundtruth through the export path.
"""

from __future__ import annotations

import re

from doc_parser_ray.datamodel import (
    CODE,
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
from doc_parser_ray.functions.html_extract import extract_html

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_ULIST_RE = re.compile(r"^(\s*)([-*+])\s+(.*)$")
_OLIST_RE = re.compile(r"^(\s*)(\d+)[.)]\s+(.*)$")
_FENCE_RE = re.compile(r"^(\s*)(```+|~~~+)\s*(\S*)\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-{2,}:?\s*(\|\s*:?-{2,}:?\s*)*\|?\s*$")
_HTML_BLOCK_RE = re.compile(r"^\s*<(/?)(\w+)")
_OLIST_TEXT_RE = re.compile(r"^(\d+)[.)]\s+(.*)$")
_BARE_MARKER_RE = re.compile(r"[-*+]|\d+[.)]|#{1,6}")

_CODE_SPAN_RE = re.compile(r"`([^`]*)`")
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(([^)]*)\)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")
# underscore variants are blocked intraword (CommonMark: "_" cannot
# open/close emphasis next to a word character — "to_escape" is plain)
_BOLD_RE = re.compile(r"\*\*(?P<a>.+?)\*\*|(?<!\w)__(?P<b>.+?)__(?!\w)")
_EMPH_RE = re.compile(r"\*(?P<a>.+?)\*|(?<!\w)_(?P<b>.+?)_(?!\w)")


def _resolve_inline(text: str) -> str:
    """Strip inline markdown formatting down to its text content."""
    text = _IMAGE_RE.sub(lambda m: m.group(1), text)
    text = _LINK_RE.sub(lambda m: m.group(1), text)
    text = _CODE_SPAN_RE.sub(lambda m: m.group(1), text)
    text = _BOLD_RE.sub(lambda m: m.group("a") or m.group("b"), text)
    text = _EMPH_RE.sub(lambda m: m.group("a") or m.group("b"), text)
    return text.strip()


# ---- inline-run rendering (Item.md_text) -----------------------------
# The reference emits one item per marko inline run and its serializer
# re-joins stripped runs with single spaces ("a **b**." → "a **b** .").
# We keep item.text as the plain resolution above and carry the
# formatted rendering in md_text — same division of labor as the DOCX
# backend.

_TRIPLE_RE = re.compile(
    r"\*\*\*(?P<a>.+?)\*\*\*|(?<!\w)___(?P<b>.+?)___(?!\w)")


def _esc_inline(t: str) -> str:
    from doc_parser_ray.functions.export import esc_md_prose

    return esc_md_prose(t)


def _render_inline(text: str) -> str:
    """Markdown source → docling-serializer rendering: runs stripped and
    space-joined; code spans verbatim in backticks (unescaped), links
    as [label](url), bold/italic markers normalized to asterisks."""
    parts = [p.strip() for p in _split_runs(text)]
    return " ".join(p for p in parts if p)


def _split_runs(text: str) -> list[str]:
    """Render each top-level inline run of ``text`` independently."""
    out: list[str] = []
    pos = 0
    patterns = (
        ("code", _CODE_SPAN_RE), ("image", _IMAGE_RE),
        ("link", _LINK_RE), ("triple", _TRIPLE_RE),
        ("bold", _BOLD_RE), ("emph", _EMPH_RE),
    )
    while pos < len(text):
        best = None
        best_kind = None
        for kind, pat in patterns:
            m = pat.search(text, pos)
            if m and (best is None or m.start() < best.start()):
                best, best_kind = m, kind
        if best is None:
            out.append(_esc_inline(text[pos:]))
            break
        if best.start() > pos:
            out.append(_esc_inline(text[pos:best.start()]))
        out.append(_render_run(best_kind, best))
        pos = best.end()
    return out


def _render_run(kind: str, m: re.Match) -> str:
    if kind == "code":
        return f"`{m.group(1)}`"  # code spans render verbatim
    if kind == "image":
        return _esc_inline(m.group(1))
    if kind == "link":
        label = "".join(_split_runs(m.group(1)))
        return f"[{label}]({m.group(2)})"
    inner = "".join(_split_runs(m.group("a") or m.group("b")))
    if kind == "triple":
        return f"***{inner}***"
    if kind == "bold":
        return f"**{inner}**"
    return f"*{inner}*"


def _split_table_row(line: str) -> list[str]:
    s = line.strip()
    if s.startswith("|"):
        s = s[1:]
    if s.endswith("|"):
        s = s[:-1]
    return [_resolve_inline(c.strip()) for c in s.split("|")]


def extract_markdown(payload: str) -> ParseResult:
    if not payload or not payload.strip():
        return ParseResult(items=[], status=STATUS_EMPTY)
    try:
        items: list[Item] = []
        lines = payload.split("\n")
        i = 0
        n = len(lines)
        # list state: indent stack (depth), group ids, per-group counters
        indent_stack: list[int] = []
        group_stack: list[int] = []
        group_seq = 0
        ol_counter: dict[tuple[int, int], int] = {}
        ul_symbol: dict[int, str] = {}
        saw_html_block = False

        while i < n:
            line = lines[i]
            stripped = line.strip()

            if not stripped:
                i += 1
                continue

            # fenced code block
            m = _FENCE_RE.match(line)
            if m:
                fence = m.group(2)[0] * 3
                buf: list[str] = []
                i += 1
                while i < n and not lines[i].strip().startswith(fence):
                    buf.append(lines[i])
                    i += 1
                i += 1  # skip closing fence
                text = "\n".join(buf).strip()
                if text:
                    items.append(Item(label=CODE, text=text))
                continue

            # heading
            m = _HEADING_RE.match(stripped)
            if m:
                level = len(m.group(1))
                text = _resolve_inline(m.group(2))
                md = _render_inline(m.group(2))
                # empty headings are dropped (groundtruth blocks.md.md)
                if text:
                    if level == 1:
                        items.append(Item(label=TITLE, text=text, level=1,
                                          md_text=md))
                    else:
                        items.append(
                            Item(label=SECTION_HEADER, text=text,
                                 level=level - 1, md_text=md))
                indent_stack.clear()
                group_seq += 1
                i += 1
                continue

            # HTML comment block → contributes nothing (marko HTML block
            # → html backend drops comments; mixed_without_h1.md.md)
            if stripped.startswith("<!--"):
                saw_html_block = True
                while i < n and "-->" not in lines[i]:
                    i += 1
                i += 1
                continue

            # HTML block → delegate to the HTML extractor
            hm = _HTML_BLOCK_RE.match(line)
            if hm and not hm.group(1):
                buf = []
                while i < n and lines[i].strip():
                    buf.append(lines[i])
                    i += 1
                saw_html_block = True
                sub = extract_html("\n".join(buf))
                items.extend(sub.items)
                continue

            # pipe table
            if "|" in stripped and i + 1 < n and _TABLE_SEP_RE.match(lines[i + 1]):
                header = _split_table_row(lines[i])
                rows = [header]
                i += 2
                while i < n and "|" in lines[i] and lines[i].strip():
                    rows.append(_split_table_row(lines[i]))
                    i += 1
                width = max(len(r) for r in rows)
                # NOT .strip(): a leading empty cell starts the text
                # with " | " and stripping would corrupt cell alignment
                txt = "\n".join(
                    " | ".join(r + [""] * (width - len(r))) for r in rows
                )
                if txt.strip():
                    items.append(Item(label=TABLE, text=txt))
                continue

            # list items (depth from a dynamic indent stack; ordered
            # markers RENUMBER from 1 per group — the reference's md
            # backend does not record source numbering, its serializer
            # enumerates: groundtruth mixed_without_h1.md.md renders a
            # source "2." as "1.")
            m = _ULIST_RE.match(line)
            om = None if m else _OLIST_RE.match(line)
            if m or om:
                indent = len((m or om).group(1))
                while indent_stack and indent < indent_stack[-1]:
                    indent_stack.pop()
                    group_stack.pop()
                    ul_symbol.pop(len(indent_stack) + 1, None)
                if not indent_stack or indent > indent_stack[-1]:
                    indent_stack.append(indent)
                    group_seq += 1
                    group_stack.append(group_seq)
                depth = len(indent_stack)
                group = group_stack[-1]
                if m:
                    # a marker-symbol change (- vs * vs +) starts a NEW
                    # list at the same depth (marko; nested.md.md)
                    sym = m.group(2)
                    sym_key = depth
                    if ul_symbol.get(sym_key) not in (None, sym):
                        group_seq += 1
                        group = group_seq
                        group_stack[-1] = group
                    ul_symbol[sym_key] = sym
                    text = _resolve_inline(m.group(3))
                    marker = "-"
                    # "- 2. strange": a leading ordered marker inside a
                    # bullet opens a NESTED enumerated list (marko
                    # behavior, groundtruth mixed_without_h1.md.md)
                    md = _render_inline(m.group(3))
                    im = _OLIST_TEXT_RE.match(text) if text else None
                    if im:
                        depth += 1
                        group_seq += 1
                        group = group_seq
                        ol_counter[(depth, group)] = 1
                        text = _resolve_inline(im.group(2))
                        marker = "1."
                        md = ""  # restructured item: default esc path
                else:
                    key = (depth, group)
                    ol_counter[key] = ol_counter.get(key, 0) + 1
                    text = _resolve_inline(om.group(3))
                    md = _render_inline(om.group(3))
                    marker = f"{ol_counter[key]}."
                if text:  # empty list items are dropped (blocks.md.md)
                    items.append(Item(label=LIST_ITEM, text=text,
                                      level=depth, marker=marker,
                                      group=group, md_text=md))
                i += 1
                continue

            # a non-list line ends all open lists
            if indent_stack:
                indent_stack.clear()
                group_stack.clear()
                ul_symbol.clear()

            # indented code block (4+ spaces after a blank line)
            if (line.startswith("    ")
                    and (i == 0 or not lines[i - 1].strip())):
                buf = []
                while i < n and (line := lines[i]).startswith("    "):
                    buf.append(line[4:])
                    i += 1
                text = "\n".join(buf).strip()
                if text:  # empty indented blocks dropped (blocks.md.md)
                    items.append(Item(label=CODE, text=text))
                continue

            # blockquote → treat content as text
            if stripped.startswith(">"):
                stripped = stripped.lstrip("> ").strip()

            # image-only line
            im = _IMAGE_RE.fullmatch(stripped)
            if im:
                alt = im.group(1).strip()
                if alt:
                    items.append(Item(label=TEXT, text=alt))
                items.append(Item(label=PICTURE, text=""))
                i += 1
                continue

            # bare block markers (empty list item / heading / enum) are
            # dropped — the reference emits nothing (blocks.md.md)
            if _BARE_MARKER_RE.fullmatch(stripped):
                i += 1
                continue

            # paragraph: soft-wrapped source lines join into ONE text
            # item with spaces (markdown paragraph semantics — the
            # reference's marko parse joins them; duck.md.md)
            para = [stripped]
            i += 1
            while i < n:
                nxt = lines[i]
                ns = nxt.strip()
                if (not ns or _HEADING_RE.match(ns) or _FENCE_RE.match(nxt)
                        or _ULIST_RE.match(nxt) or _OLIST_RE.match(nxt)
                        or _HTML_BLOCK_RE.match(nxt)
                        or ns.startswith(("<!--", ">"))
                        or _BARE_MARKER_RE.fullmatch(ns)
                        or ("|" in ns and i + 1 < n
                            and _TABLE_SEP_RE.match(lines[i + 1]))):
                    break
                para.append(ns)
                i += 1
            raw_para = " ".join(para)
            text = _resolve_inline(raw_para)
            if text:
                items.append(Item(label=TEXT, text=text,
                                  md_text=_render_inline(raw_para)))

        # furniture/body split — applies ONLY when the document contains
        # an HTML block: the reference's md backend then round-trips the
        # WHOLE document through the HTML backend (md_backend.py:578-611),
        # whose pre-first-heading furniture rule kicks in (groundtruth:
        # mixed_without_h1.md.md drops its pre-heading paragraph, while
        # blocks.md.md — no HTML blocks — keeps pre-heading content)
        from doc_parser_ray.datamodel import FURNITURE

        if saw_html_block and any(
            it.label in (TITLE, SECTION_HEADER) for it in items
        ):
            for it in items:
                if it.label in (TITLE, SECTION_HEADER):
                    break
                it.content_layer = FURNITURE

        if not any(it.content_layer != FURNITURE or it.text for it in items):
            return ParseResult(items=[], status=STATUS_EMPTY)
        if not items:
            return ParseResult(items=[], status=STATUS_EMPTY)
        return ParseResult(items=items, status=STATUS_OK)
    except Exception as e:
        return ParseResult(items=[], status=STATUS_PARSE_ERROR, error=f"{type(e).__name__}: {e}")
