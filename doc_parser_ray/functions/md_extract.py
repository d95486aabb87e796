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

Deliberate deviation (documented): the reference emits one TEXT item per
marko inline run, so ``a **b** c`` becomes three items; this engine emits
one TEXT item per source line with inline markers (emphasis, code spans,
links) resolved to their text — a strictly cleaner main-content
extraction with identical text content.
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
_ULIST_RE = re.compile(r"^(\s*)[-*+]\s+(.*)$")
_OLIST_RE = re.compile(r"^(\s*)(\d+)[.)]\s+(.*)$")
_FENCE_RE = re.compile(r"^(\s*)(```+|~~~+)\s*(\S*)\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-{2,}:?\s*(\|\s*:?-{2,}:?\s*)*\|?\s*$")
_HTML_BLOCK_RE = re.compile(r"^\s*<(/?)(\w+)")

_CODE_SPAN_RE = re.compile(r"`([^`]*)`")
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(([^)]*)\)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")
_BOLD_RE = re.compile(r"(\*\*|__)(.+?)\1")
_EMPH_RE = re.compile(r"(\*|_)(.+?)\1")


def _resolve_inline(text: str) -> str:
    """Strip inline markdown formatting down to its text content."""
    text = _IMAGE_RE.sub(lambda m: m.group(1), text)
    text = _LINK_RE.sub(lambda m: m.group(1), text)
    text = _CODE_SPAN_RE.sub(lambda m: m.group(1), text)
    text = _BOLD_RE.sub(lambda m: m.group(2), text)
    text = _EMPH_RE.sub(lambda m: m.group(2), text)
    return text.strip()


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
        # ordered-list numbering state per indent level
        ol_counter: dict[int, int] = {}

        while i < n:
            line = lines[i]
            stripped = line.strip()

            if not stripped:
                ol_counter.clear()
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
                if level == 1:
                    items.append(Item(label=TITLE, text=text, level=1))
                else:
                    items.append(Item(label=SECTION_HEADER, text=text, level=level - 1))
                ol_counter.clear()
                i += 1
                continue

            # HTML block → delegate to the HTML extractor
            hm = _HTML_BLOCK_RE.match(line)
            if hm and not hm.group(1):
                buf = []
                while i < n and lines[i].strip():
                    buf.append(lines[i])
                    i += 1
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
                txt = "\n".join(
                    " | ".join(r + [""] * (width - len(r))) for r in rows
                ).strip()
                items.append(Item(label=TABLE, text=txt))
                continue

            # list items
            m = _ULIST_RE.match(line)
            if m:
                indent = len(m.group(1))
                depth = indent // 2 + 1
                text = _resolve_inline(m.group(2))
                if text:
                    items.append(Item(label=LIST_ITEM, text=text, level=depth, marker="-"))
                i += 1
                continue
            m = _OLIST_RE.match(line)
            if m:
                indent = len(m.group(1))
                depth = indent // 2 + 1
                if indent not in ol_counter:
                    ol_counter[indent] = int(m.group(2))
                else:
                    ol_counter[indent] += 1
                text = _resolve_inline(m.group(3))
                if text:
                    items.append(
                        Item(label=LIST_ITEM, text=text, level=depth,
                             marker=f"{ol_counter[indent]}.")
                    )
                i += 1
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

            # paragraph line → one TEXT item per line (see module docstring)
            text = _resolve_inline(stripped)
            if text:
                items.append(Item(label=TEXT, text=text))
            ol_counter.clear()
            i += 1

        if not items:
            return ParseResult(items=[], status=STATUS_EMPTY)
        return ParseResult(items=items, status=STATUS_OK)
    except Exception as e:
        return ParseResult(items=[], status=STATUS_PARSE_ERROR, error=f"{type(e).__name__}: {e}")
