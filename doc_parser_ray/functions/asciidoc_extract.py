"""AsciiDoc extraction — line-rule reimplementation of the reference's
``AsciiDocBackend`` (/root/reference/docling/backend/asciidoc_backend.py,
a regex line parser):

  - ``= Title``            → TITLE (:290-296)
  - ``== .. ======`` + txt → SECTION_HEADER, level = #'='-1 (:299-314)
  - ``* / - / N.`` items   → LIST_ITEM, depth from indent (:318-357)
  - ``|...|`` lines        → one TABLE per contiguous block, ``|===``
                             fences ignored (:359-366)
  - ``image::path[]``      → PICTURE (:195-230 analog)
  - ``.Caption`` lines     → CAPTION (:232-240 analog)
  - other non-empty lines accumulate into ONE paragraph per blank-line
    gap (asciidoc paragraph semantics, :243-252)

NOTE (stale reference goldens): the groundtruth files
``tests/data/groundtruth/docling_v2/test_0*.asciidoc.md`` are
inconsistent with the reference's OWN current backend — e.g.
test_02's golden renders ``== Section 1`` as plain text while
``asciidoc_backend.py:299-303`` parses it as a heading, and test_01's
golden drops the word "1st" from the title. We therefore match the
CODE's semantics, asserted by unit tests, not those goldens.
"""

from __future__ import annotations

import re

from doc_parser_ray.datamodel import (
    CAPTION,
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

_TITLE_RE = re.compile(r"^= ")
_SECTION_RE = re.compile(r"^(=+)\s+(.*)")
_LIST_RE = re.compile(r"^(\s*)(\*|-|\d+\.)\s+(.*)")
_TABLE_LINE_RE = re.compile(r"^\s*\|")
_IMAGE_RE = re.compile(r"^image::(\S+)\[.*\]\s*$")
_CAPTION_RE = re.compile(r"^\.(\S.*)$")


def extract_asciidoc(payload: str) -> ParseResult:
    if not payload or not payload.strip():
        return ParseResult(items=[], status=STATUS_EMPTY)
    try:
        items: list[Item] = []
        para: list[str] = []
        table_rows: list[str] = []
        indent_stack: list[int] = []
        group_stack: list[int] = []
        group_seq = 0
        ol_counter: dict[tuple[int, int], int] = {}

        def flush_para() -> None:
            if para:
                items.append(Item(label=TEXT, text=" ".join(para)))
                para.clear()

        def flush_table() -> None:
            if table_rows:
                items.append(Item(label=TABLE, text="\n".join(table_rows)))
                table_rows.clear()

        def end_lists() -> None:
            indent_stack.clear()
            group_stack.clear()

        for raw in payload.split("\n"):
            line = raw.rstrip("\r")
            stripped = line.strip()

            if not stripped:
                flush_para()
                flush_table()
                end_lists()
                continue

            if stripped == "|===":  # table fence contributes nothing
                continue

            if _TITLE_RE.match(line):
                flush_para()
                flush_table()
                end_lists()
                items.append(Item(label=TITLE, text=line[2:].strip(),
                                  level=1))
                continue

            sm = _SECTION_RE.match(line)
            if sm and len(sm.group(1)) >= 2:
                flush_para()
                flush_table()
                end_lists()
                items.append(Item(
                    label=SECTION_HEADER, text=sm.group(2).strip(),
                    level=len(sm.group(1)) - 1,
                ))
                continue

            lm = _LIST_RE.match(line)
            if lm:
                flush_para()
                flush_table()
                indent = len(lm.group(1))
                while indent_stack and indent < indent_stack[-1]:
                    indent_stack.pop()
                    group_stack.pop()
                if not indent_stack or indent > indent_stack[-1]:
                    indent_stack.append(indent)
                    group_seq += 1
                    group_stack.append(group_seq)
                depth = len(indent_stack)
                group = group_stack[-1]
                src_marker = lm.group(2)
                if src_marker in ("*", "-"):
                    marker = "-"
                else:
                    key = (depth, group)
                    ol_counter[key] = ol_counter.get(key, 0) + 1
                    marker = f"{ol_counter[key]}."
                text = lm.group(3).strip()
                if text:
                    items.append(Item(label=LIST_ITEM, text=text,
                                      level=depth, marker=marker,
                                      group=group))
                continue

            if _TABLE_LINE_RE.match(line):
                flush_para()
                end_lists()
                cells = [c.strip() for c in stripped.strip("|").split("|")]
                table_rows.append(" | ".join(cells))
                continue

            im = _IMAGE_RE.match(stripped)
            if im:
                flush_para()
                flush_table()
                end_lists()
                items.append(Item(label=PICTURE, text=""))
                continue

            cm = _CAPTION_RE.match(stripped)
            if cm and not stripped.startswith(".."):
                flush_para()
                items.append(Item(label=CAPTION, text=cm.group(1).strip()))
                continue

            end_lists()
            para.append(stripped)

        flush_para()
        flush_table()
        if not items:
            return ParseResult(items=[], status=STATUS_EMPTY)
        return ParseResult(items=items, status=STATUS_OK)
    except Exception as e:  # noqa: BLE001
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error=f"{type(e).__name__}: {e}")
