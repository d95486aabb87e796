"""Deterministic document-metadata extraction (the reference's E5 path).

The reference extracts title/date/authors with an LLM, then normalizes
with DETERMINISTIC parsers that we mirror exactly:

  - ``parse_created_date``: YYYY-MM-DD / YYYY-MM (day := 01) / YYYY
    (:= 0101), calendar-validated via ``datetime``, 0 on any failure —
    genon/preprocessor/facade/intelligent_processor.py:1088-1136.
  - ``parse_authors``: list-of-dicts ("이름"/"name" keys) or delimited
    string (first matching separator of ``, ; / \\n · •``), blanks
    dropped, de-duplicated —
    genon/preprocessor/facade/intelligent_processor.py:1138-1189.
    Deviation: the reference de-dups via ``list(set(...))`` (arbitrary
    order); we sort for deterministic output.

``extract_metadata`` is the LLM-free head-text heuristic that feeds
them: title = first non-empty line, date = first ISO-like match in the
text, authors = the text after an ``Author(s):`` marker.
"""

from __future__ import annotations

import re
from datetime import datetime

_DATE_RE = re.compile(r"\b(\d{4})-(\d{1,2})(?:-(\d{1,2}))?\b")
_AUTHOR_LINE_RE = re.compile(r"^authors?\s*[:]\s*(.+)$", re.IGNORECASE)
_AUTHOR_SEPARATORS = [",", ";", "/", "\n", "·", "•"]


def parse_created_date(date_text: str | None) -> int:
    """Date text → int YYYYMMDD (reference-exact, :1088-1136)."""
    if not date_text or not isinstance(date_text, str) or date_text == "None":
        return 0
    date_text = date_text.strip()
    m = re.match(r"^(\d{4})-(\d{1,2})-(\d{1,2})$", date_text)
    if m:
        year, month, day = m.groups()
        try:
            datetime(int(year), int(month), int(day))
            return int(f"{year}{month.zfill(2)}{day.zfill(2)}")
        except ValueError:
            pass
    m = re.match(r"^(\d{4})-(\d{1,2})$", date_text)
    if m:
        year, month = m.groups()
        try:
            datetime(int(year), int(month), 1)
            return int(f"{year}{month.zfill(2)}01")
        except ValueError:
            pass
    m = re.match(r"^(\d{4})$", date_text)
    if m:
        year = m.group(1)
        try:
            datetime(int(year), 1, 1)
            return int(f"{year}0101")
        except ValueError:
            pass
    return 0


def parse_authors(authors_data) -> list[str]:
    """Author payload → clean name list (reference :1138-1189; sorted
    instead of the reference's unordered ``list(set(...))``)."""
    if not authors_data:
        return []
    if isinstance(authors_data, list):
        names = []
        for author in authors_data:
            if isinstance(author, dict):
                name = (author.get("이름") or author.get("name") or "").strip()
                if name:
                    names.append(name)
            elif isinstance(author, str):
                name = author.strip()
                if name:
                    names.append(name)
        return sorted(set(names))
    if isinstance(authors_data, str):
        for sep in _AUTHOR_SEPARATORS:
            if sep in authors_data:
                names = [n.strip() for n in authors_data.split(sep) if n.strip()]
                return sorted(set(names))
        name = authors_data.strip()
        return [name] if name else []
    return []


def extract_metadata(text: str) -> dict:
    """Head-text metadata: deterministic stand-in for the reference's
    LLM extractor, feeding the reference-exact normalizers above."""
    title = ""
    for line in text.split("\n"):
        if line.strip():
            title = line.strip()
            break

    created_date = 0
    m = _DATE_RE.search(text)
    if m:
        date_str = m.group(1) + "-" + m.group(2)
        if m.group(3):
            date_str += "-" + m.group(3)
        created_date = parse_created_date(date_str)

    authors: list[str] = []
    for line in text.split("\n"):
        am = _AUTHOR_LINE_RE.match(line.strip())
        if am:
            authors = parse_authors(am.group(1))
            break

    return {"title": title, "created_date": created_date, "authors": authors}


def safe_join(iterable) -> str:
    """facade/basic_processor.py:1006-1009 — join any list/tuple/set of
    values with a trailing newline; anything else becomes ''. Pinned by
    the reference's tests/unit/test_helpers.py."""
    if not isinstance(iterable, (list, tuple, set)):
        return ""
    return "".join(map(str, iterable)) + "\n"
