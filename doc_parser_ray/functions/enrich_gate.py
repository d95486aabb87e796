"""Deterministic halves of the reference's LLM enrichment gates.

The reference's document-quality / metadata enrichment
(``docling/utils/document_enrichment.py``) wraps three deterministic
computations around non-deterministic model calls; this module ports the
deterministic parts exactly and leaves the calls out of scope:

- ``is_non_meaningful_char`` / ``ocr_gate_features``: the
  text_len / non_ascii_ratio / space_ratio features fed to the OCR-need
  check (``:480-484``, ``:508-526`` — Hangul/CJK/kana and ASCII are
  meaningful, everything else counts toward the non-ascii ratio, spaces
  excluded).
- ``extract_substrings``: the 20%/50%/80%-centered sampling of long
  documents (``:527-601``), including its quirks — shortage extension,
  overlap shifting of later ranges, and the final clamp applied only to
  the LAST range.
- ``parse_decision`` / ``parse_metadata_response`` /
  ``parse_date_response``: the model-response parsers with their
  documented fallbacks (``:494-501``, ``:1038-1053``, ``:1099-1112``).
"""

from __future__ import annotations

import json
import re


def is_non_meaningful_char(c: str) -> bool:
    """document_enrichment.py:508-526."""
    if c.isspace():
        return False
    if "가" <= c <= "힣" or "ㄱ" <= c <= "ㅎ" or "ㅏ" <= c <= "ㅣ":
        return False
    if "一" <= c <= "鿿":
        return False
    if "぀" <= c <= "ヿ":
        return False
    if c.isascii():
        return False
    return True


def extract_substrings(text: str, length: int = 1000) -> str:
    """document_enrichment.py:527-601 — 20/50/80%-centered windows of
    ``length`` chars joined with newlines; short texts pass through."""
    text_len = len(text)
    if text_len < length * 3:
        return text
    half = length // 2
    centers = [int(text_len * f) for f in (0.2, 0.5, 0.8)]
    ranges = [(max(0, p - half), min(text_len, p + half)) for p in centers]

    for i, (start, end) in enumerate(ranges):
        shortage = length - (end - start)
        if shortage > 0:
            if start > 0:
                extend = min(shortage, start)
                start -= extend
                shortage -= extend
            if shortage > 0 and end < text_len:
                end += min(shortage, text_len - end)
            ranges[i] = (start, end)

    # overlap: shift LATER ranges back by the overlap amount
    for i in range(len(ranges)):
        for j in range(i + 1, len(ranges)):
            s1, e1 = ranges[i]
            s2, e2 = ranges[j]
            if s2 < e1:
                shift = e1 - s2
                ranges[j] = (s2 + shift, e2 + shift)

    # only the last range is clamped back to the text length
    if ranges[-1][1] > text_len:
        ranges[-1] = (ranges[-1][0], text_len)

    return "".join(text[s:e] + "\n" for s, e in ranges)


def ocr_gate_features(text: str, length: int = 1000) -> dict:
    """The feature triple the OCR-need prompt receives
    (document_enrichment.py:474-484): long texts sampled first, then
    text_len / non_ascii_ratio / space_ratio over the sample."""
    if len(text) > 3000:
        text = extract_substrings(text, length=length)
    text_len = len(text)
    if text_len == 0:
        return {"text_len": 0, "non_ascii_ratio": 0.0, "space_ratio": 1.0,
                "needs_ocr": True}
    non_ascii = sum(1 for c in text if is_non_meaningful_char(c)) / text_len
    space = text.count(" ") / text_len
    return {"text_len": text_len, "non_ascii_ratio": non_ascii,
            "space_ratio": space, "needs_ocr": False}


def parse_decision(response: str | None) -> str:
    """document_enrichment.py:494-501 — <decision>YES|NO</decision>,
    defaulting to YES (= OCR needed) when absent or empty."""
    if not response:
        return "YES"
    m = re.search(r"<decision>\s*(YES|NO)\s*</decision>", response,
                  re.IGNORECASE)
    return m.group(1).strip() if m else "YES"


_EMPTY_META = {"작성일": None, "작성자": []}


def parse_metadata_response(response: str | None) -> dict:
    """document_enrichment.py:1035-1053 — ```json block first, whole
    response second, empty-metadata fallback."""
    if not response:
        return dict(_EMPTY_META)
    m = re.search(r"```json\s*([\s\S]*?)\s*```", response)
    if m:
        try:
            return json.loads(m.group(1))
        except (json.JSONDecodeError, ValueError):
            return dict(_EMPTY_META)
    try:
        return json.loads(response)
    except (json.JSONDecodeError, ValueError):
        return dict(_EMPTY_META)


def parse_date_response(response: str | None) -> dict:
    """document_enrichment.py:1099-1112 — <date> tag first, whole-JSON
    second, empty-metadata fallback."""
    if not response:
        return dict(_EMPTY_META)
    m = re.search(r"<date>(.*?)</date>", response)
    if m:
        return {"작성일": m.group(1), "작성자": []}
    try:
        return json.loads(response)
    except (json.JSONDecodeError, ValueError):
        return dict(_EMPTY_META)
