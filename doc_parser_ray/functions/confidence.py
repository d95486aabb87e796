"""Confidence scoring — reimplementation of the reference's
text-quality rating and ConfidenceReport aggregation semantics:

  - ``rate_text_quality`` ports the M1 per-cell heuristics
    (docling/models/page_preprocessing_model.py:25-31, :115-141):
    replacement-char / GLYPH<..> / /G123-run / slash-token garbage →
    0.0; fragmented-word patterns ≥ 3 → 0.1 penalty each;
  - a turn (the page analog) gets ``parse_score`` = the 10 %-quantile
    of its item scores (":80-85");
  - per-turn mean/low scores follow PageConfidenceScores nan-mean /
    nan-quantile(0.05) over the four score slots (ocr/layout/table stay
    NaN on this equality path, mirroring ``do_ocr=False`` production
    config) and the conversation (document analog) aggregates page
    means per ConfidenceReport
    (docling/datamodel/base_models.py:378-457);
  - grades: <0.5 poor, <0.8 fair, <0.9 good, ≥0.9 excellent
    (":385-394").
"""

from __future__ import annotations

import json
import re

import numpy as np

_BLACKLIST_CHARS = ("�",)
_GLYPH_RE = re.compile(r"GLYPH<[0-9A-Fa-f]+>")
_SLASH_G_RE = re.compile(r"(?:/G\d+){2,}")
_FRAG_RE = re.compile(r"\b[A-Za-z](?:/[a-z]{1,3}\.[a-z]{1,3}){2,}\b")
_SLASH_NUMBER_GARBAGE_RE = re.compile(r"(?:/\w+\s*){2,}")

GRADE_POOR = "poor"
GRADE_FAIR = "fair"
GRADE_GOOD = "good"
GRADE_EXCELLENT = "excellent"
GRADE_UNSPECIFIED = "unspecified"


def rate_text_quality(text: str) -> float:
    """page_preprocessing_model.py:115-141 verbatim."""
    if (
        any(text.find(c) >= 0 for c in _BLACKLIST_CHARS)
        or _GLYPH_RE.search(text)
        or _SLASH_G_RE.search(text)
        or _SLASH_NUMBER_GARBAGE_RE.match(text)
    ):
        return 0.0
    penalty = 0.0
    frag_matches = _FRAG_RE.findall(text)
    if len(frag_matches) >= 3:
        penalty += 0.1 * len(frag_matches)
    return max(1.0 - penalty, 0.0)


def score_to_grade(score: float) -> str:
    """base_models.py:384-394."""
    if np.isnan(score):
        return GRADE_UNSPECIFIED
    if score < 0.5:
        return GRADE_POOR
    elif score < 0.8:
        return GRADE_FAIR
    elif score < 0.9:
        return GRADE_GOOD
    elif score >= 0.9:
        return GRADE_EXCELLENT
    return GRADE_UNSPECIFIED


def turn_parse_score(extracted_text: str, spans_json: str = "") -> float:
    """Parse score of one turn (the page analog): 10 %-quantile of the
    per-item quality scores (page_preprocessing_model.py:70-85). Items
    come from the spans column when present, else text lines."""
    pieces: list[str] = []
    if spans_json:
        try:
            for sp in json.loads(spans_json):
                pieces.append(extracted_text[sp["start"]: sp["end"]])
        except (ValueError, KeyError, TypeError):
            pieces = []
    if not pieces:
        pieces = [ln for ln in (extracted_text or "").split("\n") if ln]
    if not pieces:
        return float("nan")
    return float(np.nanquantile(
        [rate_text_quality(p) for p in pieces], q=0.10))


def page_scores(parse_score: float) -> tuple[float, float]:
    """(mean_score, low_score) of one turn: nan-mean / nan-quantile(.05)
    over the four slots; ocr/layout/table are NaN on this path
    (base_models.py:396-433)."""
    slots = [float("nan"), float("nan"), float("nan"), parse_score]
    if np.all(np.isnan(slots)):
        return float("nan"), float("nan")
    return (float(np.nanmean(slots)),
            float(np.nanquantile([s for s in slots if not np.isnan(s)],
                                 q=0.05)))


def conversation_rollup(parse_scores: np.ndarray) -> dict:
    """ConfidenceReport document aggregation (base_models.py:435-457):
    doc mean_score = nanmean of page mean scores, doc low_score =
    nanmean of page low scores, plus grades."""
    if len(parse_scores) == 0 or np.all(np.isnan(parse_scores)):
        mean = low = float("nan")
    else:
        pages = [page_scores(s) for s in parse_scores]
        mean = float(np.nanmean([m for m, _l in pages]))
        low = float(np.nanmean([_l for _m, _l in pages]))
    return {
        "mean_score": mean,
        "low_score": low,
        "mean_grade": score_to_grade(mean),
        "low_grade": score_to_grade(low),
    }
