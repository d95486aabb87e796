"""Text analysis functions for large-scale training-data pipelines:
token counting, quality scoring, language ID, fingerprinting.

These extend the reference's per-record text metrics
(``GenOSVectorMeta.n_char/n_word/n_line`` derivations,
genon/preprocessor/facade/intelligent_processor.py:921-927) and its
token-counting fallback (``words * 1.3`` when no tokenizer —
intelligent_processor.py:376-415) into standalone, vectorizable
functions. All are pure and deterministic; the batch wrappers operate
on pyarrow arrays.
"""

from __future__ import annotations

import re

_BPE_RE = re.compile(
    # GPT-2-style pre-tokenizer pattern (public domain pattern shape):
    # contractions | words | numbers | punctuation runs | whitespace runs
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-zÀ-ɏ一-鿿]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

_PUNCT_RE = re.compile(r"[^\w\s]")
_DIGIT_RE = re.compile(r"\d")

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language identifier (the standard public approach — cf. Cavnar &
# Trenkle 1994 n-gram categorization; profiles here are stopword sets).
_LANG_STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the a of and to in is that it for on with as was at by an be this have from or".split()),
    "es": frozenset("el la de que y a en un ser se no haber por con su para como estar le lo los las una".split()),
    "fr": frozenset("le la de et les des en un une du que est pour qui dans ce il au sur se ne pas plus par".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an".split()),
}


def n_words(text: str) -> int:
    """Reference n_word: whitespace token count (intelligent_processor.py:923)."""
    return len(text.split())


def n_lines(text: str) -> int:
    """Reference n_line: newline-separated line count (":924")."""
    return len(text.split("\n"))


def count_tokens(text: str) -> int:
    """BPE-ish token estimate: regex pre-tokenization (word/number/punct
    runs). Deterministic, no model download — the scale analog of the
    reference's HF tokenizer count with its ``words*1.3`` fallback
    (intelligent_processor.py:376-415)."""
    return len(_BPE_RE.findall(text))


def count_tokens_fallback(text: str) -> int:
    """The reference's exact fallback estimate: int(words * 1.3)."""
    return int(n_words(text) * 1.3)


def quality_stats(text: str) -> dict[str, float]:
    """Deterministic quality signals (length / punctuation / stopword
    ratios — the classic boilerplate-vs-content heuristics family)."""
    n_chars = len(text)
    words = text.split()
    nw = len(words)
    n_punct = len(_PUNCT_RE.findall(text))
    n_digit = len(_DIGIT_RE.findall(text))
    lw = [w.lower().strip(".,;:!?\"'()[]") for w in words]
    n_stop = sum(1 for w in lw if w in _LANG_STOPWORDS["en"])
    return {
        "n_chars": float(n_chars),
        "n_words": float(nw),
        "avg_word_len": (sum(len(w) for w in words) / nw) if nw else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "digit_ratio": (n_digit / n_chars) if n_chars else 0.0,
        "stopword_ratio": (n_stop / nw) if nw else 0.0,
    }


def detect_language(text: str) -> str:
    """Stopword-profile language ID. Returns the language with the most
    stopword hits; ties / no hits → "und". (zh handled by CJK-char
    ratio first.)"""
    if not text:
        return "und"
    n_cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if n_cjk > 0.2 * len(text):
        return "zh"
    words = [w.lower().strip(".,;:!?\"'()[]") for w in text.split()]
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang, stops in _LANG_STOPWORDS.items():
        hits = sum(1 for w in words if w in stops)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "und"


_FP_MOD = (1 << 61) - 1
_FP_BASE = 257


def fingerprint(text: str, window: int = 64) -> int:
    """Rolling-hash document fingerprint: minimum Rabin-Karp hash over
    all ``window``-byte windows of the normalized text (a winnowing-style
    scheme — Schleimer et al., SIGMOD 2003). Stable across runs."""
    data = " ".join(text.split()).lower().encode("utf-8")
    n = len(data)
    if n == 0:
        return 0
    if n <= window:
        h = 0
        for b in data:
            h = (h * _FP_BASE + b) % _FP_MOD
        return h
    h = 0
    pw = pow(_FP_BASE, window - 1, _FP_MOD)
    for b in data[:window]:
        h = (h * _FP_BASE + b) % _FP_MOD
    best = h
    for i in range(window, n):
        h = ((h - data[i - window] * pw) * _FP_BASE + data[i]) % _FP_MOD
        if h < best:
            best = h
    return best


def normalize_for_dedup(text: str) -> str:
    """Canonical text form for duplicate detection: lowercase, collapse
    all whitespace runs to single spaces, strip."""
    return " ".join(text.lower().split())
