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


_GFP_P = 2147483647      # Mersenne 2^31-1: products stay inside int64
_GFP_WORD_BASE = 257     # byte-Horner base for word hashes
_GFP_GRAM_BASE = 1000003  # word-hash-Horner base for gram hashes


def gram_fingerprint_batch(texts, k: int = 5):
    """Vectorized winnowing-style document fingerprint, SQL-twinnable:
    min over all word-``k``-gram rolling hashes, where

      word_hash(w) = Horner fold of the character codes, base 257
                     mod 2^31-1  (0 for the empty word);
      gram_hash    = Horner fold of k word hashes, base 1000003
                     mod 2^31-1;
      fingerprint  = min over gram windows (docs with fewer than k
                     words use one gram over all their words; the
                     empty text is the single empty word, fp 0).

    All arithmetic stays below 2^52, so int64 is exact on both sides —
    the DuckDB oracle reproduces it with list_reduce/list_transform.
    Tokenization is ``split(' ')`` (SQL ``string_split(text, ' ')``);
    character codes via the utf-8 byte view, which equals DuckDB's
    ``ascii()`` code points on ASCII corpora (the testdata contract).

    Accepts a pyarrow string column; returns an int64 numpy array.
    Vectorized: one split, one byte-Horner over the flattened word
    buffer (max-word-length passes), one gram-Horner (k passes), one
    ``minimum.reduceat`` — no per-word or per-gram Python.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = (texts.combine_chunks()
           if isinstance(texts, pa.ChunkedArray) else texts)
    arr = pc.fill_null(arr, "")
    # the buffer walk below assumes 32-bit offsets — a large_string
    # input would silently misread them (round-4 advisor item), so
    # normalize the physical layout up front
    if not pa.types.is_string(arr.type):
        arr = arr.cast(pa.string())
    words = pc.split_pattern(arr, pattern=" ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    import numpy as np

    n_docs = len(arr)
    offs = words.offsets.to_numpy().astype(np.int64)
    lens = offs[1:] - offs[:-1]           # words per doc (>= 1)
    flat = words.values                   # flattened word array
    # --- word hashes: Horner over the raw utf-8 buffer, vectorized
    w_offs = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
        flat.offset: flat.offset + len(flat) + 1].astype(np.int64)
    buf = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    w_len = w_offs[1:] - w_offs[:-1]
    wh = np.zeros(len(flat), dtype=np.int64)
    max_len = int(w_len.max()) if len(w_len) else 0
    for j in range(max_len):
        alive = w_len > j
        idx = w_offs[:-1][alive] + j
        wh[alive] = (wh[alive] * _GFP_WORD_BASE + buf[idx]) % _GFP_P
    # --- gram hashes per doc (k_eff = min(k, n_words))
    k_eff = np.minimum(lens, k)
    nst = lens - k_eff + 1                # gram windows per doc (>= 1)
    total = int(nst.sum())
    first = np.repeat(np.cumsum(nst) - nst, nst)
    rel = np.arange(total, dtype=np.int64) - first
    starts = rel + np.repeat(offs[:-1], nst)
    kk = np.repeat(k_eff, nst)            # per-gram effective width
    gh = wh[starts].copy()
    for j in range(1, k):
        sel = kk > j
        gh[sel] = (gh[sel] * _GFP_GRAM_BASE + wh[starts[sel] + j]) % _GFP_P
    doc_starts = np.cumsum(nst) - nst
    out = np.minimum.reduceat(gh, doc_starts) if total else \
        np.zeros(n_docs, dtype=np.int64)
    return out.astype(np.int64)


def normalize_for_dedup(text: str) -> str:
    """Canonical text form for duplicate detection: lowercase, collapse
    all whitespace runs to single spaces, strip."""
    return " ".join(text.lower().split())
