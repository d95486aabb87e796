"""Deterministic WordPiece-style tokenizer — the stand-in for the
reference's HF tokenizer (``sentence-transformers/all-MiniLM-L6-v2``,
genon/preprocessor/facade/intelligent_processor.py:352-354). The
environment ships no model weights, so the vocabulary is built
DETERMINISTICALLY at construction time (clearly a stand-in, not a fake
of the real vocab): frequent English subwords + suffix merges +
single characters, matched greedily longest-first with ``##``
continuation pieces — the WordPiece algorithm itself is the public
construction (Wu et al. 2016; BERT).

Construction is deliberately the expensive step (trie build) so the
stage exercises the real actor-pool shape: load once per actor in
``__init__``, tokenize per batch in ``__call__``.

``count_tokens_hf`` replicates the reference's counting harness
(:376-415): text split into ≤300-char pieces, each tokenized, counts
summed.
"""

from __future__ import annotations

import re

# deterministic subword inventory: common English affixes/roots — the
# kind of pieces a trained WordPiece vocab contains. Order is
# irrelevant (greedy longest-match); content is fixed for
# reproducibility.
_SUBWORDS = [
    "the", "and", "ing", "ion", "tion", "ation", "ed", "er", "est",
    "ly", "ity", "ment", "ness", "able", "ible", "al", "ial", "ic",
    "ous", "ive", "ate", "ize", "ise", "ful", "less", "ship", "hood",
    "ward", "wise", "ant", "ent", "ance", "ence", "ism", "ist", "ure",
    "age", "dom", "ary", "ery", "ory", "an", "en", "in", "on", "un",
    "re", "de", "dis", "over", "under", "out", "up", "pre", "pro",
    "con", "com", "per", "sub", "inter", "trans", "super", "semi",
    "anti", "mid", "non", "mis", "for", "with", "of", "to", "is",
    "are", "was", "be", "that", "this", "it", "as", "at", "or", "by",
    "from", "have", "has", "had", "not", "but", "what", "all", "were",
    "we", "when", "your", "can", "said", "there", "use", "each",
    "which", "she", "do", "how", "their", "if", "will", "way",
    "about", "many", "then", "them", "would", "like", "so", "these",
    "her", "long", "make", "thing", "see", "him", "two", "look",
    "more", "day", "could", "go", "come", "did", "number", "sound",
    "no", "most", "people", "my", "than", "first", "water", "been",
    "call", "who", "oil", "its", "now", "find", "down", "side",
    "st", "th", "ch", "sh", "ph", "wh", "qu", "ck", "ng", "ll",
    "ss", "tt", "ee", "oo", "ea", "ou", "ai", "ie", "00", "19", "20",
]


class DeterministicWordPiece:
    """Greedy longest-match subword tokenizer over a fixed vocab."""

    _WORD_RE = re.compile(r"[^\W_]+|[^\w\s]", re.UNICODE)

    def __init__(self, max_piece_len: int = 8,
                 cache_size: int = 200_000):
        self.max_piece_len = max_piece_len
        # trie as nested dicts; True marker = piece boundary
        self._trie: dict = {}
        for piece in _SUBWORDS:
            node = self._trie
            for ch in piece:
                node = node.setdefault(ch, {})
            node["\0"] = True
        # per-word piece-count memo: natural-language word frequency is
        # Zipf-distributed, so the hot words dominate — bounded so actor
        # heap stays predictable
        self._count_cache: dict[str, int] = {}
        self._cache_size = cache_size

    def _longest_piece(self, word: str, start: int) -> int:
        """Length of the longest vocab piece at ``start`` (≥1; single
        chars are always in-vocab, the WordPiece character fallback)."""
        node = self._trie
        best = 1
        i = start
        limit = min(len(word), start + self.max_piece_len)
        while i < limit:
            node = node.get(word[i])
            if node is None:
                break
            i += 1
            if "\0" in node:
                best = i - start
        return best

    def tokenize_word(self, word: str) -> list[str]:
        pieces: list[str] = []
        i = 0
        lw = word.lower()
        while i < len(lw):
            ln = self._longest_piece(lw, i)
            piece = lw[i: i + ln]
            pieces.append(piece if i == 0 else f"##{piece}")
            i += ln
        return pieces

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for m in self._WORD_RE.finditer(text):
            out.extend(self.tokenize_word(m.group(0)))
        return out

    def _count_word(self, w: str) -> int:
        cached = self._count_cache.get(w)
        if cached is not None:
            return cached
        n = 0
        i = 0
        while i < len(w):
            i += self._longest_piece(w, i)
            n += 1
        if len(self._count_cache) < self._cache_size:
            self._count_cache[w] = n
        return n

    def count(self, text: str) -> int:
        n = 0
        for m in self._WORD_RE.finditer(text):
            n += self._count_word(m.group(0).lower())
        return n

    def count_tokens_hf(self, text: str | None,
                        piece_chars: int = 300) -> int:
        """Reference counting harness (intelligent_processor.py:376-415):
        split into ≤``piece_chars`` slices, tokenize each, sum."""
        if text is None:
            return 0
        total = 0
        for i in range(0, len(text), piece_chars):
            total += self.count(text[i: i + piece_chars])
        return total
