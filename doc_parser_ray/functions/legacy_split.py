"""C7 — the legacy service's recursive character splitter path.

The reference's legacy processors split with langchain's public
``RecursiveCharacterTextSplitter`` and then apply service-side fixes
(``genon/preprocessor/src/preprocessor.py:186-221``): drop empty chunks,
raise on an all-empty document, convert 0-based page metadata to 1-based
EXCEPT for image files (already 1-based; only clamp non-positive pages
to 1), and count chunks per page.

``recursive_split`` reimplements the splitter's documented algorithm
(recursive descent over ["\\n\\n", "\\n", " ", ""] with
keep-separator-as-prefix regex splitting, greedy merge up to
``chunk_size`` with an overlap window popped from the front, whitespace
strip on join) from the public API semantics — not a code copy; langchain
is not vendored in this repo.
"""

from __future__ import annotations

import os
import re
from collections import Counter

DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]
_IMAGE_EXTS = {".jpg", ".jpeg", ".png"}


def _split_with_separator(text: str, sep: str) -> list[str]:
    """Split keeping each separator as a prefix of the following piece
    (the splitter's keep_separator=True mode); '' splits to characters."""
    if not sep:
        return [c for c in text]
    parts = re.split(f"({re.escape(sep)})", text)
    out = [parts[0]] if parts[0] != "" else []
    for i in range(1, len(parts) - 1, 2):
        piece = parts[i] + parts[i + 1]
        if piece != "":
            out.append(piece)
    if len(parts) % 2 == 0 and parts[-1] != "":
        out.append(parts[-1])
    return out


def _join_chunks(pieces: list[str]) -> str | None:
    text = "".join(pieces).strip()
    return text or None


def _merge_pieces(pieces: list[str], chunk_size: int,
                  chunk_overlap: int) -> list[str]:
    """Greedy packing with the splitter's overlap rule: when a chunk
    closes, pop from the front until the carried total is within the
    overlap budget (and the next piece fits)."""
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for piece in pieces:
        plen = len(piece)
        if total + plen > chunk_size:
            if current:
                joined = _join_chunks(current)
                if joined is not None:
                    docs.append(joined)
                while total > chunk_overlap or (
                    total + plen > chunk_size and total > 0
                ):
                    total -= len(current[0])
                    current = current[1:]
        current.append(piece)
        total += plen
    joined = _join_chunks(current)
    if joined is not None:
        docs.append(joined)
    return docs


def recursive_split(text: str, chunk_size: int = 4000,
                    chunk_overlap: int = 200,
                    separators: list[str] | None = None) -> list[str]:
    """Recursive character split: coarsest separator present splits the
    text; oversized pieces recurse on the finer separators; sized pieces
    merge greedily with overlap."""
    seps = list(separators) if separators is not None else DEFAULT_SEPARATORS
    sep = seps[-1]
    rest: list[str] = []
    for i, s in enumerate(seps):
        if s == "" or s in text:
            sep = s
            rest = seps[i + 1:]
            break

    out: list[str] = []
    good: list[str] = []
    for piece in _split_with_separator(text, sep):
        if len(piece) < chunk_size:
            good.append(piece)
            continue
        if good:
            out.extend(_merge_pieces(good, chunk_size, chunk_overlap))
            good = []
        if rest:
            out.extend(recursive_split(piece, chunk_size, chunk_overlap, rest))
        else:
            out.append(piece)
    if good:
        out.extend(_merge_pieces(good, chunk_size, chunk_overlap))
    return out


def fix_page(page, source: str = "") -> int:
    """preprocessor.py:203-218 — images are already 1-based (clamp <=0 to
    1); everything else converts 0-based >= 0 to 1-based."""
    ext = os.path.splitext(source)[-1].lower() if source else ""
    if not isinstance(page, int):
        return page
    if ext in _IMAGE_EXTS:
        return 1 if page <= 0 else page
    return page + 1 if page >= 0 else page


def legacy_split_documents(
    docs: list[dict], *, chunk_size: int = 4000, chunk_overlap: int = 200,
) -> tuple[list[dict], Counter]:
    """The legacy ``split_documents`` contract over plain dict documents
    ``{"text": ..., "page": ..., "source": ...}``: split, drop empties,
    raise on an all-empty result, fix pages, count chunks per page.
    Returns (chunks, page_chunk_counts)."""
    chunks: list[dict] = []
    for doc in docs:
        for piece in recursive_split(
            doc.get("text", ""), chunk_size, chunk_overlap
        ):
            if piece:
                chunks.append({
                    "text": piece,
                    "page": doc.get("page", 1),
                    "source": doc.get("source", ""),
                })
    if not chunks:
        raise ValueError("Empty document")
    counts: Counter = Counter()
    for chunk in chunks:
        chunk["page"] = fix_page(chunk["page"], chunk["source"])
        counts[chunk["page"]] += 1
    return chunks, counts
