"""Deterministic half of the E4 TOC enrichment (injected-TOC mode).

The reference's ``DocumentEnrichmentProcessor``
(docling/utils/document_enrichment.py) asks an LLM for a table of
contents, then applies a fully deterministic post-process:

- parse the TOC text into numbered items (``_parse_toc_content``,
  :634-683),
- dedupe near-identical boundary items with SequenceMatcher >= 0.92
  (``_similar`` / ``_dedupe_items``, :206-231),
- renumber by level structure (``_renumber``, :243-258) and combine
  per-window responses (``combine_windowed_toc``, :260-302),
- fuzzy-match TOC items back onto document text items and relabel them
  as section headers — either the greedy reversed-scan variant
  (``_apply_toc_to_document``, :685-768) or the order-preserving DP
  variant for law documents (``_match_toc_to_document`` +
  ``_select_best_toc_text_matching`` + ``_apply_toc_to_law_document``,
  :772-1030).

Only the LLM call is non-deterministic; everything here takes the TOC
text as an INPUT (injected), so the whole stage is reproducible and
unit-testable. As in the reference, enrichment is OFF by default and
never part of the byte-equality path.
"""

from __future__ import annotations

import difflib
import re

from doc_parser_ray.datamodel import (
    LIST_ITEM,
    SECTION_HEADER,
    TEXT,
    TITLE,
    Item,
)

# ----------------------------------------------------------- TOC parse

_TOC_LINE_PATTERNS = [
    # level-4 .. level-1 numbered lines, most specific first
    # (document_enrichment.py:652-658)
    re.compile(r"^(\d+\.\d+\.\d+\.\d+)\.\s*(.+)$"),
    re.compile(r"^(\d+\.\d+\.\d+)\.\s*(.+)$"),
    re.compile(r"^(\d+\.\d+)\.\s*(.+)$"),
    re.compile(r"^(\d+)\.\s*(.+)$"),
]

# leading [별지/별표 ...] / (...) / <...> bracket block + rest
# (document_enrichment.py:40-54)
_BRACKET_TITLE_PATTERN = re.compile(
    r"""
    ^\s*
    (
        \[(?=[^\]]*(?:별지|별표))[^\]]*\]
        |
        \((?=[^)]*(?:별지|별표))[^)]*\)
        |
        <(?=[^>]*(?:별지|별표))[^>]*>
    )
    \s*
    (.*)$
    """,
    re.VERBOSE,
)


def extract_toc_block(text: str) -> str:
    """Last ``<toc>...</toc>`` block if present, else the whole text
    (``extract_content``, :304-313)."""
    matches = re.findall(r"<toc>(.*?)</toc>", text, flags=re.S | re.I)
    if matches:
        return matches[-1].replace("```", "").strip()
    return text.strip()


def parse_toc_content(toc_content: str) -> dict:
    """TOC text → ``{"title": str|None, "toc_items": [...]}``
    (``_parse_toc_content``, :634-683). Non-numbered lines become
    level-1 items with an empty number."""
    toc_items: list[dict] = []
    document_title = None
    for line in toc_content.split("\n"):
        cleaned = line.strip()
        if not cleaned:
            continue
        if cleaned.startswith("TITLE:"):
            document_title = cleaned[6:].strip()
            continue
        matched = False
        for pattern in _TOC_LINE_PATTERNS:
            m = pattern.match(cleaned)
            if m:
                number = m.group(1)
                toc_items.append({
                    "number": number,
                    "title": m.group(2).strip(),
                    "level": number.count(".") + 1,
                    "full_text": cleaned,
                })
                matched = True
                break
        if not matched and cleaned:
            toc_items.append({
                "number": "",
                "title": cleaned,
                "level": 1,
                "full_text": cleaned,
            })
    return {"title": document_title, "toc_items": toc_items}


# ------------------------------------------------- dedupe / renumber


def similar(a: str, b: str, thr: float = 0.92) -> bool:
    """(``_similar``, :206-207)"""
    return difflib.SequenceMatcher(a=a.lower(), b=b.lower()).ratio() >= thr


def dedupe_toc_items(items: list[dict]) -> list[tuple]:
    """Drop a TOC item when the PREVIOUS kept item has nearly the same
    title (>=0.92) and a level within 1 — boundary duplicates from
    windowed TOC generation (``_dedupe_items``, :209-231). Returns
    (number, title, level, full_text) tuples like the reference."""
    deduped: list[tuple] = []
    for item in items:
        number, title = item["number"], item["title"]
        level, full_text = item["level"], item["full_text"]
        if deduped:
            _, ptitle, plevel, _ = deduped[-1]
            if abs(plevel - level) <= 1 and similar(ptitle, title):
                continue
        deduped.append((number, title, level, full_text))
    return deduped


def renumber(items: list[tuple]) -> list[str]:
    """(level, title) → "n.n.n. title" lines with hierarchical counters;
    shift so the minimum level becomes 1 (``_renumber``, :243-258)."""
    out: list[str] = []
    counters: dict[int, int] = {}
    min_lvl = min((level for _, _, level, _ in items), default=1)
    shift = (min_lvl - 1) if min_lvl > 1 else 0
    for _, title, level, _ in items:
        lvl = max(1, level - shift)
        counters[lvl] = counters.get(lvl, 0) + 1
        for k in list(counters):
            if k > lvl:
                del counters[k]
        parts = [str(counters[i]) for i in range(1, lvl + 1)]
        out.append(f"{'.'.join(parts)}. {title}")
    return out


def combine_windowed_toc(window_texts: list[str], *,
                         joiner: str = "\n") -> str:
    """Merge per-window TOC responses: first TITLE wins, items are
    concatenated, boundary-deduped, renumbered
    (``combine_windowed_toc``, :260-302)."""
    final_title = None
    collected: list[dict] = []
    for txt in window_texts:
        parsed = parse_toc_content(txt)
        if parsed["title"] and not final_title:
            final_title = parsed["title"]
        collected.extend(parsed["toc_items"])
    if not collected and not final_title:
        return ""
    lines = []
    if final_title:
        lines.append(f"TITLE:{final_title}")
    lines.extend(renumber(dedupe_toc_items(collected)))
    return joiner.join(lines)


# ----------------------------------------------------- item matching


def split_bracket_title(text: str):
    """("[별표 1]", "제목") split or None (``_split_bracket_title``,
    :846-874)."""
    m = _BRACKET_TITLE_PATTERN.match(text)
    if not m:
        return None
    return m.group(1).strip(), m.group(2).strip()


def select_best_toc_text_matching(
        candidate_matches: list[tuple]) -> list[dict]:
    """Max-total-score subset of (toc_idx, text_idx, score) edges that
    preserves both TOC order and text order — O(n²) chain DP
    (``_select_best_toc_text_matching``, :772-856)."""
    edges = []
    for toc_idx, text_list in candidate_matches:
        for text_info in text_list:
            edges.append({
                "toc_idx": toc_idx,
                "text_idx": text_info[0],
                "score": text_info[1],
            })
    if not edges:
        return []
    edges.sort(key=lambda x: (x["toc_idx"], x["text_idx"]))
    n = len(edges)
    dp = [0.0] * n
    prev = [-1] * n
    for i in range(n):
        dp[i] = edges[i]["score"]
        for j in range(i):
            if (edges[j]["toc_idx"] < edges[i]["toc_idx"]
                    and edges[j]["text_idx"] < edges[i]["text_idx"]
                    and dp[j] + edges[i]["score"] > dp[i]):
                dp[i] = dp[j] + edges[i]["score"]
                prev[i] = j
    best_end = max(range(n), key=lambda i: dp[i])
    seq = []
    cur = best_end
    while cur != -1:
        seq.append(cur)
        cur = prev[cur]
    seq.reverse()
    return [{"toc_idx": edges[i]["toc_idx"],
             "text_idx": edges[i]["text_idx"],
             "score": edges[i]["score"]} for i in seq]


def match_toc_to_document(text_items: list[tuple], toc_items: list[dict],
                          toc_range=None,
                          threshold: float = 0.7) -> list[dict]:
    """Law-document matching: PREFIX similarity of each TOC title (and
    its bracket-split parts) against candidate texts, top-5 per item,
    then the order-preserving DP (``_match_toc_to_document``,
    :876-925)."""
    if toc_range is None:
        toc_range = (0, len(toc_items))
    text_items_reversed = [
        (idx, re.sub(r" {2,}", " ", text.lower()))
        for idx, text in text_items[::-1]
    ]
    match_results = []
    for i_toc in range(toc_range[0], toc_range[1]):
        toc_item = toc_items[i_toc]
        toc_title = toc_item["title"]
        if len(toc_item["full_text"]) < 2:
            match_results.append((i_toc, []))
            continue
        toc_comp_list = [toc_title.lower()]
        split_result = split_bracket_title(toc_title)
        if split_result is not None:
            for part in split_result:
                if part and part not in toc_comp_list:
                    toc_comp_list.append(part.lower())
        scored = []
        for idx, text in text_items_reversed:
            similarity = 0.0
            for toc_text in toc_comp_list:
                sim = difflib.SequenceMatcher(
                    None, toc_text, text[: len(toc_text)]).ratio()
                similarity = max(similarity, sim)
            if similarity >= threshold:
                scored.append((idx, similarity, text))
        scored.sort(key=lambda x: x[1], reverse=True)
        match_results.append((i_toc, scored[:5]))
    return select_best_toc_text_matching(match_results)


# ------------------------------------------------- apply to item list


def convert_section_headers_to_text(items: list[Item]) -> list[Item]:
    """All SECTION_HEADER items become plain TEXT before re-labeling
    (``_convert_section_headers_to_text``, :602-624)."""
    out = []
    for it in items:
        if it.label == SECTION_HEADER:
            out.append(Item(label=TEXT, text=it.text,
                            content_layer=it.content_layer,
                            group=it.group, md_text=it.md_text))
        else:
            out.append(it)
    return out


def _match_title(items: list[Item], document_title: str,
                 eligible: list[tuple], converted: set) -> int:
    """Front-to-back title match: difflib.get_close_matches cutoff 0.3,
    then ratio >= 0.5 gate → TITLE label (:702-716 / :957-971)."""
    title_clean = document_title.strip()
    text_only = [text for _, text in eligible]
    close = difflib.get_close_matches(title_clean, text_only, n=3,
                                      cutoff=0.3)
    if not close:
        return 0
    best_text = close[0]
    best_idx = next((idx for idx, text in eligible if text == best_text),
                    None)
    if best_idx is None or best_idx in converted:
        return 0
    ratio = difflib.SequenceMatcher(
        None, title_clean.lower(), best_text.lower()).ratio()
    if ratio < 0.5:
        return 0
    it = items[best_idx]
    items[best_idx] = Item(label=TITLE, text=it.text, level=1,
                           content_layer=it.content_layer,
                           group=it.group, md_text=it.md_text)
    converted.add(best_idx)
    return 1


def apply_toc_to_items(items: list[Item], toc_content: str,
                       threshold: float = 0.5) -> tuple[list[Item], int]:
    """Standard (non-law) TOC application (``_apply_toc_to_document``,
    :685-768): demote existing section headers, match the document
    title, then scan text items BACK-TO-FRONT per TOC item with
    max(full-text, title) similarity >= threshold, take the best of the
    top 5, relabel as SECTION_HEADER at the TOC level. Returns the new
    item list and the matched count."""
    items = convert_section_headers_to_text(items)
    parsed = parse_toc_content(toc_content)
    document_title, toc_items = parsed["title"], parsed["toc_items"]

    converted: set[int] = set()
    eligible = [(i, it.text.strip()) for i, it in enumerate(items)
                if it.label == TEXT and len(it.text.strip()) >= 2]
    eligible_reversed = eligible[::-1]
    matched = 0
    if document_title and eligible:
        matched += _match_title(items, document_title, eligible, converted)

    for toc_item in toc_items:
        toc_full, toc_title = toc_item["full_text"], toc_item["title"]
        if len(toc_full) < 2:
            continue
        scored = []
        for idx, text in eligible_reversed:
            if idx in converted:
                continue
            sim_full = difflib.SequenceMatcher(
                None, toc_full.lower(), text.lower()).ratio()
            sim_title = difflib.SequenceMatcher(
                None, toc_title.lower(), text.lower()).ratio()
            similarity = max(sim_full, sim_title)
            if similarity >= threshold:
                scored.append((idx, similarity))
        scored.sort(key=lambda x: x[1], reverse=True)
        if scored:
            best_idx = scored[0][0]
            it = items[best_idx]
            items[best_idx] = Item(label=SECTION_HEADER, text=it.text,
                                   level=toc_item["level"],
                                   content_layer=it.content_layer,
                                   group=it.group, md_text=it.md_text)
            converted.add(best_idx)
            matched += 1
    return items, matched


def apply_law_toc_to_items(items: list[Item], toc_content: str,
                           threshold: float = 0.7) -> tuple[list[Item], int]:
    """Law-document TOC application (``_apply_toc_to_law_document``,
    :928-1030): eligibility widens to TEXT + LIST_ITEM, matching uses
    the prefix-similarity + order-preserving-DP pipeline."""
    items = convert_section_headers_to_text(items)
    parsed = parse_toc_content(toc_content)
    document_title, toc_items = parsed["title"], parsed["toc_items"]

    converted: set[int] = set()
    eligible = [(i, it.text.strip()) for i, it in enumerate(items)
                if it.label in (TEXT, LIST_ITEM)
                and len(it.text.strip()) >= 2]
    matched = 0
    if document_title and eligible:
        matched += _match_title(items, document_title, eligible, converted)

    best = match_toc_to_document(eligible, toc_items, threshold=threshold)
    for m in best:
        text_idx = m["text_idx"]
        if text_idx == -1:
            continue
        toc_item = toc_items[m["toc_idx"]]
        it = items[text_idx]
        items[text_idx] = Item(label=SECTION_HEADER, text=it.text,
                               level=toc_item["level"],
                               content_layer=it.content_layer,
                               group=it.group, md_text=it.md_text)
        converted.add(text_idx)
        matched += 1
    return items, matched
