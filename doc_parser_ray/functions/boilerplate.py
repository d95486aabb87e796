"""Boilerplate scoring heuristics — text-density / link-ratio metrics
per HTML payload (the public boilerplate-detection signals from the
Boilerpipe line of work: Kohlschütter et al., WSDM 2010 "Boilerplate
Detection using Shallow Text Features"; also used by readability/
trafilatura-style main-content scorers).

The extraction pipeline's equality path strips boilerplate via the
reference's tag whitelist (html_extract.py); these metrics are the
complementary SCORING surface: per-turn densities that a corpus
quality gate can threshold on, computed on the same DOM in one pass.

  - text_density: text chars / (tags + 1) — wrapper-heavy markup
    (nav/chrome) scores low, prose scores high;
  - link_density: chars under <a> / total text chars — navigation
    blocks approach 1.0, body text stays low;
  - anchor_count / tag_count: raw structure signals.
"""

from __future__ import annotations

from doc_parser_ray.functions.html_extract import (
    _DomBuilder,
    _FastTokenizeError,
    _fast_build_dom,
    _Node,
)


def boilerplate_stats(payload: str) -> dict:
    """Shallow text-feature metrics for one HTML payload."""
    out = {"text_chars": 0, "link_chars": 0, "tag_count": 0,
           "anchor_count": 0, "link_density": 0.0, "text_density": 0.0}
    if not payload or not payload.strip():
        return out
    try:
        try:
            root = _fast_build_dom(payload)
        except _FastTokenizeError:
            builder = _DomBuilder()
            builder.feed(payload)
            builder.close()
            root = builder.root
    except Exception:
        return out

    text_chars = 0
    link_chars = 0
    tag_count = 0
    anchor_count = 0
    # iterative DFS carrying the in-anchor flag
    stack: list[tuple[object, bool]] = [(root, False)]
    while stack:
        node, in_anchor = stack.pop()
        for child in node.children:
            if isinstance(child, str):
                n = len(child.strip())
                text_chars += n
                if in_anchor:
                    link_chars += n
            elif isinstance(child, _Node):
                tag_count += 1
                is_anchor = child.name == "a"
                if is_anchor:
                    anchor_count += 1
                if child.name not in ("script", "style"):
                    stack.append((child, in_anchor or is_anchor))
    out.update(
        text_chars=text_chars,
        link_chars=link_chars,
        tag_count=tag_count,
        anchor_count=anchor_count,
        link_density=(link_chars / text_chars) if text_chars else 0.0,
        text_density=text_chars / (tag_count + 1),
    )
    return out
