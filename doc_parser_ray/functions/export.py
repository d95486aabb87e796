"""Per-turn export projections — the engine's analog of the reference's
output writers (SURVEY.md §2.1): markdown (S6 ``save_as_markdown``,
docling/cli/main.py:239-255), plain text (S6 ``strict_text=True``), and
doctags (S8 ``export_to_doctags``, groundtruth format of
/root/reference/tests/data/groundtruth/docling_v2/*.doctags.txt).

Exports are pure projections over the (extracted_text, spans) columns —
the span list losslessly carries (label, offsets, level), so no parser
state is needed. Attach with ``export_turns`` (stateless map_batches)
and sink with ``write_parquet`` / ``write_json``.
"""

from __future__ import annotations

import json

import pyarrow as pa

from doc_parser_ray.datamodel import (
    CAPTION,
    CODE,
    FORMULA,
    LIST_ITEM,
    SECTION_HEADER,
    TABLE,
    TITLE,
)


def esc_md_prose(t: str) -> str:
    """The markdown serializer's prose escaping — shared by every
    backend that pre-renders md_text (docling escapes &/</> as HTML
    entities plus the markdown underscore)."""
    return (t.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace("_", "\\_"))


def items_from_row(extracted_text: str, spans_json_str: str):
    """(label, text, level) triples reconstructed from one output row."""
    spans = json.loads(spans_json_str) if spans_json_str else []
    return [
        (sp["label"], extracted_text[sp["start"]: sp["end"]],
         int(sp.get("level", 0)))
        for sp in spans
    ]


def to_markdown(items) -> str:
    """Docling-style markdown serialization of the item sequence."""
    out: list[str] = []
    for label, text, level in items:
        if label == TITLE:
            out.append(f"# {text}")
        elif label == SECTION_HEADER:
            out.append("#" * (max(level, 1) + 1) + f" {text}")
        elif label == CODE:
            out.append(f"```\n{text}\n```")
        elif label == TABLE:
            rows = text.split("\n")
            md_rows = [f"| {r} |" for r in rows]
            if len(md_rows) >= 1:
                n_cols = rows[0].count(" | ") + 1
                md_rows.insert(1, "|" + " --- |" * n_cols)
            out.append("\n".join(md_rows))
        elif label == LIST_ITEM:
            out.append(text)  # marker already embedded
        elif label == CAPTION:
            out.append(text)
        else:
            out.append(text)
    return "\n\n".join(out)


def to_text(items) -> str:
    """``strict_text`` analog: item texts only, blank-line separated."""
    return "\n\n".join(text for _, text, _ in items if text)


def to_doctags(items) -> str:
    """Minimal doctags-style serialization: one tagged line per item."""
    parts = ["<doctag>"]
    for label, text, level in items:
        if label == SECTION_HEADER:
            parts.append(f"<section_header_level_{max(level, 1)}>"
                         f"{text}</section_header_level_{max(level, 1)}>")
        else:
            parts.append(f"<{label}>{text}</{label}>")
    parts.append("</doctag>")
    return "\n".join(parts)


def items_to_markdown(items) -> str:
    """Docling-compatible markdown export over raw ``Item`` objects —
    byte-matches the reference's committed HTML groundtruth
    (/root/reference/tests/data/groundtruth/docling_v2/*.html.md) for
    list/heading/paragraph/image content; tables render as an aligned
    github grid (docling uses ``tabulate``, whose numeric-column
    alignment we don't replicate — table goldens compare
    whitespace-normalized in tests/test_reference_goldens.py).

    Rules: FURNITURE excluded; TITLE → "# "; SECTION_HEADER level L →
    (L+1) #'s; consecutive list items grouped with single newlines and
    indented 4 spaces per nesting depth beyond the first; pictures →
    ``<!-- image -->``; blocks joined with blank lines.
    """
    from doc_parser_ray.datamodel import (
        BODY as _BODY,
        PICTURE as _PICTURE,
    )

    esc = esc_md_prose

    blocks: list[str] = []
    list_run: list[str] = []
    last_top_group: int | None = None

    def flush_list() -> None:
        if list_run:
            blocks.append("\n".join(list_run))
            list_run.clear()

    for it in items:
        if it.content_layer != _BODY:
            continue
        if it.label == LIST_ITEM:
            if it.level <= 1:
                # a SIBLING list (different group) starts a new block
                if last_top_group is not None and it.group != last_top_group:
                    flush_list()
                last_top_group = it.group
            indent = "    " * max(it.level - 1, 0)
            body = it.md_text if it.md_text else esc(it.text)
            text = f"{it.marker} {body}" if it.marker else body
            list_run.append(indent + text)
            continue
        last_top_group = None
        flush_list()
        if it.label == _PICTURE:
            blocks.append("<!-- image -->")
        elif it.label == TITLE:
            blocks.append(f"# {it.md_text if it.md_text else esc(it.text)}")
        elif it.label == SECTION_HEADER:
            body = it.md_text if it.md_text else esc(it.text)
            blocks.append("#" * (max(it.level, 1) + 1) + f" {body}")
        elif it.label == CODE:
            blocks.append(f"```\n{it.text}\n```")
        elif it.label == FORMULA:
            blocks.append(f"$${it.text}$$")
        elif it.label == TABLE:
            # a backend-prerendered table (JATS escape-after-pad) wins
            blocks.append(it.md_text if it.md_text else _md_table(it.text))
        elif it.md_text:
            # inline formatting pre-rendered by the backend (DOCX runs)
            blocks.append(it.md_text)
        elif it.text:
            blocks.append(esc(it.text))
    flush_list()
    return "\n\n".join(blocks)


def _md_table(text: str, escape_after: bool = False) -> str:
    """Aligned github-style grid from our ' | '-joined table text.

    Width/alignment rules reverse-engineered from the reference's
    tabulate-produced goldens: column width = max(longest body cell,
    header length + 2); body columns right-align when every cell is
    numeric AND non-empty (tabulate treats an empty cell as
    non-numeric); cells render raw (the HTML goldens keep "&"
    unescaped). ``escape_after=True`` (JATS goldens) applies the prose
    escaping to the FINISHED padded text — widths stay raw, escaped
    entities overflow their columns exactly like the reference's."""
    rows = [r.split(" | ") for r in text.split("\n")]
    n_cols = max(len(r) for r in rows)
    rows = [r + [""] * (n_cols - len(r)) for r in rows]
    header, body = rows[0], rows[1:]

    def _numeric(c: int) -> bool:
        vals = [r[c] for r in body]
        if not any(vals):
            return False
        try:
            for v in vals:
                float(v)  # empty cell → ValueError → non-numeric
            return True
        except ValueError:
            return False

    def _vis(cell: str) -> int:
        # tabulate measures cells with wcswidth, which returns -1 for
        # strings containing control characters (tabs): such cells
        # contribute nothing to the column width and receive
        # maxwidth+1 trailing spaces (csv-tab golden)
        if any(ord(ch) < 32 for ch in cell):
            return -1
        return len(cell)

    widths, aligns = [], []
    for c in range(n_cols):
        cell_w = max((_vis(r[c]) for r in body), default=0)
        widths.append(max(cell_w, _vis(header[c]) + 2))
        aligns.append("r" if _numeric(c) else "l")

    def _pad(cell: str, w: int, align: str) -> str:
        fill = w - _vis(cell)
        if fill <= 0:
            return cell
        return (" " * fill + cell) if align == "r" else (cell + " " * fill)

    out = []
    for i, r in enumerate(rows):
        cells = [_pad(cell, w, a)
                 for cell, w, a in zip(r, widths, aligns)]
        out.append("| " + " | ".join(cells) + " |")
        if i == 0:
            out.append("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    rendered = "\n".join(out)
    if escape_after:
        rendered = (rendered.replace("&", "&amp;").replace("<", "&lt;")
                    .replace(">", "&gt;"))
        # underscores escape only OUTSIDE $$...$$ math spans
        segs = rendered.split("$$")
        rendered = "$$".join(
            seg.replace("_", "\\_") if i % 2 == 0 else seg
            for i, seg in enumerate(segs)
        )
    return rendered


def to_html(items) -> str:
    """S7 ``save_as_html`` analog: minimal semantic HTML serialization
    of the item sequence (docling/cli/main.py:205-237; the reference's
    split-page visualizer needs rendered page images — out of scope).

    Self-consistency contract (tested): feeding the output back through
    ``extract_html`` reproduces the same item texts, so the writer and
    the HTML backend agree on one document model."""
    from html import escape as _esc

    out: list[str] = ["<!DOCTYPE html>", "<html><body>"]
    open_list = False

    def close_list() -> None:
        nonlocal open_list
        if open_list:
            out.append("</ul>")
            open_list = False

    for label, text, level in items:
        if label == LIST_ITEM:
            if not open_list:
                out.append("<ul>")
                open_list = True
            out.append(f"<li>{_esc(text)}</li>")
            continue
        close_list()
        if label == TITLE:
            out.append(f"<h1>{_esc(text)}</h1>")
        elif label == SECTION_HEADER:
            h = min(max(level, 1) + 1, 6)
            out.append(f"<h{h}>{_esc(text)}</h{h}>")
        elif label == CODE:
            out.append(f"<pre>{_esc(text)}</pre>")
        elif label == TABLE:
            rows = text.split("\n")
            out.append("<table>")
            for r in rows:
                cells = "".join(f"<td>{_esc(c)}</td>"
                                for c in r.split(" | "))
                out.append(f"<tr>{cells}</tr>")
            out.append("</table>")
        elif label == CAPTION:
            out.append(f"<figure><figcaption>{_esc(text)}</figcaption>"
                       f"</figure>")
        elif text:
            out.append(f"<p>{_esc(text)}</p>")
    close_list()
    out.append("</body></html>")
    return "\n".join(out)


_RENDERERS = {
    "markdown": to_markdown,
    "text": to_text,
    "doctags": to_doctags,
    "html": to_html,
}


def export_batch(batch: pa.Table, fmt: str) -> pa.Table:
    render = _RENDERERS[fmt]
    texts = batch.column("extracted_text").to_pylist()
    spans = batch.column("spans").to_pylist()
    col = pa.array(
        [render(items_from_row(t or "", s or "")) for t, s in zip(texts, spans)],
        pa.string(),
    )
    return batch.append_column(f"export_{fmt}", col)


def export_turns(ds, formats: tuple[str, ...] = ("markdown",)):
    """Attach export projection column(s) to a Dataset of extracted rows."""
    for fmt in formats:
        if fmt not in _RENDERERS:
            raise ValueError(f"unknown export format {fmt!r}")
        ds = ds.map_batches(
            lambda b, f=fmt: export_batch(b, f),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds
