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
    LIST_ITEM,
    SECTION_HEADER,
    TABLE,
    TITLE,
)


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


_RENDERERS = {
    "markdown": to_markdown,
    "text": to_text,
    "doctags": to_doctags,
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
