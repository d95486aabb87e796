"""Extraction stage: transcript rows → extracted rows.

One stateless ``map_batches`` UDF over zero-copy Arrow batches
(``batch_format="pyarrow"``). The per-payload work is necessarily
per-row Python (it is a parser), but all column plumbing stays Arrow:
inputs are read column-wise from the ``pyarrow.Table`` batch and outputs
are built as Arrow arrays once per batch — no pandas, no row dicts.

This is the Ray-native replacement for the reference's sequential
``DocumentConverter._convert`` loop (docling/document_converter.py:327-349,
which even disables its thread pool because "PDF backends are not
thread-safe") — here every batch is an independent task and the
streaming executor pipelines them.
"""

from __future__ import annotations

import pyarrow as pa

from doc_parser_ray.datamodel import (
    EXTRACTED_SCHEMA,
    STATUS_OK,
    hist_json,
    label_histogram,
    render_items,
    spans_json,
)
from doc_parser_ray.functions.extract import content_hash, extract_payload


def extract_batch(batch: pa.Table) -> pa.Table:
    """pyarrow batch of TRANSCRIPT_SCHEMA rows → EXTRACTED_SCHEMA rows."""
    texts = batch.column("text").to_pylist()
    tools = batch.column("tool").to_pylist()

    n = len(texts)
    fmts: list[str] = [""] * n
    hashes: list[str] = [""] * n
    out_texts: list[str] = [""] * n
    out_spans: list[str] = [""] * n
    out_hists: list[str] = [""] * n
    statuses: list[str] = [""] * n
    errors: list[str] = [""] * n
    n_items: list[int] = [0] * n
    n_in: list[int] = [0] * n
    n_out: list[int] = [0] * n

    for i in range(n):
        text = texts[i] or ""
        fmt, res = extract_payload(text, tools[i] or "")
        fmts[i] = fmt
        hashes[i] = content_hash(text)
        statuses[i] = res.status
        errors[i] = res.error
        n_in[i] = len(text)
        if res.status == STATUS_OK:
            extracted, spans = render_items(res.items)
            out_texts[i] = extracted
            out_spans[i] = spans_json(spans)
            out_hists[i] = hist_json(label_histogram(res.items))
            n_items[i] = len(res.items)
            n_out[i] = len(extracted)
        else:
            out_spans[i] = "[]"
            out_hists[i] = "{}"

    return pa.table(
        {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx").cast(pa.int32()),
            "role": batch.column("role"),
            "tool": batch.column("tool"),
            "ts": batch.column("ts"),
            "format": pa.array(fmts, pa.string()),
            "content_hash": pa.array(hashes, pa.string()),
            "extracted_text": pa.array(out_texts, pa.string()),
            "spans": pa.array(out_spans, pa.string()),
            "label_hist": pa.array(out_hists, pa.string()),
            "status": pa.array(statuses, pa.string()),
            "error": pa.array(errors, pa.string()),
            "n_items": pa.array(n_items, pa.int32()),
            "n_chars_in": pa.array(n_in, pa.int64()),
            "n_chars_out": pa.array(n_out, pa.int64()),
        },
        schema=EXTRACTED_SCHEMA,
    )


def apply_extract(ds, *, batch_size: int = 256):
    """Attach the extraction stage to a Dataset.

    ``batch_size`` is modest because a single turn can carry a multi-KB
    (HTML) to multi-MB (base64 PDF) payload; batches are bounded by rows
    here and by ``DataContext.target_max_block_size`` upstream.
    """
    return ds.map_batches(
        extract_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
