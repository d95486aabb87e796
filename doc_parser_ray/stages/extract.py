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

import re

import pyarrow as pa

from doc_parser_ray.datamodel import (
    EXTRACTED_SCHEMA,
    STATUS_FAILURE,
    STATUS_OK,
    DocumentLimits,
    hist_json,
    label_histogram,
    render_items,
    spans_json,
)
from doc_parser_ray.functions.extract import content_hash, extract_payload

# tools whose payload is a base64-encoded binary blob — the on-disk file
# size the reference gates on (document.py:133-169) is the DECODED size
_B64_TOOLS = frozenset({"pdf", "docx", "xlsx", "pptx", "hwpx", "office_zip"})

# page objects in a raw PDF: "/Type /Page" but not "/Type /Pages"
# (the cheap census standing in for backend.page_count(), which the
# reference runs before the pipeline — document.py:160-168)
_PAGE_OBJ_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")


def _payload_size(text: str, tool: str) -> int:
    """Exact byte size of the payload as a file: utf-8 length for text
    formats, decoded-blob length for base64-carried ones (without
    decoding: 3 bytes per 4 chars minus padding)."""
    if tool in _B64_TOOLS:
        s = text.strip()
        if s and len(s) % 4 == 0:
            pad = 2 if s.endswith("==") else (1 if s.endswith("=") else 0)
            return len(s) // 4 * 3 - pad
    return len(text.encode("utf-8", "surrogatepass"))


def _gate(text: str, tool: str, limits: DocumentLimits) -> str:
    """'' if the payload passes the limits, else the failure reason.
    Size is checked before any parsing; the PDF page census decodes the
    blob (cheap, no text extraction) only when a page gate is set."""
    size = _payload_size(text, tool)
    if size > limits.max_file_size:
        return f"file size {size} exceeds max_file_size {limits.max_file_size}"
    if limits.pages_active and tool == "pdf":
        stripped = text.lstrip()
        if stripped.startswith("%PDF-"):
            data = stripped.encode("latin-1", "replace")
        else:
            import base64
            import binascii

            try:
                data = base64.b64decode(stripped, validate=True)
            except (binascii.Error, ValueError):
                return ""  # not decodable: let the parser report it
        n_pages = len(_PAGE_OBJ_RE.findall(data))
        if n_pages > limits.max_num_pages:
            return (f"page count {n_pages} exceeds max_num_pages "
                    f"{limits.max_num_pages}")
        if n_pages < limits.page_range[0]:
            return (f"page count {n_pages} below page_range start "
                    f"{limits.page_range[0]}")
    return ""


def extract_batch(batch: pa.Table,
                  limits: DocumentLimits | None = None,
                  enrich_toc: bool = False) -> pa.Table:
    """pyarrow batch of TRANSCRIPT_SCHEMA rows → EXTRACTED_SCHEMA rows.

    ``enrich_toc`` (default OFF, like the reference's
    ``do_toc_enrichment``) applies the deterministic injected-TOC
    relabeling (functions/toc_enrich.py) between parse and render when
    the batch carries a non-empty ``toc`` column for the row.
    """
    texts = batch.column("text").to_pylist()
    tools = batch.column("tool").to_pylist()
    tocs = (batch.column("toc").to_pylist()
            if enrich_toc and "toc" in batch.column_names else None)

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

    gate = limits if (limits is not None and limits.active) else None
    for i in range(n):
        text = texts[i] or ""
        tool = tools[i] or ""
        if gate is not None:
            reason = _gate(text, tool, gate)
            if reason:
                # reference shape: invalid InputDocument → FAILURE
                # result, no parsing (document_converter.py:421-430)
                fmts[i] = tool
                hashes[i] = content_hash(text)
                statuses[i] = STATUS_FAILURE
                errors[i] = reason
                n_in[i] = len(text)
                out_spans[i] = "[]"
                out_hists[i] = "{}"
                continue
        fmt, res = extract_payload(text, tool)
        fmts[i] = fmt
        hashes[i] = content_hash(text)
        statuses[i] = res.status
        errors[i] = res.error
        n_in[i] = len(text)
        if res.status == STATUS_OK:
            if tocs is not None and tocs[i]:
                from doc_parser_ray.functions.toc_enrich import (
                    apply_toc_to_items,
                    extract_toc_block,
                )

                res.items, _ = apply_toc_to_items(
                    res.items, extract_toc_block(tocs[i]))
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


def apply_extract(ds, *, batch_size: int = 256,
                  limits: DocumentLimits | None = None):
    """Attach the extraction stage to a Dataset.

    ``batch_size`` is modest because a single turn can carry a multi-KB
    (HTML) to multi-MB (base64 PDF) payload; batches are bounded by rows
    here and by ``DataContext.target_max_block_size`` upstream.

    ``limits`` (optional) applies the reference's DocumentLimits gates —
    oversized / over-paginated payloads come out as ``status="failure"``
    rows without being parsed.
    """
    import functools

    fn = (functools.partial(extract_batch, limits=limits)
          if limits is not None else extract_batch)
    return ds.map_batches(
        fn,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
