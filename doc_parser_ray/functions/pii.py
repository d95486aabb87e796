"""PII redaction for training-data pipelines — vectorized RE2 passes.

Classic web-corpus scrubbing (emails, card numbers, resident-registration
numbers, phone numbers, IPv4) as a fixed, ordered chain of
``pyarrow.compute.replace_substring_regex`` kernels: zero-copy in, one
pass per pattern, no Python per row. Order matters where patterns could
overlap (cards before RRNs before phones), so both this module and any
SQL oracle must apply the same sequence.

pyarrow and DuckDB both execute RE2, so the patterns below behave
identically on both engines — that is what makes the ``pii_redact``
query exactly oracle-checkable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — applied strictly in this order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "<CARD>"),
    ("rrn", r"\b\d{6}-\d{7}\b", "<RRN>"),
    ("phone", r"\b0\d{1,2}-\d{3,4}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_column(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Replace every PII match with its placeholder, all rows at once."""
    for _, pattern, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pattern,
                                         replacement=repl)
    return col


def count_pii(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Per-row total PII matches (counted on the progressively redacted
    text, mirroring the replacement order so overlaps count once)."""
    total = None
    for _, pattern, repl in PII_PATTERNS:
        n = pc.count_substring_regex(col, pattern=pattern)
        total = n if total is None else pc.add(total, n)
        col = pc.replace_substring_regex(col, pattern=pattern,
                                         replacement=repl)
    return total


def redact_batch(batch: pa.Table, col: str = "text",
                 out_col: str = "red_text") -> pa.Table:
    """Batch transform: adds the redacted column and an ``n_pii`` count."""
    text = batch.column(col)
    batch = batch.append_column(out_col, redact_column(text))
    return batch.append_column("n_pii", pc.cast(count_pii(text), pa.int64()))
