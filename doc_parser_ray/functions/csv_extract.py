"""CSV extraction — reimplements the reference's ``CsvDocumentBackend``
(/root/reference/docling/backend/csv_backend.py:52-131):

  - dialect sniffed over the FIRST LINE with candidate delimiters
    ``, ; \\t | :`` (:57-65); unknown delimiter → parse error;
  - strict ``csv.reader`` parse of the whole payload;
  - non-uniform rows allowed, padded to the widest row (:73-80 warns,
    the table is still built with num_cols = max row length);
  - whole file becomes ONE table, first row = column headers (:94-117).

Golden-verified against the reference's committed groundtruth
(tests/data/groundtruth/docling_v2/csv-*.csv.md) in
tests/test_reference_goldens.py.
"""

from __future__ import annotations

import csv
import io

from doc_parser_ray.datamodel import (
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_ERROR,
    TABLE,
    Item,
    ParseResult,
)

_DELIMITERS = ",;\t|:"


def extract_csv(payload: str) -> ParseResult:
    if not payload or not payload.strip():
        return ParseResult(items=[], status=STATUS_EMPTY)
    try:
        head = payload.split("\n", 1)[0]
        dialect = csv.Sniffer().sniff(head, _DELIMITERS)
        if dialect.delimiter not in set(_DELIMITERS):
            return ParseResult(
                items=[], status=STATUS_PARSE_ERROR,
                error=f"unknown csv delimiter {dialect.delimiter!r}",
            )
        rows = list(csv.reader(io.StringIO(payload), dialect=dialect,
                               strict=True))
        rows = [r for r in rows if r]  # trailing blank line
        if not rows:
            return ParseResult(items=[], status=STATUS_EMPTY)
        num_cols = max(len(r) for r in rows)
        padded = [r + [""] * (num_cols - len(r)) for r in rows]
        # cells keep their exact text (incl. literal tabs from quoted
        # fields — csv-tab.csv golden); only newlines (our row
        # separator) are replaced
        text = "\n".join(
            " | ".join(c.replace("\r", " ").replace("\n", " ") for c in r)
            for r in padded
        )
        return ParseResult(items=[Item(label=TABLE, text=text)],
                           status=STATUS_OK)
    except Exception as e:  # noqa: BLE001 — errors are data
        return ParseResult(items=[], status=STATUS_PARSE_ERROR,
                           error=f"{type(e).__name__}: {e}")
