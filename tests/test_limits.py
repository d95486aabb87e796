"""S4 input-limit gates: byte-size and PDF page-count rejection
(DocumentLimits analog of docling/datamodel/settings.py:22-25 enforced
by docling/datamodel/document.py:133-169 — an over-limit input comes out
as a FAILURE-status row without being parsed, matching
document_converter.py:421-430)."""

import base64

import pyarrow as pa

from doc_parser_ray.datamodel import (
    STATUS_FAILURE,
    STATUS_OK,
    DocumentLimits,
    TRANSCRIPT_SCHEMA,
)
from doc_parser_ray.sources.office_gen import simple_docx
from doc_parser_ray.sources.pdf_gen import simple_text_pdf
from doc_parser_ray.stages.extract import (
    _payload_size,
    extract_batch,
)


def _batch(payloads: list[tuple[str, str]]) -> pa.Table:
    n = len(payloads)
    return pa.table(
        {
            "conv_id": pa.array([str(i) for i in range(n)], pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array([p[0] for p in payloads], pa.string()),
            "tool": pa.array([p[1] for p in payloads], pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


class TestPayloadSize:
    def test_text_is_utf8_bytes(self):
        assert _payload_size("abc", "markdown") == 3
        assert _payload_size("é", "markdown") == 2  # utf-8, not chars

    def test_b64_is_decoded_size(self):
        for blob in (b"x", b"xy", b"xyz", b"abcdef", b"\x00" * 100):
            enc = base64.b64encode(blob).decode()
            assert _payload_size(enc, "docx") == len(blob), blob

    def test_invalid_b64_falls_back_to_raw_length(self):
        # odd-length payload that can't be base64: gate on what we have
        assert _payload_size("abc", "docx") == 3


class TestSizeGate:
    def test_over_limit_fails_without_parsing(self):
        docx = base64.b64encode(simple_docx(["hello"])).decode()
        size = _payload_size(docx, "docx")
        out = extract_batch(
            _batch([(docx, "docx")]),
            limits=DocumentLimits(max_file_size=size - 1),
        ).to_pylist()[0]
        assert out["status"] == STATUS_FAILURE
        assert "max_file_size" in out["error"]
        assert out["extracted_text"] == ""
        assert out["n_items"] == 0

    def test_at_limit_passes(self):
        docx = base64.b64encode(simple_docx(["hello"])).decode()
        size = _payload_size(docx, "docx")
        out = extract_batch(
            _batch([(docx, "docx")]),
            limits=DocumentLimits(max_file_size=size),
        ).to_pylist()[0]
        assert out["status"] == STATUS_OK
        assert out["extracted_text"] == "hello"

    def test_mixed_batch_gates_per_row(self):
        small = "tiny"
        big = "word " * 100
        rows = extract_batch(
            _batch([(small, "markdown"), (big, "markdown")]),
            limits=DocumentLimits(max_file_size=64),
        ).to_pylist()
        assert rows[0]["status"] == STATUS_OK
        assert rows[1]["status"] == STATUS_FAILURE

    def test_default_limits_are_noop(self):
        big = "word " * 100_000
        out = extract_batch(_batch([(big, "markdown")]),
                            limits=DocumentLimits()).to_pylist()[0]
        assert out["status"] == STATUS_OK


class TestPageGate:
    def test_max_num_pages(self):
        two_pages = base64.b64encode(
            simple_text_pdf(["word " * 200] * 6)).decode()
        ok = extract_batch(
            _batch([(two_pages, "pdf")]),
            limits=DocumentLimits(max_num_pages=2),
        ).to_pylist()[0]
        assert ok["status"] == STATUS_OK
        rej = extract_batch(
            _batch([(two_pages, "pdf")]),
            limits=DocumentLimits(max_num_pages=1),
        ).to_pylist()[0]
        assert rej["status"] == STATUS_FAILURE
        assert "max_num_pages" in rej["error"]

    def test_page_range_start(self):
        one_page = base64.b64encode(simple_text_pdf(["hi"])).decode()
        rej = extract_batch(
            _batch([(one_page, "pdf")]),
            limits=DocumentLimits(page_range=(2, 10)),
        ).to_pylist()[0]
        assert rej["status"] == STATUS_FAILURE
        assert "page_range" in rej["error"]

    def test_page_gate_ignores_non_pdf(self):
        md = "just text"
        out = extract_batch(
            _batch([(md, "markdown")]),
            limits=DocumentLimits(max_num_pages=1),
        ).to_pylist()[0]
        assert out["status"] == STATUS_OK
