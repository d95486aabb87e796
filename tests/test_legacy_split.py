"""C7 legacy splitter: recursive character split + the legacy service's
page-fix/empty-drop wrapper (preprocessor.py:186-221 semantics)."""

import pytest

from doc_parser_ray.functions.legacy_split import (
    fix_page,
    legacy_split_documents,
    recursive_split,
)


class TestRecursiveSplit:
    def test_short_text_single_chunk(self):
        assert recursive_split("hello world", chunk_size=100) == ["hello world"]

    def test_splits_on_paragraphs_first(self):
        text = "para one here\n\npara two here\n\npara three here"
        out = recursive_split(text, chunk_size=20, chunk_overlap=0)
        assert out == ["para one here", "para two here", "para three here"]

    def test_recurses_to_finer_separators(self):
        text = "line one\nline two\nline three"
        out = recursive_split(text, chunk_size=12, chunk_overlap=0)
        assert out == ["line one", "line two", "line three"]

    def test_word_level_packing(self):
        text = "aa bb cc dd ee"
        out = recursive_split(text, chunk_size=6, chunk_overlap=0)
        assert out == ["aa bb", "cc dd", "ee"]

    def test_overlap_carries_tail(self):
        text = "aa bb cc dd"
        out = recursive_split(text, chunk_size=7, chunk_overlap=4)
        # each chunk carries the previous tail piece (overlap window 4)
        assert out[0] == "aa bb"
        assert out[1].startswith("bb") or out[1].startswith(" bb")
        assert "".join(p.replace(" ", "") for p in [out[0], out[-1]]).count("dd")

    def test_every_char_covered(self):
        text = "The quick brown fox jumps over the lazy dog. " * 20
        out = recursive_split(text, chunk_size=50, chunk_overlap=10)
        assert all(len(c) <= 50 for c in out)
        # reassembled (ignoring overlaps/strip) must cover the input words
        joined = " ".join(out)
        for word in set(text.split()):
            assert word in joined

    def test_character_fallback_for_unbreakable_runs(self):
        text = "x" * 25
        out = recursive_split(text, chunk_size=10, chunk_overlap=0)
        assert all(len(c) <= 10 for c in out)
        assert "".join(out) == text

    def test_chunks_are_stripped(self):
        out = recursive_split("  aa bb  \n\n  cc dd  ", chunk_size=12,
                              chunk_overlap=0)
        assert all(c == c.strip() for c in out)


class TestLegacyWrapper:
    def test_page_fix_zero_based_documents(self):
        assert fix_page(0, "report.pdf") == 1
        assert fix_page(3, "report.pdf") == 4
        assert fix_page(-1, "report.pdf") == -1  # negative left alone

    def test_page_fix_images_already_one_based(self):
        assert fix_page(2, "scan.jpg") == 2
        assert fix_page(0, "scan.png") == 1  # clamp non-positive
        assert fix_page(-3, "scan.jpeg") == 1

    def test_split_documents_counts_and_pages(self):
        docs = [
            {"text": "para\n\n" + "word " * 50, "page": 0, "source": "a.pdf"},
            {"text": "short", "page": 1, "source": "a.pdf"},
        ]
        chunks, counts = legacy_split_documents(
            docs, chunk_size=60, chunk_overlap=0)
        assert all(c["text"] for c in chunks)
        assert set(counts) == {1, 2}
        assert counts[2] == sum(1 for c in chunks if c["page"] == 2)

    def test_empty_document_raises(self):
        with pytest.raises(ValueError):
            legacy_split_documents([{"text": "", "page": 0, "source": ""}])


class TestLegacyStage:
    def test_legacy_chunk_batch_counters(self):
        import pyarrow as pa

        from doc_parser_ray.stages.chunk import legacy_chunk_batch

        batch = pa.table({
            "conv_id": ["c1", "c1"],
            "turn_idx": pa.array([0, 1], pa.int32()),
            "extracted_text": ["word " * 100, "tiny"],
        })
        out = legacy_chunk_batch(batch, chunk_size=80, chunk_overlap=0)
        assert out.num_rows > 2
        rows = out.to_pylist()
        t0 = [r for r in rows if r["turn_idx"] == 0]
        t1 = [r for r in rows if r["turn_idx"] == 1]
        assert all(r["page"] == 1 for r in t0)  # 0-based -> 1-based
        assert all(r["page"] == 2 for r in t1)
        assert [r["i_chunk_on_page"] for r in t0] == list(range(len(t0)))
        assert all(r["n_chunk_of_page"] == len(t0) for r in t0)
        assert len(t1) == 1 and t1[0]["chunk_text"] == "tiny"
