"""C6 pdf bbox back-match: overlap-merge semantics and provenance."""

from doc_parser_ray.functions.pdf_bbox import (
    chunk_bboxes_json,
    merge_overlapping_bboxes,
    pdf_chunk_bboxes,
)
from doc_parser_ray.functions.pdf_extract import extract_pdf
from doc_parser_ray.sources.pdf_gen import make_pdf, simple_text_pdf


def _box(page, l, t, r, b, typ="text"):
    return {"page": page, "type": typ, "bbox": {"l": l, "t": t, "r": r, "b": b}}


class TestMerge:
    def test_overlap_chain_collapses(self):
        boxes = [_box(1, 0.0, 0.0, 0.3, 0.1),
                 _box(1, 0.25, 0.05, 0.6, 0.15),
                 _box(1, 0.55, 0.1, 0.9, 0.2)]
        out = merge_overlapping_bboxes(boxes, 0.01, 0.01)
        assert len(out) == 1
        bb = out[0]["bbox"]
        assert (bb["l"], bb["t"], bb["r"], bb["b"]) == (0.0, 0.0, 0.9, 0.2)

    def test_pages_do_not_merge(self):
        boxes = [_box(1, 0, 0, 1, 1), _box(2, 0, 0, 1, 1)]
        assert len(merge_overlapping_bboxes(boxes, 1, 1)) == 2

    def test_non_text_passthrough(self):
        boxes = [_box(1, 0, 0, 1, 1), _box(1, 0, 0, 1, 1, typ="image")]
        out = merge_overlapping_bboxes(boxes, 1, 1)
        assert sorted(b["type"] for b in out) == ["image", "text"]

    def test_tolerance_gap(self):
        near = [_box(1, 0.0, 0.0, 0.4, 0.1), _box(1, 0.4005, 0.0, 0.8, 0.1)]
        assert len(merge_overlapping_bboxes(near, 0.001, 0.001)) == 1
        far = [_box(1, 0.0, 0.0, 0.4, 0.1), _box(1, 0.5, 0.0, 0.8, 0.1)]
        assert len(merge_overlapping_bboxes(far, 0.001, 0.001)) == 2


class TestBackmatch:
    def test_multiline_paragraph_rects(self):
        long_para = " ".join(f"word{i}" for i in range(60))
        pdf = simple_text_pdf([long_para, "short tail block"])
        res = extract_pdf(pdf)
        assert res.status == "ok"
        rects = pdf_chunk_bboxes(pdf, res.items[0].text)
        assert rects
        # all rects normalized and on page 1
        for r in rects:
            v = r["bbox"]
            assert r["page"] == 1
            assert 0 <= v["l"] <= v["r"] <= 1
            assert 0 <= v["t"] <= v["b"] <= 1
        # the long paragraph spans more vertical extent than the tail
        tail = pdf_chunk_bboxes(pdf, res.items[-1].text)
        span = max(r["bbox"]["b"] for r in rects) - min(
            r["bbox"]["t"] for r in rects)
        tail_span = max(r["bbox"]["b"] for r in tail) - min(
            r["bbox"]["t"] for r in tail)
        assert span > tail_span

    def test_unmatched_text_empty(self):
        pdf = simple_text_pdf(["hello world"])
        assert pdf_chunk_bboxes(pdf, "completely different content") == []
        assert chunk_bboxes_json(pdf, "") == "[]"

    def test_json_flattening(self):
        pdf = simple_text_pdf(["hello world"])
        res = extract_pdf(pdf)
        s = chunk_bboxes_json(pdf, res.items[0].text)
        assert s.startswith('[{"page":1,"type":"text"')


class TestSearchForEmulation:
    """Exact fitz-search_for semantics: substring rects, line spanning,
    case folding, dehyphenation, and the cell-granularity fallback."""

    def test_midline_substring_rect_is_clipped(self):
        pdf = make_pdf([[(100, 700, 12, "alpha beta gamma delta")]])
        full = pdf_chunk_bboxes(pdf, "alpha beta gamma delta")
        sub = pdf_chunk_bboxes(pdf, "beta gamma")
        assert len(full) == 1 and len(sub) == 1
        fb, sb = full[0]["bbox"], sub[0]["bbox"]
        assert fb["l"] < sb["l"] and sb["r"] < fb["r"]
        assert fb["t"] == sb["t"] and fb["b"] == sb["b"]

    def test_match_spanning_lines_gives_rect_per_line(self):
        pdf = make_pdf([[(100, 700, 12, "first line words here"),
                         (100, 684, 12, "second line words too")]])
        rects = pdf_chunk_bboxes(pdf, "words here second line")
        # one rect per line portion; far enough apart not to merge? they
        # are adjacent lines -> merge may union them; check pre-merge via
        # vertical extent instead: union must span both lines
        top = min(r["bbox"]["t"] for r in rects)
        bot = max(r["bbox"]["b"] for r in rects)
        one_line = pdf_chunk_bboxes(pdf, "first line")[0]["bbox"]
        assert bot - top > (one_line["b"] - one_line["t"]) * 1.5

    def test_case_insensitive(self):
        pdf = make_pdf([[(100, 700, 12, "Alpha Beta Gamma")]])
        assert pdf_chunk_bboxes(pdf, "alpha BETA gamma")

    def test_dehyphenation_joins_line_break(self):
        pdf = make_pdf([[(100, 700, 12, "this is an exam-"),
                         (100, 684, 12, "ple of wrapping")]])
        rects = pdf_chunk_bboxes(pdf, "example of wrapping")
        assert rects
        # the hit covers both lines
        top = min(r["bbox"]["t"] for r in rects)
        bot = max(r["bbox"]["b"] for r in rects)
        assert bot - top > 16 / 792.0

    def test_multiple_occurrences_all_found(self):
        pdf = make_pdf([[(100, 700, 12, "needle in the hay"),
                         (100, 300, 12, "another needle in the hay")]])
        rects = pdf_chunk_bboxes(pdf, "needle in the hay")
        assert len(rects) == 2  # far apart, not merged

    def test_fallback_when_needle_superset_of_page(self):
        pdf = make_pdf([[(100, 700, 12, "alpha beta gamma")]])
        rects = pdf_chunk_bboxes(pdf, "prefix alpha beta gamma suffix")
        assert len(rects) == 1  # exact search misses; cell fallback hits
