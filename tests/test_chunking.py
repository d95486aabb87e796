"""Chunking stage (C1–C5) unit + pipeline tests.

Mirrors the reference chunker semantics
(genon/preprocessor/facade/intelligent_processor.py): heading-context
maintenance, greedy token packing, standalone tables, oversize splits,
small-chunk merging, and the per-turn / per-conversation counters.
"""

import json

import pytest

from doc_parser_ray.functions.textstats import count_tokens
from doc_parser_ray.stages.chunk import chunk_items, chunk_batch

import pyarrow as pa


def _spans(*items):
    """Build (spans, texts) from (label, text[, level]) tuples."""
    spans, texts = [], []
    for it in items:
        label, text = it[0], it[1]
        level = it[2] if len(it) > 2 else 1
        spans.append({"label": label, "level": level})
        texts.append(text)
    return spans, texts


class TestChunkItems:
    def test_single_small_item_one_chunk(self):
        spans, texts = _spans(("text", "hello world"))
        out = chunk_items(spans, texts, max_tokens=100)
        assert len(out) == 1
        assert out[0]["text"] == "hello world"

    def test_heading_context_prepended(self):
        spans, texts = _spans(
            ("section_header", "Intro", 1), ("text", "body one")
        )
        out = chunk_items(spans, texts, max_tokens=100)
        assert len(out) == 1
        assert out[0]["text"] == "Intro\nbody one"
        assert out[0]["headings"] == ["Intro"]

    def test_heading_stack_cleared_at_or_below(self):
        # reference :276-282 — a new h1 clears the h2 context
        spans, texts = _spans(
            ("section_header", "A", 1),
            ("section_header", "A.1", 2),
            ("text", "deep"),
            ("section_header", "B", 1),
            ("text", "shallow"),
        )
        out = chunk_items(spans, texts, max_tokens=2)
        assert out[0]["headings"] == ["A", "A.1"]
        assert out[1]["headings"] == ["B"]
        assert out[1]["text"] == "B\nshallow"

    def test_greedy_packing_respects_budget(self):
        items = [("text", f"w{i} " + "tok " * 9) for i in range(10)]
        spans, texts = _spans(*items)
        out = chunk_items(spans, texts, max_tokens=25)
        # each item ~10 tokens → 2 per chunk
        assert all(c["body_tokens"] <= 25 for c in out)
        # reconstruction: bodies concatenated == original item sequence
        joined = "\n".join(c["text"] for c in out)
        assert joined == "\n".join(texts)

    def test_table_standalone(self):
        spans, texts = _spans(
            ("text", "before"), ("table", "a | b"), ("text", "after")
        )
        out = chunk_items(spans, texts, max_tokens=1000)
        # table must not merge with neighbors even though all fit
        assert [c["is_table"] for c in out] == [False, True, False]

    def test_oversize_item_split(self):
        big = "tok " * 50
        spans, texts = _spans(("text", big.strip()))
        out = chunk_items(spans, texts, max_tokens=20)
        assert len(out) >= 2
        assert all(count_tokens(c["text"]) <= 20 for c in out)
        assert " ".join(c["text"] for c in out) == big.strip()

    def test_small_chunks_merge(self):
        # two tiny items separated by a section change do NOT merge;
        # two tiny items in the same section DO
        spans, texts = _spans(("text", "a b"), ("text", "c d"))
        out = chunk_items(spans, texts, max_tokens=100)
        assert len(out) == 1  # greedy already packs them

    def test_merge_after_table_break(self):
        # items split by a standalone table leave two small text chunks
        # in the same context → C4 cannot merge across the table
        spans, texts = _spans(
            ("text", "a b"), ("table", "t"), ("text", "c d")
        )
        out = chunk_items(spans, texts, max_tokens=100)
        assert len(out) == 3

    def test_empty_items(self):
        assert chunk_items([], [], max_tokens=10) == []


class TestChunkBatch:
    def _batch(self, payload_items):
        spans, texts = _spans(*payload_items)
        full = "\n".join(texts)
        pos, enriched = 0, []
        for sp, t in zip(spans, texts):
            sp = dict(sp, start=pos, end=pos + len(t))
            enriched.append(sp)
            pos += len(t) + 1
        return pa.table(
            {
                "conv_id": pa.array(["c1"]),
                "turn_idx": pa.array([0], pa.int32()),
                "spans": pa.array([json.dumps(enriched)]),
                "extracted_text": pa.array([full]),
            }
        )

    def test_span_provenance(self):
        # an unsplit chunk's body must equal the extracted_text slice
        # of its span (chunk_bboxes analog)
        batch = self._batch([("text", "alpha beta"), ("text", "gamma")])
        out = chunk_batch(batch, max_tokens=100)
        assert out.num_rows == 1
        full = batch.column("extracted_text").to_pylist()[0]
        s = out.column("span_start").to_pylist()[0]
        e = out.column("span_end").to_pylist()[0]
        assert full[s:e] == out.column("chunk_text").to_pylist()[0]

    def test_counters_per_turn(self):
        batch = self._batch(
            [("text", "tok " * 30), ("text", "tok " * 30)]
        )
        out = chunk_batch(batch, max_tokens=35)
        assert out.num_rows == 2
        assert out.column("chunk_idx").to_pylist() == [0, 1]
        assert out.column("n_chunk_of_turn").to_pylist() == [2, 2]
        nc = out.column("n_char").to_pylist()
        nw = out.column("n_word").to_pylist()
        assert all(c > 0 for c in nc) and all(w == 30 for w in nw)


@pytest.mark.usefixtures("ray_session")
class TestChunkPipeline:
    def test_conv_counters_global(self):
        import ray.data

        from doc_parser_ray.sources.transcripts import synth_table
        from doc_parser_ray.stages.chunk import (
            assemble_chunk_counters,
            chunk_turns,
        )
        from doc_parser_ray.stages.extract import apply_extract
        from doc_parser_ray.util import collect_table

        ds = ray.data.from_arrow(synth_table(12, seed=7, max_turns=30))
        chunks = chunk_turns(apply_extract(ds), max_tokens=60)
        out = collect_table(assemble_chunk_counters(chunks, num_partitions=4))
        df = out.to_pandas()
        for conv_id, grp in df.groupby("conv_id"):
            grp = grp.sort_values(["turn_idx", "chunk_idx"]).reset_index(drop=True)
            # chunk_ord is the dense global rank in (turn_idx, chunk_idx) order
            assert sorted(grp["chunk_ord"]) == list(range(len(grp)))
            assert (
                grp.sort_values("chunk_ord")[["turn_idx", "chunk_idx"]].values.tolist()
                == grp[["turn_idx", "chunk_idx"]].values.tolist()
            )
            assert (grp["n_chunks_of_conv"] == len(grp)).all()


class TestVectorText:
    """GenOS vector text composition (basic_processor.py:1134-1136) and
    the section-header-order invariant pinned by the reference's
    tests/unit/test_section_header_order.py."""

    def test_header_marker_line(self):
        from doc_parser_ray.stages.chunk import compose_vector_text

        assert compose_vector_text(["A", "B"], "body") == "HEADER: A, B\nbody"
        assert compose_vector_text([], "body") == "body"

    def test_add_vector_text_column(self):
        import json

        import pyarrow as pa

        from doc_parser_ray.stages.chunk import add_vector_text

        tab = pa.table({
            "headings": [json.dumps(["H1", "H2"]), json.dumps([])],
            "chunk_text": ["x", "y"],
        })
        out = add_vector_text(tab)
        assert out.column("vector_text").to_pylist() == \
            ["HEADER: H1, H2\nx", "y"]

    def test_section_headers_in_document_order(self):
        # deeper header replaced on shallower re-entry: the HEADER line
        # of later chunks must list the LIVE context in level order
        import re

        from doc_parser_ray.datamodel import SECTION_HEADER
        from doc_parser_ray.stages.chunk import (
            chunk_items,
            compose_vector_text,
        )

        items = [
            {"label": SECTION_HEADER, "level": 1},
            {"label": "text"},
            {"label": SECTION_HEADER, "level": 2},
            {"label": "text"},
            {"label": SECTION_HEADER, "level": 1},
            {"label": "text"},
        ]
        texts = ["Top A", "alpha body words", "Sub A1",
                 "beta body words", "Top B", "gamma body words"]
        chunks = chunk_items(items, texts, max_tokens=4)
        rendered = [compose_vector_text(c["headings"], c["text"])
                    for c in chunks]
        headers = [re.findall(r"HEADER:\s*(.+?)\n", r) for r in rendered]
        flat = [h[0] for h in headers if h]
        assert flat[0] == "Top A"
        assert "Top A, Sub A1" in flat
        assert flat[-1] == "Top B"  # Sub A1 cleared by the level-1 re-entry
