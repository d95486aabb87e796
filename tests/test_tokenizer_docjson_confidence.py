"""C2 (WordPiece actor-pool tokenizer), S10 (lossless document JSON)
and ConfidenceReport rollup tests."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from doc_parser_ray.functions.confidence import (
    conversation_rollup,
    rate_text_quality,
    score_to_grade,
    turn_parse_score,
)
from doc_parser_ray.functions.doc_json import (
    extract_doc_json,
    items_to_doc_json,
)
from doc_parser_ray.functions.export import items_to_markdown, to_doctags
from doc_parser_ray.functions.wordpiece import DeterministicWordPiece
from doc_parser_ray.util import collect_table


class TestWordPiece:
    def test_deterministic(self):
        a, b = DeterministicWordPiece(), DeterministicWordPiece()
        text = "The preprocessing pipeline normalizes documentation."
        assert a.tokenize(text) == b.tokenize(text)
        assert a.count(text) == len(a.tokenize(text))

    def test_subword_splitting(self):
        tok = DeterministicWordPiece()
        pieces = tok.tokenize("preprocessing")
        assert pieces[0] == "pre"
        assert all(p.startswith("##") for p in pieces[1:])
        assert "".join(p.removeprefix("##") for p in pieces) == \
            "preprocessing"

    def test_count_tokens_hf_piece_split(self):
        tok = DeterministicWordPiece()
        text = "word " * 200  # crosses the 300-char piece boundary
        # piece-split counting equals whole-text counting for
        # whitespace-separable text
        assert tok.count_tokens_hf(text) == tok.count(text)
        assert tok.count_tokens_hf(None) == 0

    def test_every_char_tokenizable(self):
        tok = DeterministicWordPiece()
        assert tok.count("Ωβγ 漢字 ~~!@#") > 0


@pytest.mark.usefixtures("ray_session")
class TestTokenizerStage:
    def test_actor_pool_counts(self):
        from doc_parser_ray.stages.tokenize import count_tokens_dataset

        tab = pa.table({"text": pa.array(
            ["hello world", "the preprocessing of documents", ""]
        )})
        out = collect_table(count_tokens_dataset(
            ray.data.from_arrow(tab), concurrency=(1, 2)))
        tok = DeterministicWordPiece()
        assert out.column("n_tokens_bpe").to_pylist() == [
            tok.count_tokens_hf("hello world"),
            tok.count_tokens_hf("the preprocessing of documents"),
            0,
        ]

    def test_wordpiece_chunking_matches_local(self):
        from doc_parser_ray.sources.transcripts import transcripts_dataset
        from doc_parser_ray.stages.chunk import chunk_batch
        from doc_parser_ray.stages.extract import apply_extract
        from doc_parser_ray.stages.tokenize import chunk_turns_wordpiece

        ds = apply_extract(
            transcripts_dataset(n_convs=12, seed=5, max_turns=20)
        ).materialize()
        via_actor = collect_table(
            chunk_turns_wordpiece(ds, max_tokens=120, concurrency=(1, 2))
        ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending"),
                   ("chunk_idx", "ascending")])
        tok = DeterministicWordPiece()
        local = chunk_batch(collect_table(ds), max_tokens=120,
                            count_fn=tok.count_tokens_hf).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending"),
             ("chunk_idx", "ascending")])
        assert via_actor.equals(local)
        # token budgets hold under the REAL counts (non-split chunks)
        for row in local.to_pylist():
            if row["n_chunk_of_turn"] > 1 and not row["is_table"]:
                assert row["n_tokens"] <= 120 + tok.count_tokens_hf(
                    row["headings"])  # heading prefix allowance

    def test_counts_differ_from_estimate(self):
        from doc_parser_ray.functions.textstats import count_tokens

        tok = DeterministicWordPiece()
        text = "internationalization preprocessing deduplication"
        assert tok.count_tokens_hf(text) != count_tokens(text)


FIXTURES = [
    ("/root/reference/tests/data/html/example_01.html", "html"),
    ("/root/reference/tests/data/md/blocks.md", "markdown"),
    ("/root/reference/tests/data/csv/csv-comma.csv", "csv"),
    ("/root/reference/tests/data/docx/word_sample.docx", "docx"),
    ("/root/reference/tests/data/xlsx/test-01.xlsx", "xlsx"),
    ("/root/reference/tests/data/pptx/powerpoint_sample.pptx", "pptx"),
    ("/root/reference/tests/data/jats/bmj_sample.xml", "jats"),
]


class TestDocJson:
    def _extract(self, path, kind):
        mode = "rb" if kind in ("docx", "xlsx", "pptx", "jats") else "r"
        with open(path, mode) as f:
            data = f.read()
        if kind == "html":
            from doc_parser_ray.functions.html_extract import extract_html
            return extract_html(data)
        if kind == "markdown":
            from doc_parser_ray.functions.md_extract import extract_markdown
            return extract_markdown(data)
        if kind == "csv":
            from doc_parser_ray.functions.csv_extract import extract_csv
            return extract_csv(data)
        if kind == "docx":
            from doc_parser_ray.functions.docx_extract import extract_docx
            return extract_docx(data)
        if kind == "xlsx":
            from doc_parser_ray.functions.xlsx_extract import extract_xlsx
            return extract_xlsx(data)
        if kind == "pptx":
            from doc_parser_ray.functions.pptx_extract import extract_pptx
            return extract_pptx(data)
        from doc_parser_ray.functions.jats_extract import extract_jats
        return extract_jats(data)

    @pytest.mark.parametrize("path,kind", FIXTURES,
                             ids=[k for _p, k in FIXTURES])
    def test_lossless_roundtrip(self, path, kind):
        if not os.path.exists(path):
            pytest.skip("reference fixture missing")
        res = self._extract(path, kind)
        assert res.status == "ok"
        reloaded = extract_doc_json(items_to_doc_json(res.items))
        assert reloaded.status == "ok"
        assert reloaded.items == res.items
        # re-export equality: markdown AND doctags byte-identical
        assert items_to_markdown(reloaded.items) == \
            items_to_markdown(res.items)
        tags = [(i.label, i.text, i.level) for i in res.items]
        tags2 = [(i.label, i.text, i.level) for i in reloaded.items]
        assert to_doctags(tags2) == to_doctags(tags)

    def test_dispatcher_entry(self):
        from doc_parser_ray.functions.extract import extract_payload
        from doc_parser_ray.datamodel import Item

        payload = items_to_doc_json(
            [Item(label="text", text="hello"),
             Item(label="list_item", text="x", marker="-", level=1)]
        )
        fmt, res = extract_payload(payload, "")
        assert fmt == "doc_json"
        assert res.status == "ok"
        assert len(res.items) == 2

    def test_rejects_foreign_json(self):
        assert extract_doc_json('{"foo": 1}').status == "parse_error"
        assert extract_doc_json("[1,2]").status == "parse_error"
        assert extract_doc_json("not json").status == "parse_error"


class TestConfidence:
    def test_rate_text_quality_rules(self):
        assert rate_text_quality("normal prose text") == 1.0
        assert rate_text_quality("bad GLYPH<0a2f> cell") == 0.0
        assert rate_text_quality("/G12/G34 garbage") == 0.0
        assert rate_text_quality("/word /word trailing") == 0.0
        assert rate_text_quality("has � replacement") == 0.0
        frag = "w/ab.cd/ef.gh " * 3  # ≥3 fragmented-word hits
        assert rate_text_quality(frag) < 1.0

    def test_grades(self):
        assert score_to_grade(0.2) == "poor"
        assert score_to_grade(0.7) == "fair"
        assert score_to_grade(0.85) == "good"
        assert score_to_grade(0.95) == "excellent"
        assert score_to_grade(float("nan")) == "unspecified"

    def test_turn_parse_score_quantile(self):
        # 10 lines, one garbage → 10%-quantile dips below 1
        text = "\n".join(["clean line"] * 9 + ["GLYPH<0aff>"])
        s = turn_parse_score(text)
        assert 0.0 <= s < 1.0
        assert turn_parse_score("") != turn_parse_score("clean")

    def test_conversation_rollup_nanmean(self):
        r = conversation_rollup(np.array([1.0, 0.5, np.nan]))
        assert abs(r["mean_score"] - 0.75) < 1e-9
        assert r["mean_grade"] == "fair"
        r_empty = conversation_rollup(np.array([]))
        assert r_empty["mean_grade"] == "unspecified"


@pytest.mark.usefixtures("ray_session")
class TestConfidenceStage:
    def test_rollup_and_manifest(self, tmp_path):
        from doc_parser_ray.pipelines.extraction import run_extraction
        from doc_parser_ray.sources.transcripts import write_transcripts
        from doc_parser_ray.state.checkpoint import load_manifest
        from doc_parser_ray.stages.confidence import confidence_rollup

        inp, out = str(tmp_path / "in"), str(tmp_path / "out")
        write_transcripts(inp, n_convs=12, seed=3, max_turns=30,
                          num_files=2)
        run_extraction(inp, out, shards=2)
        recs = load_manifest(out)
        assert recs
        for rec in recs:
            conf = rec["confidence"]
            assert conf["n_convs"] > 0
            assert set(conf["grade_hist"]) <= {
                "poor", "fair", "good", "excellent", "unspecified"}
            assert 0.0 <= conf["mean_score"] <= 1.0
        # per-conversation rollup covers every conversation exactly once
        shard_files = sorted(glob.glob(f"{out}/shard=*/*.parquet"))
        ds = ray.data.read_parquet(
            shard_files, columns=["conv_id", "extracted_text", "spans"])
        tab = collect_table(confidence_rollup(ds))
        convs = tab.column("conv_id").to_pylist()
        assert len(convs) == len(set(convs)) == 12
