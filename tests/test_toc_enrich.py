"""Deterministic E4 TOC enrichment (functions/toc_enrich.py), mirroring
the reference's matcher behaviors on synthetic TOCs
(docling/utils/document_enrichment.py):

- TOC parsing: numbered levels 1-4, TITLE: line, fallback level-1
  (:634-683)
- boundary dedup at SequenceMatcher >= 0.92 within 1 level (:206-231)
- hierarchical renumbering with min-level shift (:243-258)
- windowed combine (:260-302), <toc> block extraction (:304-313)
- greedy reversed-scan relabel (:685-768) and the law-document
  order-preserving DP variant (:772-1030)

Excluded from the equality path by default (extract_batch enrich_toc
flag is OFF), exactly as the reference gates do_toc_enrichment.
"""

import pyarrow as pa

from doc_parser_ray.datamodel import (
    LIST_ITEM,
    SECTION_HEADER,
    TEXT,
    TITLE,
    Item,
)
from doc_parser_ray.functions.toc_enrich import (
    apply_law_toc_to_items,
    apply_toc_to_items,
    combine_windowed_toc,
    dedupe_toc_items,
    extract_toc_block,
    parse_toc_content,
    renumber,
    select_best_toc_text_matching,
    split_bracket_title,
)


class TestParse:
    def test_levels(self):
        parsed = parse_toc_content(
            "TITLE:My Doc\n1. One\n1.1. OneOne\n1.1.1. Deep\n"
            "1.1.1.1. Deeper\nUnnumbered line")
        assert parsed["title"] == "My Doc"
        levels = [t["level"] for t in parsed["toc_items"]]
        assert levels == [1, 2, 3, 4, 1]
        assert parsed["toc_items"][-1]["number"] == ""
        assert parsed["toc_items"][0]["full_text"] == "1. One"

    def test_toc_block_extraction(self):
        assert extract_toc_block(
            "noise <toc>1. A</toc> mid <toc>1. B\n2. C</toc>") == "1. B\n2. C"
        assert extract_toc_block("plain text") == "plain text"


class TestDedupe:
    def _items(self, specs):
        return [{"number": "", "title": t, "level": lv, "full_text": t}
                for t, lv in specs]

    def test_adjacent_similar_dropped(self):
        out = dedupe_toc_items(self._items(
            [("Introduction", 1), ("Introductio", 1), ("Methods", 1)]))
        assert [t for _, t, _, _ in out] == ["Introduction", "Methods"]

    def test_level_gap_over_one_kept(self):
        out = dedupe_toc_items(self._items(
            [("Overview", 1), ("Overview", 3)]))
        assert len(out) == 2

    def test_dissimilar_kept(self):
        out = dedupe_toc_items(self._items(
            [("Alpha section", 1), ("Beta section", 1)]))
        assert len(out) == 2


class TestRenumber:
    def test_hierarchical_counters(self):
        items = [("", t, lv, t) for t, lv in
                 [("A", 1), ("A1", 2), ("A2", 2), ("B", 1), ("B1", 2)]]
        assert renumber(items) == [
            "1. A", "1.1. A1", "1.2. A2", "2. B", "2.1. B1"]

    def test_min_level_shift(self):
        items = [("", t, lv, t) for t, lv in [("X", 2), ("Y", 3)]]
        assert renumber(items) == ["1. X", "1.1. Y"]


class TestCombine:
    def test_windowed_merge(self):
        out = combine_windowed_toc([
            "TITLE:Doc\n1. Intro\n2. Methods",
            "1. Methods\n2. Results",  # boundary duplicate "Methods"
        ])
        assert out.splitlines() == [
            "TITLE:Doc", "1. Intro", "2. Methods", "3. Results"]

    def test_first_title_wins(self):
        out = combine_windowed_toc(["TITLE:A\n1. x", "TITLE:B\n1. y"])
        assert out.splitlines()[0] == "TITLE:A"


class TestBracketSplit:
    def test_byeolpyo_brackets(self):
        assert split_bracket_title("[별표 1] 제목") == ("[별표 1]", "제목")
        assert split_bracket_title("<별표 3> 평가기준") == ("<별표 3>", "평가기준")
        assert split_bracket_title("(별지 제4호 서식) 신청서") == (
            "(별지 제4호 서식)", "신청서")

    def test_plain_brackets_not_split(self):
        assert split_bracket_title("[note] 제목") is None
        assert split_bracket_title("no brackets") is None


class TestDP:
    def test_order_preserving_max_score(self):
        # toc0 matches text5 strongly but toc1 can only match text2:
        # taking both would violate order, and the DP keeps the pair
        # with the larger total score.
        cands = [
            (0, [(5, 0.9, "t5"), (1, 0.6, "t1")]),
            (1, [(2, 0.8, "t2")]),
        ]
        best = select_best_toc_text_matching(cands)
        assert [(m["toc_idx"], m["text_idx"]) for m in best] == [
            (0, 1), (1, 2)]  # 0.6+0.8 > 0.9

    def test_empty(self):
        assert select_best_toc_text_matching([(0, [])]) == []


def _doc():
    return [
        Item(label=TEXT, text="The Annual Report"),
        Item(label=TEXT, text="Some preamble paragraph here."),
        Item(label=SECTION_HEADER, text="Stale Header", level=1),
        Item(label=TEXT, text="Introduction"),
        Item(label=TEXT, text="body of the introduction..."),
        Item(label=TEXT, text="Results and Discussion"),
        Item(label=TEXT, text="body of results..."),
    ]


class TestApply:
    def test_relabels_title_and_sections(self):
        toc = "TITLE:The Annual Report\n1. Introduction\n2. Results and Discussion"
        items, matched = apply_toc_to_items(_doc(), toc)
        assert matched == 3
        assert items[0].label == TITLE
        assert items[3].label == SECTION_HEADER and items[3].level == 1
        assert items[5].label == SECTION_HEADER and items[5].level == 1
        # pre-existing header was demoted and not re-matched
        assert items[2].label == TEXT

    def test_levels_from_toc(self):
        toc = "1. Introduction\n1.1. Results and Discussion"
        items, _ = apply_toc_to_items(_doc(), toc)
        assert items[3].level == 1
        assert items[5].level == 2

    def test_below_threshold_unmatched(self):
        items, matched = apply_toc_to_items(
            [Item(label=TEXT, text="totally unrelated words")],
            "1. Quarterly Financials")
        assert matched == 0
        assert items[0].label == TEXT

    def test_each_item_converted_once(self):
        # two TOC entries competing for one text item: second gets nothing
        items, matched = apply_toc_to_items(
            [Item(label=TEXT, text="Introduction")],
            "1. Introduction\n2. Introduction!")
        assert matched == 1

    def test_law_variant_includes_list_items(self):
        doc = [
            Item(label=LIST_ITEM, text="제1장 총칙"),
            Item(label=TEXT, text="조문 내용..."),
            Item(label=LIST_ITEM, text="제2장 벌칙"),
        ]
        toc = "1. 제1장 총칙\n2. 제2장 벌칙"
        items, matched = apply_law_toc_to_items(doc, toc)
        assert matched == 2
        assert items[0].label == SECTION_HEADER
        assert items[2].label == SECTION_HEADER

    def test_law_order_preserved(self):
        # TOC order must map to ascending text positions via the DP
        doc = [
            Item(label=TEXT, text="chapter two heading"),
            Item(label=TEXT, text="chapter one heading"),
            Item(label=TEXT, text="chapter two heading"),
        ]
        toc = "1. chapter one heading\n2. chapter two heading"
        items, matched = apply_law_toc_to_items(doc, toc)
        assert matched == 2
        assert items[1].label == SECTION_HEADER
        assert items[2].label == SECTION_HEADER
        assert items[0].label == TEXT


class TestStageFlag:
    def _batch(self, text, toc):
        return pa.table({
            "conv_id": pa.array(["0"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array([text], pa.string()),
            "tool": pa.array(["markdown"], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
            "toc": pa.array([toc], pa.string()),
        })

    def test_off_by_default(self):
        from doc_parser_ray.stages.extract import extract_batch

        out = extract_batch(
            self._batch("Introduction\n\nbody text here", "1. Introduction"))
        spans = out.to_pylist()[0]["spans"]
        assert "section_header" not in spans

    def test_flag_applies_injected_toc(self):
        from doc_parser_ray.stages.extract import extract_batch

        out = extract_batch(
            self._batch("Introduction\n\nbody text here",
                        "<toc>1. Introduction</toc>"),
            enrich_toc=True)
        spans = out.to_pylist()[0]["spans"]
        assert "section_header" in spans
