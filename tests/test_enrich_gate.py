"""Deterministic enrichment-gate halves (document_enrichment.py ports)."""

from doc_parser_ray.functions.enrich_gate import (
    extract_substrings,
    is_non_meaningful_char,
    ocr_gate_features,
    parse_date_response,
    parse_decision,
    parse_metadata_response,
)


class TestNonMeaningfulChar:
    def test_meaningful(self):
        for c in ["a", "Z", "7", ".", " ", "\n", "가", "힣", "ㄱ", "ㅏ",
                  "中", "あ", "ア"]:
            assert is_non_meaningful_char(c) is False, c

    def test_non_meaningful(self):
        for c in ["é", "Ω", "�", "☃", "й"]:
            assert is_non_meaningful_char(c) is True, c


class TestExtractSubstrings:
    def test_short_text_passthrough(self):
        assert extract_substrings("abc", length=10) == "abc"
        assert extract_substrings("x" * 29, length=10) == "x" * 29

    def test_long_text_three_windows(self):
        text = "".join(chr(ord("a") + (i % 26)) for i in range(10000))
        out = extract_substrings(text, length=1000)
        parts = out.split("\n")
        assert parts[-1] == ""
        assert [len(p) for p in parts[:3]] == [1000, 1000, 1000]
        # windows are centered at 20/50/80%
        assert parts[0] == text[1500:2500]
        assert parts[1] == text[4500:5500]
        assert parts[2] == text[7500:8500]

    def test_overlapping_windows_shifted(self):
        # len 3000 with length 1000: centers 600/1500/2400, windows
        # [100,1100],[1000,2000],[1900,2900] overlap -> later shifted
        text = "ab" * 1500
        out = extract_substrings(text, length=1000)
        parts = out.split("\n")[:3]
        # shifts cascade: (1000,2000)->(1100,2100), (1900,2900)->(2100,3100),
        # and only the LAST range is clamped to the text end (900 chars)
        assert [len(p) for p in parts] == [1000, 1000, 900]
        assert "".join(parts) == text[100:3000]


class TestOcrGateFeatures:
    def test_empty_needs_ocr(self):
        f = ocr_gate_features("")
        assert f["needs_ocr"] is True and f["space_ratio"] == 1.0

    def test_ascii_text_clean(self):
        f = ocr_gate_features("clean ascii text here")
        assert f["needs_ocr"] is False
        assert f["non_ascii_ratio"] == 0.0
        assert 0 < f["space_ratio"] < 0.25

    def test_mojibake_ratio(self):
        f = ocr_gate_features("abcd" + "�" * 4 + "èéêë")
        assert abs(f["non_ascii_ratio"] - 8 / 12) < 1e-9

    def test_long_text_sampled(self):
        f = ocr_gate_features("a" * 10000)
        assert f["text_len"] == 3003  # 3 windows + 3 newlines


class TestResponseParsers:
    def test_decision(self):
        assert parse_decision("<decision> NO </decision>") == "NO"
        assert parse_decision("<decision>yes</decision>") == "yes"
        assert parse_decision("garbled") == "YES"
        assert parse_decision(None) == "YES"

    def test_metadata_json_block(self):
        r = 'text ```json\n{"작성일": "2024-01-02", "작성자": ["a"]}\n``` tail'
        assert parse_metadata_response(r) == {"작성일": "2024-01-02",
                                              "작성자": ["a"]}
        assert parse_metadata_response("```json\nnot json\n```") == \
            {"작성일": None, "작성자": []}
        assert parse_metadata_response('{"k": 1}') == {"k": 1}
        assert parse_metadata_response("") == {"작성일": None, "작성자": []}

    def test_date_tag(self):
        assert parse_date_response("<date>2023-05</date>") == \
            {"작성일": "2023-05", "작성자": []}
        assert parse_date_response("nope") == {"작성일": None, "작성자": []}
