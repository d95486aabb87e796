"""E5 metadata normalizer tests — reference-exact semantics
(genon/preprocessor/facade/intelligent_processor.py:1088-1189)."""

from doc_parser_ray.functions.metadata import (
    extract_metadata,
    parse_authors,
    parse_created_date,
)


class TestParseCreatedDate:
    def test_full_date(self):
        assert parse_created_date("2023-7-5") == 20230705
        assert parse_created_date("2023-12-31") == 20231231

    def test_month_only_defaults_day(self):
        assert parse_created_date("2023-7") == 20230701

    def test_year_only(self):
        assert parse_created_date("2023") == 20230101

    def test_invalid_calendar_dates(self):
        assert parse_created_date("2023-2-30") == 0
        assert parse_created_date("2023-13-01") == 0

    def test_garbage(self):
        assert parse_created_date(None) == 0
        assert parse_created_date("None") == 0
        assert parse_created_date("July 5, 2023") == 0
        assert parse_created_date("  2020-03-04  ") == 20200304


class TestParseAuthors:
    def test_dict_list_korean_and_english_keys(self):
        assert parse_authors([{"이름": "김철수"}, {"name": "Jane"}]) == [
            "Jane", "김철수"
        ]

    def test_string_separators_first_match_wins(self):
        assert parse_authors("a, b; c") == ["a", "b; c"]
        assert parse_authors("a; b") == ["a", "b"]
        assert parse_authors("a · b") == ["a", "b"]

    def test_dedup_and_blanks(self):
        assert parse_authors("x, x, , y") == ["x", "y"]
        assert parse_authors("") == []
        assert parse_authors("solo") == ["solo"]


class TestExtractMetadata:
    def test_full_head(self):
        meta = extract_metadata(
            "My Title\nAuthor: B. Zhou; A. Kim\nPublished 2021-4-9 here.\nBody."
        )
        assert meta["title"] == "My Title"
        assert meta["created_date"] == 20210409
        assert meta["authors"] == ["A. Kim", "B. Zhou"]

    def test_no_metadata(self):
        meta = extract_metadata("just some text\nwith lines")
        assert meta["title"] == "just some text"
        assert meta["created_date"] == 0
        assert meta["authors"] == []


def test_safe_join_reference_pins():
    from doc_parser_ray.functions.metadata import safe_join

    assert safe_join(["a", "b"]) == "ab\n"
    assert safe_join(123) == ""
    assert safe_join((1, 2)) == "12\n"
    assert safe_join("ab") == ""  # strings are not list/tuple/set
