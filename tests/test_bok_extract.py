"""BOK JSON backend (P15) structural parity.

No BOK sample or baseline exists anywhere in the reference repo, so the
reference CODE is the spec (bok_json_backend.py:26-1059); each test pins
one rule read from it — see the rule citations in
doc_parser_ray/functions/bok_extract.py.
"""

import json

from doc_parser_ray.functions.bok_extract import extract_bok_json
from doc_parser_ray.functions.extract import extract_payload


def _doc(*pages):
    return json.dumps({"body": list(pages)})


def _page(*blocks, page=1):
    return {"page": page, "contents": list(blocks)}


def _text(s, **kw):
    return {"type": "text", "content": s, **kw}


def _table(rows, **kw):
    return {"type": "table", "content": rows, **kw}


def _row(*cells):
    return {"cells": [c if isinstance(c, dict) else
                      {"contents": [_text(c)]} for c in cells]}


class TestTopLevel:
    def test_plain_text_blocks(self):
        res = extract_bok_json(_doc(_page(_text("alpha"), _text("beta"))))
        assert res.status == "ok"
        assert [(i.label, i.text) for i in res.items] == [
            ("text", "alpha"), ("text", "beta")]

    def test_top_level_text_not_stripped(self):
        # :181-195 — raw str(content), no strip at top level
        res = extract_bok_json(_doc(_page(_text("  padded  "))))
        assert res.items[0].text == "  padded  "

    def test_numeric_content_stringified(self):
        res = extract_bok_json(_doc(_page(_text(42))))
        assert res.items[0].text == "42"

    def test_null_text_content_is_parse_error(self):
        # :986 — reference crashes with TypeError on content[:50]
        res = extract_bok_json(_doc(_page(_text(None))))
        assert res.status == "parse_error"
        assert "null content" in res.error

    def test_image_blocks_skipped(self):
        # save_images=False default (:82-83); missing files skip (:125)
        res = extract_bok_json(_doc(_page(
            _text("a"), {"type": "image", "content": "/nope/img"},
            _text("b"))))
        assert [i.text for i in res.items] == ["a", "b"]

    def test_invalid_json(self):
        assert extract_bok_json("{not json").status == "parse_error"

    def test_no_body_key(self):
        assert extract_bok_json('{"pages": []}').status == "parse_error"

    def test_empty(self):
        assert extract_bok_json("").status == "empty"
        assert extract_bok_json(_doc()).status == "empty"


class TestTables:
    def test_simple_table_preserved(self):
        # no images, no nesting → preserved as one table item (:283-307)
        res = extract_bok_json(_doc(_page(
            _table([_row("h1", "h2"), _row("a", "b")]))))
        assert [(i.label, i.text) for i in res.items] == [
            ("table", "h1 | h2\na | b")]

    def test_table_with_image_flattens(self):
        # :285-287 — any image → flatten; image itself skipped
        res = extract_bok_json(_doc(_page(_table([
            _row("a", {"contents": [{"type": "image", "content": "x"}]}),
            _row("b", "c"),
        ]))))
        # column-major: (r0,c0)=a, (r1,c0)=b, then (r1,c1)=c
        assert [(i.label, i.text) for i in res.items] == [
            ("text", "a"), ("text", "b"), ("text", "c")]

    def test_nested_leaf_table_preserved_outer_flattened(self):
        # :289-307 — nested tables force the OUTER to flatten; a leaf
        # data table inside a cell is preserved as a table item
        inner = [_row("x", "y")]
        res = extract_bok_json(_doc(_page(_table([
            _row({"contents": [_text("cap"), _table(inner, id="t1")]},
                 "side"),
        ]))))
        assert [(i.label, i.text) for i in res.items] == [
            ("text", "cap"), ("table", "x | y"), ("text", "side")]

    def test_column_major_order(self):
        # :327-345 — col outer, row inner (needs a flatten trigger)
        res = extract_bok_json(_doc(_page(_table([
            _row("r0c0", "r0c1"),
            _row({"contents": [_table([_row("n")], id="t")]}, "r1c1"),
        ]))))
        texts = [i.text for i in res.items]
        # col 0 first: r0c0, nested table; then col 1: r0c1, r1c1
        assert texts == ["r0c0", "n", "r0c1", "r1c1"]

    def test_cell_text_stripped_and_empty_dropped(self):
        # :558-577 — cell-level text strips; empty drops
        res = extract_bok_json(_doc(_page(_table([
            _row("  padded  ", ""),
            _row({"contents": [_table([_row("z")], id="t")]}, "w"),
        ]))))
        assert [i.text for i in res.items] == ["padded", "z", "w"]

    def test_rowspan_occupancy(self):
        # rowspan cell occupies the next row's column; walk stays
        # column-major over origin cells
        res = extract_bok_json(_doc(_page(_table([
            {"cells": [{"rowSpan": 2, "contents": [_text("tall")]},
                       {"contents": [_text("r0c1")]}]},
            {"cells": [{"contents": [_text("r1c1")]}]},
            {"cells": [{"contents": [
                _table([_row("flat")], id="t")]}]},
        ]))))
        texts = [i.text for i in res.items]
        # col0: tall (r0, spans r1), table at r2; col1: r0c1, r1c1
        assert texts == ["tall", "flat", "r0c1", "r1c1"]

    def test_same_object_dedup(self):
        # :1056 — fingerprint embeds id(content): the SAME parsed object
        # revisited is deduped; equal-but-distinct tables are both kept
        inner = [_row("dup")]
        page = _page(
            _table([_row({"contents": [_table(inner, id="a")]})]),
            _table([_row({"contents": [_table(inner, id="b")]})]),
        )
        # json round-trip makes the two inners DISTINCT objects
        res = extract_bok_json(_doc(page))
        assert [i.text for i in res.items] == ["dup", "dup"]

    def test_deep_nesting_recurses(self):
        deepest = [_row("leaf")]
        mid = [_row({"contents": [_text("midtxt"),
                                  _table(deepest, id="d")]})]
        res = extract_bok_json(_doc(_page(
            _table([_row({"contents": [_table(mid, id="m")]})]))))
        assert [i.text for i in res.items] == ["midtxt", "leaf"]

    def test_image_placeholder_in_preserved_table(self):
        # a preserved table never contains images (images force
        # flatten), but the cell-text rule :816-820 renders the
        # placeholder — pinned via the flatten-exempt path: images
        # only in the OUTER, nested leaf keeps its own cells
        res = extract_bok_json(_doc(_page(
            _table([_row("h"), _row("v")]))))
        assert res.items[0].label == "table"


class TestPagesAndDispatch:
    def test_multi_page(self):
        res = extract_bok_json(_doc(
            _page(_text("p1"), page=1), _page(_text("p2"), page=2)))
        assert [i.text for i in res.items] == ["p1", "p2"]

    def test_sniff_and_dispatch(self):
        fmt, res = extract_payload(_doc(_page(_text("hello"))), "")
        assert fmt == "bok_json"
        assert res.status == "ok"
        assert res.items[0].text == "hello"

    def test_tool_hint(self):
        fmt, res = extract_payload(_doc(_page(_text("x"))), "bok_json")
        assert fmt == "bok_json" and res.status == "ok"
