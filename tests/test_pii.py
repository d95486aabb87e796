"""PII redaction chain: pattern coverage, ordering, and counts."""

import pyarrow as pa

from doc_parser_ray.functions.pii import (
    count_pii,
    redact_batch,
    redact_column,
)


def red(text: str) -> str:
    return redact_column(pa.array([text])).to_pylist()[0]


def test_email_redacted():
    assert red("mail me at a.b+c@sub.example.co.kr now") == \
        "mail me at <EMAIL> now"


def test_phone_variants():
    assert red("call 010-1234-5678 or 02-555-0199") == \
        "call <PHONE> or <PHONE>"


def test_rrn_and_card_order():
    # the 4-4-4-4 card pattern must win before the 6-7 RRN pattern can
    # eat a prefix of it
    assert red("card 1234-5678-9012-3456 rrn 900101-1234567") == \
        "card <CARD> rrn <RRN>"


def test_ipv4():
    assert red("host 192.168.0.1 down") == "host <IP> down"


def test_no_pii_unchanged():
    s = "just words 123 and dashes-here 12-34"
    assert red(s) == s


def test_counts_match_replacements():
    tab = pa.table({"doc_id": [1], "text": [
        "a@b.co and 010-1111-2222 and 900101-1234567 and 10.0.0.1"
    ]})
    out = redact_batch(tab)
    assert out.column("n_pii").to_pylist() == [4]
    assert "<EMAIL>" in out.column("red_text").to_pylist()[0]


def test_count_on_progressive_text_no_double_count():
    # an email containing digits must not later count as phone/ip
    col = pa.array(["x 010-1234-5678@example.com y"])
    assert count_pii(col).to_pylist() == [1]
