"""Chunk-level parity against the reference's OWN committed HWPX
regression baselines (P13 full).

The reference's regression gate
(genon/preprocessor/tests/regression/test_hwpx_regression.py) asserts,
for each sample_files/*.hwpx run through basic_processor:

  1. ``num_vectors`` exact,
  2. ``label_distribution`` exact (types collected from chunk_bboxes),
  3. ``total_characters`` within 5%,

and explicitly SKIPS text comparison ("HWPX 문서 처리는 비결정적" — the
headings set makes chunk text nondeterministic in its own runs). We
reproduce all three through functions/hwpx_doc.py (the HwpxDocumentBackend
walker emulation) + functions/genos_chunk.py (the Hierarchical/Hybrid
chunker + vector-builder port) and pin a STRONGER bar the reference
doesn't: ≥58 of the 85 chunk texts byte-identical to the committed
baseline vectors (the rest differ only by merge-boundary placement,
which depends on exact MiniLM token counts we emulate without weights).
"""

import json
from collections import Counter
from pathlib import Path

import pytest

SAMPLE = Path("/root/reference/genon/preprocessor/sample_files/hwpx_sample.hwpx")
BASELINE_DIR = Path(
    "/root/reference/genon/preprocessor/tests/regression/baselines")


def _run_sample():
    from doc_parser_ray.functions.genos_chunk import hwpx_chunk_vectors
    return hwpx_chunk_vectors(SAMPLE.read_bytes())


@pytest.fixture(scope="module")
def vectors():
    if not SAMPLE.exists():
        pytest.skip("reference sample missing")
    return _run_sample()


@pytest.mark.parametrize("baseline_name",
                         ["hwpx_hwpx_sample.json", "hwpx_sample.json"])
def test_reference_regression_assertions(vectors, baseline_name):
    """The reference's three regression assertions, verbatim."""
    baseline = json.loads(
        (BASELINE_DIR / baseline_name).read_text(encoding="utf-8"))

    assert len(vectors) == baseline["num_vectors"]

    label_counts = Counter()
    total_chars = 0
    for v in vectors:
        total_chars += v["n_char"]
        for bbox in json.loads(v["chunk_bboxes"]):
            label_counts[bbox["type"]] += 1
    assert dict(label_counts) == baseline["label_distribution"]

    char_diff = abs(total_chars - baseline["total_characters"])
    assert char_diff / max(baseline["total_characters"], 1) < 0.05


def test_text_parity_floor(vectors):
    """Stronger than the reference's gate: most chunk texts byte-equal."""
    baseline = json.loads(
        (BASELINE_DIR / "hwpx_hwpx_sample.json").read_text(encoding="utf-8"))
    base_texts = [v["text"] for v in baseline["vectors"]]
    ours = [v["text"] for v in vectors]
    equal = sum(1 for a, b in zip(base_texts, ours) if a == b)
    assert equal >= 58, f"only {equal}/85 chunk texts byte-equal"
    # the last third of the document (divorce/birth statistics sections)
    # must stay byte-exact — it pins the walker+chunker steady state
    assert ours[53:83] == base_texts[53:83]


def test_vector_schema(vectors):
    """Baseline vector schema reproduced field-for-field."""
    baseline = json.loads(
        (BASELINE_DIR / "hwpx_hwpx_sample.json").read_text(encoding="utf-8"))
    want = set(baseline["vectors"][0].keys())
    for v in vectors:
        assert set(v.keys()) == want
        assert v["n_char"] == len(v["text"])


def test_chunker_determinism():
    if not SAMPLE.exists():
        pytest.skip("reference sample missing")
    a = _run_sample()
    b = _run_sample()
    assert [v["text"] for v in a] == [v["text"] for v in b]
