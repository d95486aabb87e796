"""Per-conversation ConfidenceReport rollup stage — the corpus-scale
shape of the reference's per-document confidence aggregation
(docling/datamodel/base_models.py:378-457, wired per document in
standard_pdf_pipeline.py:292-319).

Per-turn parse scores are computed in a stateless map pass; the
per-conversation nan-mean rollup rides the same bounded hash-partition
exchange as conversation assembly (stages/assemble.py) — the shuffle
carries only (conv_id, parse_score) pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from doc_parser_ray.functions.confidence import (
    conversation_rollup,
    turn_parse_score,
)


def add_parse_scores(batch: pa.Table) -> pa.Table:
    """(conv_id, parse_score) projection of extracted rows."""
    texts = batch.column("extracted_text").to_pylist()
    spans = (batch.column("spans").to_pylist()
             if "spans" in batch.column_names else [""] * len(texts))
    scores = pa.array(
        [turn_parse_score(t or "", s or "") for t, s in zip(texts, spans)],
        pa.float64(),
    )
    return pa.table({
        "conv_id": batch.column("conv_id"),
        "parse_score": scores,
    })


def _rollup_partition(part: pa.Table) -> pa.Table:
    part = part.sort_by([("conv_id", "ascending")])
    conv = np.asarray(part.column("conv_id").to_pylist(), dtype=object)
    scores = part.column("parse_score").to_numpy(zero_copy_only=False)
    n = len(conv)
    out = {"conv_id": [], "n_turns": [], "mean_score": [], "low_score": [],
           "mean_grade": [], "low_grade": []}
    if n:
        change = np.ones(n, dtype=bool)
        change[1:] = conv[1:] != conv[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            r = conversation_rollup(scores[s:e])
            out["conv_id"].append(conv[s])
            out["n_turns"].append(e - s)
            out["mean_score"].append(r["mean_score"])
            out["low_score"].append(r["low_score"])
            out["mean_grade"].append(r["mean_grade"])
            out["low_grade"].append(r["low_grade"])
    return pa.table({
        "conv_id": pa.array(out["conv_id"], pa.string()),
        "n_turns": pa.array(out["n_turns"], pa.int32()),
        "mean_score": pa.array(out["mean_score"], pa.float64()),
        "low_score": pa.array(out["low_score"], pa.float64()),
        "mean_grade": pa.array(out["mean_grade"], pa.string()),
        "low_grade": pa.array(out["low_grade"], pa.string()),
    })


def confidence_rollup(ds, num_partitions: int = 32):
    """Extracted rows → per-conversation confidence table."""
    from doc_parser_ray.stages.assemble import _add_pkey

    proj = ds.map_batches(add_parse_scores, batch_format="pyarrow",
                          zero_copy_batch=True)
    keyed = proj.map_batches(
        lambda b: _add_pkey(b, num_partitions, None),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    return keyed.groupby("pkey").map_groups(
        lambda p: _rollup_partition(p.drop_columns(["pkey"])),
        batch_format="pyarrow",
    )


def shard_confidence_summary(shard_dir: str) -> dict:
    """Manifest fields for one written shard: grade histogram + corpus
    means over its conversations (the lineage analog of the per-request
    ConfidenceReport)."""
    import ray.data

    ds = ray.data.read_parquet(shard_dir,
                               columns=["conv_id", "extracted_text", "spans"])
    tab = confidence_rollup(ds)
    import pyarrow as _pa  # noqa: F401

    rows = tab.to_pandas()
    if not len(rows):
        return {"n_convs": 0}
    hist: dict[str, int] = {}
    for g in rows["mean_grade"]:
        hist[g] = hist.get(g, 0) + 1
    return {
        "n_convs": int(len(rows)),
        "mean_score": round(float(np.nanmean(rows["mean_score"])), 4),
        "low_score": round(float(np.nanmean(rows["low_score"])), 4),
        "grade_hist": dict(sorted(hist.items())),
    }
