"""Benchmark decontamination — drop training documents that overlap an
evaluation set by word n-grams (the GPT-3/PaLM-style 13-gram rule;
here the n is a knob so small synthetic corpora exercise real hits).

The reference has no corpus-level decontamination (its scope stops at
one document); this is a required extension for the 100 TB pipeline.

Scale shape — broadcast, not shuffle: the eval set is benchmark-sized
(MBs), so its distinct n-gram hashes are collected ONCE, sorted, and
``ray.put`` into the object store; every map task reads the array
zero-copy from its node's plasma and runs a vectorized ``searchsorted``
membership test per batch. The 100 TB corpus streams through a single
stateless ``map_batches`` — no all-to-all exchange, and the corpus
text never moves.

Hashing: the string-free vectorized gram path shared with
``stages/dedup.py::_shingle_hashes_batch`` — one normalize pass, one
split, ONE seeded-xxhash pass over the flattened words, positional-XOR
gram combination; no per-doc Python gram strings (this is a hot-path
100 TB op). 64-bit hashes stand in for the gram strings on both sides
of the membership test; at benchmark scale (<<2^32 grams) false
collisions are ~(corpus_grams x bench_grams)/2^64 — negligible, and
the DuckDB oracle (exact string intersection) verifies that end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _gram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, per-doc DISTINCT counts): word n-grams of each
    normalized text, via the shared string-free vectorized path. Docs
    with fewer than ``n`` words contribute no grams (the standard
    decontamination rule: nothing to match on). Accepts a pyarrow
    string column or a list of str."""
    from doc_parser_ray.stages.dedup import _shingle_hashes_batch

    col = (texts if isinstance(texts, (pa.Array, pa.ChunkedArray))
           else pa.array([t or "" for t in texts], pa.string()))
    _, gh, counts = _shingle_hashes_batch(col, n, short_docs="none")
    return gh, counts


def collect_benchmark_ngrams(bench_ds, *, text_col: str = "text",
                             n: int = 5) -> "ray.ObjectRef":
    """Distinct n-gram hashes of the (small) benchmark/eval dataset as
    a sorted uint64 array in the object store. Per-batch distinct runs
    where the data is; only the deduped hash arrays reach the driver
    for the final union — bounded by DISTINCT eval grams, not rows."""
    def batch_hashes(batch: pa.Table) -> pa.Table:
        h, _ = _gram_hashes(batch.column(text_col), n)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    from doc_parser_ray.util import collect_table

    parts = bench_ds.map_batches(batch_hashes, batch_format="pyarrow",
                                 zero_copy_batch=True)
    merged = collect_table(parts)
    if merged.num_rows == 0 or "h" not in merged.column_names:
        return ray.put(np.empty(0, dtype=np.uint64))
    hashes = np.unique(merged.column("h").to_numpy(zero_copy_only=False))
    return ray.put(np.ascontiguousarray(hashes))


def decontaminate(ds, bench_ref: "ray.ObjectRef", *,
                  text_col: str = "text", n: int = 5,
                  keep: str = "clean"):
    """Filter ``ds`` against the broadcast benchmark n-gram set.

    ``keep='clean'`` drops every doc sharing >=1 n-gram with the eval
    set (the training-side op); ``keep='contaminated'`` returns the
    flagged docs instead (the audit-side op).
    """
    if keep not in ("clean", "contaminated"):
        raise ValueError(f"keep={keep!r}")
    want_clean = keep == "clean"

    def flt(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        if nrows == 0:
            return batch
        bench = ray.get(bench_ref)  # plasma-local after first task/node
        h, counts = _gram_hashes(batch.column(text_col), n)
        if len(h) == 0 or len(bench) == 0:
            hit = np.zeros(nrows, dtype=bool)
        else:
            idx = np.searchsorted(bench, h)
            idx[idx == len(bench)] = len(bench) - 1
            gram_hit = bench[idx] == h
            # any() per doc via segment sums over the flattened grams
            ends = np.cumsum(counts)
            starts = ends - counts
            cs = np.concatenate([[0], np.cumsum(gram_hit)])
            hit = (cs[ends] - cs[starts]) > 0
        mask = ~hit if want_clean else hit
        return batch.filter(pa.array(mask))

    return ds.map_batches(flt, batch_format="pyarrow",
                          zero_copy_batch=True)
