"""Deterministic corpus sampling — the mixing knob of a training-data
pipeline (up-/down-weight languages, sources, or quality tiers without
a shuffle and without randomness that breaks reproducibility).

The reference has no corpus-level sampling (its scope stops at one
document); this is a required extension for the 100 TB pipeline, same
family as ``pipelines/trainingdata.py::train_split``.

Scale shape: a single stateless ``map_batches`` filter — no shuffle,
no driver round-trip, no RNG state. The keep/drop decision is a pure
function of the id (multiplicative hash, int64 arithmetic exactly
reproducible in SQL), so the sample is stable across runs, cluster
sizes, and block orderings, and a resumed run keeps the same rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# xxhash prime2 — a different odd multiplier than train_split's
# 2654435761 so the sample is decorrelated from the split assignment.
SAMPLE_MULT = 2246822519
SAMPLE_MOD = 10_000  # rates are basis points (1/100 of a percent)


def _mult_hash(ids: np.ndarray, mult: int, mod: int) -> np.ndarray:
    """(ids * mult) mod 2^64, then mod ``mod`` — the full-domain
    contract. The product is computed in uint64 so ids above ~2^41 wrap
    deterministically instead of overflowing int64; the SQL oracles
    emulate the identical wrap with HUGEINT arithmetic:
    ``(CAST(id AS HUGEINT) * mult) % 18446744073709551616 % mod``.
    Ids must be non-negative (uint64 view and HUGEINT disagree below 0).
    """
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint64) * np.uint64(mult)
    return (h % np.uint64(mod)).astype(np.int64)


def _bucket(ids: np.ndarray) -> np.ndarray:
    return _mult_hash(ids, SAMPLE_MULT, SAMPLE_MOD)


def stratified_sample(ds, *, rates_e4: dict[str, int], default_e4: int,
                      stratum_col: str = "lang", id_col: str = "doc_id"):
    """Keep each row iff ``hash(id) % 10000 < rate_e4[stratum]`` —
    per-stratum Bernoulli sampling with a deterministic coin.

    ``rates_e4`` maps stratum value -> keep-rate in basis points
    (8000 = 80 %); strata not listed use ``default_e4``. Vectorized:
    the stratum column is dictionary-encoded once per batch and the
    rate lookup is a numpy ``take`` over the codes.
    """
    def keep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bucket = _bucket(ids)
        col = batch.column(stratum_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # older pyarrow keeps chunking
            col = col.chunk(0)
        enc = pc.dictionary_encode(col)
        dict_vals = enc.dictionary.to_pylist()
        per_code = np.array(
            [rates_e4.get(v, default_e4) for v in dict_vals],
            dtype=np.int64)
        codes = np.asarray(enc.indices)
        mask = bucket < per_code[codes]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def epoch_mix(ds, *, weights_e4: dict[str, int], default_e4: int = 10_000,
              stratum_col: str = "lang", id_col: str = "doc_id",
              copy_col: str = "copy"):
    """Deterministic epoch weighting: emit each row ``w`` times, where
    a stratum weight of 25000 e4 (= 2.5 epochs) yields 2 copies always
    plus a 3rd for the hash-chosen 50 % of ids. This is the upsampling
    half of corpus mixing (stratified_sample is the downsampling half);
    fractional parts use the same multiplicative coin, so mixtures are
    reproducible across runs and cluster sizes with no RNG state.

    Output = input columns + ``copy_col`` (1..reps per source row).
    Vectorized: reps per row via the dictionary-code lookup, the fanout
    is one ``take`` on np.repeat indices — no Python per row, and rows
    never leave their batch (a pure map, no shuffle).
    """
    def fan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(copy_col,
                                       pa.array([], pa.int64()))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bucket = _bucket(ids)
        col = batch.column(stratum_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        enc = pc.dictionary_encode(col)
        per_code = np.array(
            [weights_e4.get(v, default_e4)
             for v in enc.dictionary.to_pylist()], dtype=np.int64)
        w = per_code[np.asarray(enc.indices)]
        reps = w // SAMPLE_MOD + (bucket < (w % SAMPLE_MOD))
        idx = np.repeat(np.arange(n), reps)
        ends = np.cumsum(reps)
        copy = np.arange(len(idx)) - np.repeat(ends - reps, reps) + 1
        out = batch.take(pa.array(idx))
        return out.append_column(copy_col, pa.array(copy, pa.int64()))

    return ds.map_batches(fan, batch_format="pyarrow",
                          zero_copy_batch=True)


def bottomk_sample(ds, *, group_col: str, id_col: str = "doc_id",
                   k: int = 10, mult: int = SAMPLE_MULT,
                   mod: int = 1_000_003):
    """Fixed-SIZE deterministic sample per group (the companion of
    ``stratified_sample``'s fixed-RATE): keep the ``k`` rows of each
    group with the smallest multiplicative-hash key, ties broken by id.
    Bottom-k-by-hash is the classic coordinated-sampling construction
    (consistent across runs, cluster sizes and block orderings, and two
    corpora sampled with the same key agree on shared ids).

    Scale shape: each block collapses to its own per-group bottom-k
    candidate set (vectorized lexsort + run-rank, no Python loop), so
    at most groups×k rows per block reach the driver-side final
    selection — the corpus itself never shuffles. Driver memory is
    bounded by distinct-groups × k (the dimension-key contract; a
    high-cardinality group column belongs in ``stratified_sample``).

    Hash contract (same as ``_mult_hash``): the product is taken mod
    2^64 in uint64, so the full non-negative int64 id domain is defined
    on both sides — the SQL oracle wraps identically via HUGEINT.
    Exactly reproducible in SQL — oracle-paired. Returns a driver-side
    pa.Table (group_col, id_col) sorted by (group, id).
    """
    from doc_parser_ray.util import collect_table

    def local_bottomk(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy()
        key = _mult_hash(ids, mult, mod)
        o = np.lexsort((ids, key, g))
        g, ids, key = g[o], ids[o], key[o]
        run_start = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            new_run = np.flatnonzero(g[1:] != g[:-1]) + 1
            run_start[new_run] = new_run
            np.maximum.accumulate(run_start, out=run_start)
        sel = (np.arange(len(g)) - run_start) < k
        return pa.table({group_col: pa.array(g[sel].tolist()),
                         id_col: pa.array(ids[sel]),
                         "_key": pa.array(key[sel], pa.int64())})

    cand = collect_table(ds.select_columns([group_col, id_col]).map_batches(
        local_bottomk, batch_format="pyarrow", zero_copy_batch=True))
    if cand.num_rows == 0:
        return pa.table({group_col: pa.array([], pa.string()),
                         id_col: pa.array([], pa.int64())})
    # final bottom-k over the bounded candidate set, same ordering rule
    # (the hash key is recomputed from ids — identical by construction)
    final = local_bottomk(cand)
    return final.select([group_col, id_col]).sort_by(
        [(group_col, "ascending"), (id_col, "ascending")])
