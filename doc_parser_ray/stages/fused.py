"""Fused read→extract→exchange→assemble: the headline fast path.

WHY raw Ray tasks here (the documented last resort): three
Dataset-native shapes of the one conv-keyed exchange were built and
MEASURED on the sf0.1 bench corpus (1.24M turns, 32 cpus / 8 cpus):

  1. ``groupby(conv_id).map_groups`` per conversation — one Python call
     per tiny group: ~150 s for 30k groups.
  2. materialize → sort-based ``groupby(pkey)`` (stages/assemble.py,
     kept as the portable path) — correct and fast in isolation
     (sort ≈ 2-6 s) but needs TWO materialize barriers (sort-sampling
     re-executes a non-materialized upstream: 54 s → 112 s at 8 cpus
     without the first barrier), serializing extract / shuffle /
     finalize instead of overlapping them.
  3. streaming input straight into the sort — double-executes the
     whole extraction upstream (measured 2× extract CPU).

The exchange itself is trivial (P is known, the key is an int bucket we
computed ourselves — no sampling, no range partitioning, no sort
needed), so this module does it as one classic two-wave map/reduce:

  wave 1 (one task per input file group): read parquet fragment →
    extract → add (salt, pkey) → split into P sub-tables by pkey
    → return P sub-tables + a per-block (conv, salt, n, chars) summary
  driver: combine the TINY summaries → global per-bucket rank offsets
    → ``ray.put`` broadcast (same small-side pattern as assemble.py)
  wave 2 (one task per partition): concat its B sub-tables → sort by
    (conv, salt, turn_idx) → vectorized ranks + broadcast counters
    → final block

Every row is touched exactly twice (extract once, rank once); there are
no barriers besides the inherent map→reduce dependency, no sampling
pass, and the only driver-side data is the bucket summary (bounded by
conversation count / salt_bucket_turns, NOT by rows). The result
returns to the Dataset world via ``ray.data.from_arrow_refs`` so sinks
(write_parquet) and downstream stages compose unchanged.

Partitioning assumptions (documented per SURVEY.md §7): (conv, salt)
buckets are bounded by ``salt_bucket_turns`` rows; partitions hold
~|rows|/P rows — both hold for any conversation-size distribution
because the salt spreads giant conversations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from doc_parser_ray.stages.assemble import (
    _SALT_MIX,
    _add_pkey,
    _conv_hash,
    _group_spans,
)
from doc_parser_ray.stages.extract import extract_batch


def partitioned_bucket_lookup(summary: pa.Table | None, num_partitions: int
                              ) -> list[pa.Table]:
    """Combine per-block bucket summaries into per-PARTITION lookup
    tables (conv_id, salt, base, total, chars), partitioned by the same
    hash as ``_add_pkey`` so each wave-2 task receives exactly its own
    buckets. Fully vectorized; the driver never holds more than one row
    per (conv, salt) bucket."""
    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "salt": pa.array([], pa.int64()),
        "base": pa.array([], pa.int64()),
        "total": pa.array([], pa.int64()),
        "chars": pa.array([], pa.int64()),
    })
    if summary is None or summary.num_rows == 0:
        return [empty] * num_partitions
    df = summary.to_pandas()
    df = (
        df.groupby(["conv_id", "salt"], as_index=False)[
            ["bucket_n", "bucket_chars"]
        ].sum().sort_values(["conv_id", "salt"], ignore_index=True)
    )
    convs = df["conv_id"].to_numpy()
    salts = df["salt"].to_numpy(dtype=np.int64)
    bn = df["bucket_n"].to_numpy(dtype=np.int64)
    bc = df["bucket_chars"].to_numpy(dtype=np.int64)
    m = len(df)
    new_conv = np.ones(m, dtype=bool)
    new_conv[1:] = convs[1:] != convs[:-1]
    gid = np.cumsum(new_conv) - 1
    cstarts = np.flatnonzero(new_conv)
    cum = np.concatenate(([0], np.cumsum(bn)[:-1]))  # exclusive prefix
    base = cum - cum[cstarts][gid]
    total = np.add.reduceat(bn, cstarts)[gid]
    chars = np.add.reduceat(bc, cstarts)[gid]
    # same partition hash as _add_pkey
    h = _conv_hash(convs) + salts.astype(np.uint64) * np.uint64(
        _SALT_MIX)
    pkey = (h % np.uint64(num_partitions)).astype(np.int64)
    tab = pa.table({
        "conv_id": pa.array(convs, pa.string()),
        "salt": pa.array(salts, pa.int64()),
        "base": pa.array(base, pa.int64()),
        "total": pa.array(total, pa.int64()),
        "chars": pa.array(chars, pa.int64()),
        "pkey": pa.array(pkey, pa.int64()),
    })
    order = np.argsort(pkey, kind="stable")
    sorted_tab = tab.take(pa.array(order))
    bounds = np.searchsorted(pkey[order], np.arange(num_partitions + 1))
    out = []
    for p in range(num_partitions):
        lo, hi = bounds[p], bounds[p + 1]
        out.append(sorted_tab.slice(lo, hi - lo).drop_columns(["pkey"])
                   if hi > lo else empty)
    return out


def _extract_and_split(files: list[str], columns: list[str] | None,
                       num_partitions: int, salt_bucket_turns: int,
                       batch_rows: int):
    """Wave-1 task body: returns [summary_table, part_0, ..., part_P-1]."""
    out_parts: list[list[pa.Table]] = [[] for _ in range(num_partitions)]
    summaries: list[pa.Table] = []
    for f in files:
        pf = pq.ParquetFile(f)
        for rb in pf.iter_batches(batch_size=batch_rows, columns=columns):
            tab = pa.Table.from_batches([rb])
            ex = extract_batch(tab)
            ex = _add_pkey(ex, num_partitions, salt_bucket_turns)
            pkey = ex.column("pkey").to_numpy(zero_copy_only=False)
            order = np.argsort(pkey, kind="stable")
            sorted_tab = ex.take(pa.array(order))
            sorted_keys = pkey[order]
            bounds = np.searchsorted(
                sorted_keys, np.arange(num_partitions + 1)
            )
            for p in range(num_partitions):
                lo, hi = bounds[p], bounds[p + 1]
                if hi > lo:
                    out_parts[p].append(sorted_tab.slice(lo, hi - lo))
            sub = ex.select(["conv_id", "salt", "n_chars_out"])
            summaries.append(
                pa.TableGroupBy(sub, ["conv_id", "salt"]).aggregate(
                    [("n_chars_out", "count"), ("n_chars_out", "sum")]
                ).rename_columns(
                    ["conv_id", "salt", "bucket_n", "bucket_chars"]
                )
            )
    merged_summary = pa.concat_tables(summaries) if summaries else None
    results: list = [merged_summary]
    for p in range(num_partitions):
        results.append(
            pa.concat_tables(out_parts[p]) if out_parts[p] else None
        )
    return results


def _assembled_empty() -> pa.Table:
    from doc_parser_ray.datamodel import EXTRACTED_SCHEMA

    schema = EXTRACTED_SCHEMA.append(
        pa.field("turn_ord", pa.int32())
    ).append(
        pa.field("n_turns_of_conv", pa.int32())
    ).append(pa.field("conv_n_chars_out", pa.int64()))
    return schema.empty_table()


def _rank_partition(lookup, *parts):
    """Wave-2 task body: concat one partition's sub-tables, rank, attach
    global counters by a vectorized merge against THIS PARTITION's
    bucket-summary slice (the summary is partitioned by the same key, so
    no task ever sees the global bucket list — bounded regardless of
    total conversation count). Returns (n_rows, table) so the driver can
    see sizes without fetching blocks."""
    import pandas as pd

    tabs = [t for t in parts if t is not None]
    if not tabs:
        return 0, _assembled_empty()
    part = pa.concat_tables(tabs)
    part = part.sort_by(
        [("conv_id", "ascending"), ("salt", "ascending"),
         ("turn_idx", "ascending")]
    )
    n = part.num_rows
    conv = np.asarray(part.column("conv_id").to_pylist(), dtype=object)
    salt = part.column("salt").to_numpy(zero_copy_only=False)
    gid, starts = _group_spans([conv, salt])
    local = np.arange(n, dtype=np.int64) - starts[gid]
    spans = pd.DataFrame(
        {"conv_id": conv[starts], "salt": salt[starts].astype("int64")}
    )
    merged = spans.merge(lookup.to_pandas(), on=["conv_id", "salt"],
                         how="left")
    base = merged["base"].to_numpy(dtype=np.int64)
    tot = merged["total"].to_numpy(dtype=np.int64)
    chr_ = merged["chars"].to_numpy(dtype=np.int64)
    part = part.drop_columns(["pkey", "salt"])
    part = part.append_column(
        "turn_ord", pa.array((base[gid] + local).astype(np.int32))
    )
    part = part.append_column(
        "n_turns_of_conv", pa.array(tot[gid].astype(np.int32))
    )
    part = part.append_column(
        "conv_n_chars_out", pa.array(chr_[gid].astype(np.int64))
    )
    return part.num_rows, part


def fused_extract_assemble(
    files: list[str],
    *,
    num_partitions: int = 32,
    salt_bucket_turns: int = 256,
    columns: list[str] | None = None,
    files_per_task: int = 1,
    batch_rows: int = 8192,
):
    """Run the fused pipeline over parquet ``files``; returns a
    ``ray.data.Dataset`` of assembled rows (one block per partition)."""
    import ray.data

    extract_split = ray.remote(num_returns=num_partitions + 1)(
        _extract_and_split
    )
    rank = ray.remote(num_returns=2)(_rank_partition)

    groups = [files[i: i + files_per_task]
              for i in range(0, len(files), files_per_task)]
    wave1 = [
        extract_split.remote(g, columns, num_partitions, salt_bucket_turns,
                             batch_rows)
        for g in groups
    ]
    summary_refs = [w[0] for w in wave1]
    part_refs = [[w[1 + p] for w in wave1] for p in range(num_partitions)]

    # driver-small: combine per-block bucket summaries into per-partition
    # lookup slices (no global broadcast — bounded per task)
    stabs = [t for t in ray.get(summary_refs) if t is not None]
    summary = pa.concat_tables(stabs) if stabs else None
    lookups = partitioned_bucket_lookup(summary, num_partitions)

    wave2 = [rank.remote(lookups[p], *part_refs[p])
             for p in range(num_partitions)]
    counts = ray.get([w[0] for w in wave2])  # scalars only — blocks
    # stay in the object store and re-enter the Dataset world zero-copy
    done = [w[1] for w, c in zip(wave2, counts) if c > 0]
    if not done:
        return ray.data.from_arrow(_assembled_empty())
    return ray.data.from_arrow_refs(done)
