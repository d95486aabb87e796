"""Conversation assembly: stable turn ordering + per-conversation counters.

The reference's per-document assembly (ReadingOrderModel, a per-document
reduce over pages — docling/models/readingorder_model.py; per-doc chunk
counters — facade ``compose_vectors``,
genon/preprocessor/facade/intelligent_processor.py:1222-1304) becomes a
keyed exchange here: the ONE wide operation of the pipeline, keyed on
``conv_id``.

Design notes (scale):

- A naive ``groupby(conv_id).map_groups(fn)`` invokes Python once per
  conversation — milliseconds of overhead x millions of tiny groups
  dominates wall time (measured 30k groups ≈ 150 s at sf0.1). Instead we
  group by a BOUNDED hash-partition key (``num_partitions`` groups) and
  compute all per-conversation ranks/counters VECTORIZED (numpy) inside
  each partition. Python-call overhead is O(partitions), not O(convs).

- ``assemble_conversations``: partition key = hash(conv_id) % P → every
  conversation lands wholly in one partition; ranks, totals and char
  sums are derived in-partition. Handles any conversation that fits a
  reducer.

- ``assemble_conversations_salted``: explicit skew handling — the key
  adds ``salt = turn_idx // salt_bucket_turns``, so a single giant
  conversation spreads over many partitions while each (conv, salt)
  bucket stays intact. Global counters are restored from a driver-small
  per-bucket aggregate ((conv, salt) → count/chars) broadcast via
  ``ray.put`` — a small-side lookup, not a second all-to-all. The
  upstream Dataset is materialized once so extraction isn't recomputed
  for the aggregate pass.

Output adds to each extracted row:
  - ``turn_ord``        : int32 dense rank within the conversation
                          (0-based, by turn_idx) — stable ordering;
  - ``n_turns_of_conv`` : int32 forward-looking total (analog of
                          ``n_chunk_of_doc``, intelligent_processor.py:1292);
  - ``conv_n_chars_out``: int64 total extracted chars of the conversation.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

_SALT_MIX = 0x9E3779B1  # Fibonacci hashing multiplier


def _conv_hash(conv_ids: list[str]) -> np.ndarray:
    return np.array([zlib.crc32(c.encode()) for c in conv_ids], dtype=np.uint64)


def _add_pkey(batch: pa.Table, num_partitions: int,
              salt_bucket_turns: int | None) -> pa.Table:
    h = _conv_hash(batch.column("conv_id").to_pylist())
    if salt_bucket_turns:
        salt = (
            batch.column("turn_idx").to_numpy(zero_copy_only=False)
            // salt_bucket_turns
        ).astype(np.uint64)
        batch = batch.append_column("salt", pa.array(salt.astype(np.int32)))
        h = h + salt * np.uint64(_SALT_MIX)
    pkey = (h % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column("pkey", pa.array(pkey))


def _group_spans(sort_keys: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """(group_id per row, start index per group) for pre-sorted key arrays."""
    n = len(sort_keys[0])
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in sort_keys:
        change[1:] |= k[1:] != k[:-1]
    gid = np.cumsum(change) - 1
    starts = np.flatnonzero(change)
    return gid, starts


def _assemble_partition(part: pa.Table) -> pa.Table:
    """Vectorized per-conversation ranks/counters for all conversations
    in one hash partition (no salt: convs are whole here)."""
    part = part.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    n = part.num_rows
    if n == 0:
        return part.drop_columns(["pkey"])
    conv = np.asarray(part.column("conv_id").to_pylist(), dtype=object)
    gid, starts = _group_spans([conv])
    idx = np.arange(n, dtype=np.int64)
    local = idx - starts[gid]
    counts = np.bincount(gid)
    chars = part.column("n_chars_out").to_numpy(zero_copy_only=False)
    char_sums = np.add.reduceat(chars, starts)
    part = part.drop_columns(["pkey"])
    part = part.append_column("turn_ord", pa.array(local.astype(np.int32)))
    part = part.append_column(
        "n_turns_of_conv", pa.array(counts[gid].astype(np.int32))
    )
    part = part.append_column(
        "conv_n_chars_out", pa.array(char_sums[gid].astype(np.int64))
    )
    return part


def assemble_conversations(ds, num_partitions: int = 64):
    """Keyed assembly: one shuffle into ``num_partitions`` hash
    partitions, vectorized in-partition computation."""
    ds = ds.map_batches(
        lambda b: _add_pkey(b, num_partitions, None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ds.groupby("pkey").map_groups(
        _assemble_partition, batch_format="pyarrow"
    )


def _make_salted_assembler(lookup_ref):
    """Partition fn: vectorized bucket-local ranks + global counters from
    the broadcast (offsets, totals, chars) lookup (resolved zero-copy
    from the local object store, cached per worker)."""

    def assemble(part: pa.Table) -> pa.Table:
        offsets, totals, chars = ray.get(lookup_ref)
        part = part.sort_by(
            [("conv_id", "ascending"), ("salt", "ascending"),
             ("turn_idx", "ascending")]
        )
        n = part.num_rows
        if n == 0:
            return part.drop_columns(["pkey", "salt"])
        conv = np.asarray(part.column("conv_id").to_pylist(), dtype=object)
        salt = part.column("salt").to_numpy(zero_copy_only=False)
        gid, starts = _group_spans([conv, salt])
        idx = np.arange(n, dtype=np.int64)
        local = idx - starts[gid]
        # one Python lookup per bucket (not per row)
        base = np.array(
            [offsets[(conv[s], int(salt[s]))] for s in starts], dtype=np.int64
        )
        tot = np.array([totals[conv[s]] for s in starts], dtype=np.int64)
        chr_ = np.array([chars[conv[s]] for s in starts], dtype=np.int64)
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
        return part

    return assemble


def assemble_conversations_salted(ds, salt_bucket_turns: int = 256,
                                  num_partitions: int = 64):
    """Skew-safe assembly: salted hash partitions + broadcast counter
    lookup. A conversation larger than ``salt_bucket_turns`` spreads
    across partitions; reducer input stays balanced regardless of
    conversation-size skew."""
    ds = ds.map_batches(
        lambda b: _add_pkey(b, num_partitions, salt_bucket_turns),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # one materialization so extraction isn't recomputed for the
    # aggregate pass; blocks stay in the (spillable) object store
    ds = ds.materialize()

    # per-bucket aggregate WITHOUT a second all-to-all: each batch emits a
    # tiny (conv_id, salt, n, chars) partial (pre-aggregated inside
    # map_batches — the combiner pattern), combined driver-side. The
    # partial result is ~one row per (conv, salt) bucket per block —
    # driver-small by construction since bucket size is bounded.
    def _partial_agg(batch: pa.Table) -> pa.Table:
        sub = batch.select(["conv_id", "salt", "n_chars_out"])
        return pa.TableGroupBy(sub, ["conv_id", "salt"]).aggregate(
            [("n_chars_out", "count"), ("n_chars_out", "sum")]
        ).rename_columns(["conv_id", "salt", "bucket_n", "bucket_chars"])

    parts = ds.map_batches(
        _partial_agg, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    agg = (
        parts.groupby(["conv_id", "salt"], as_index=False)[
            ["bucket_n", "bucket_chars"]
        ]
        .sum()
        .sort_values(["conv_id", "salt"])
    )
    offsets: dict = {}
    running: dict = {}
    chars: dict = {}
    for conv_id, salt, bn, bc in zip(
        agg["conv_id"], agg["salt"], agg["bucket_n"], agg["bucket_chars"]
    ):
        off = running.get(conv_id, 0)
        offsets[(conv_id, int(salt))] = off
        running[conv_id] = off + int(bn)
        chars[conv_id] = chars.get(conv_id, 0) + int(bc)
    totals = {c: int(v) for c, v in running.items()}

    lookup_ref = ray.put((offsets, totals, chars))
    return ds.groupby("pkey").map_groups(
        _make_salted_assembler(lookup_ref), batch_format="pyarrow"
    )
