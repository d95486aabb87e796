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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

_SALT_MIX = 0x9E3779B1  # Fibonacci hashing multiplier


def combine_bucket_summaries(summary: pa.Table | None):
    """Per-bucket (conv_id, salt, bucket_n, bucket_chars) partials →
    broadcast lookup dicts: rank offsets per (conv, salt), turn totals
    and char totals per conv. Fully vectorized (pandas groupby + numpy
    cumsum); the only Python-loop cost is the final dict construction.
    Driver-small by construction: one row per (conv, salt) bucket."""
    import numpy as np

    if summary is None or summary.num_rows == 0:
        return {}, {}, {}
    df = summary.to_pandas()
    df = (
        df.groupby(["conv_id", "salt"], as_index=False)[
            ["bucket_n", "bucket_chars"]
        ].sum().sort_values(["conv_id", "salt"], ignore_index=True)
    )
    convs = df["conv_id"].to_numpy()
    bn = df["bucket_n"].to_numpy(dtype=np.int64)
    new_conv = np.ones(len(df), dtype=bool)
    new_conv[1:] = convs[1:] != convs[:-1]
    cum = np.concatenate(([0], np.cumsum(bn)[:-1]))  # exclusive prefix
    conv_base = np.where(new_conv, cum, 0)
    np.maximum.accumulate(conv_base, out=conv_base)
    base = cum - conv_base
    offsets = dict(zip(zip(convs, df["salt"].astype(int)), base.tolist()))
    per_conv = df.groupby("conv_id", sort=False)[
        ["bucket_n", "bucket_chars"]
    ].sum()
    totals = per_conv["bucket_n"].astype(int).to_dict()
    chars = per_conv["bucket_chars"].astype(int).to_dict()
    return offsets, totals, chars


def _conv_hash(conv_ids) -> np.ndarray:
    """uint64 hash per conversation id — ONE vectorized xxhash pass
    (accepts a pyarrow column, numpy str array, or list of str); the
    former per-id ``zlib.crc32`` loop was measurable on every exchange."""
    from doc_parser_ray.stages.sketch import _hash64

    return _hash64(conv_ids)


def _add_pkey(batch: pa.Table, num_partitions: int,
              salt_bucket_turns: int | None) -> pa.Table:
    h = _conv_hash(batch.column("conv_id"))
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


def _bucket_rank_partition(part: pa.Table) -> pa.Table:
    """Shuffle reducer: bucket-LOCAL ranks + per-bucket summary columns,
    fully vectorized. Runs inside the one keyed exchange, so extraction
    upstream overlaps the shuffle map side (no barrier before it)."""
    part = part.sort_by(
        [("conv_id", "ascending"), ("salt", "ascending"),
         ("turn_idx", "ascending")]
    )
    n = part.num_rows
    if n == 0:
        return part.drop_columns(["pkey"])
    conv = np.asarray(part.column("conv_id").to_pylist(), dtype=object)
    salt = part.column("salt").to_numpy(zero_copy_only=False)
    gid, starts = _group_spans([conv, salt])
    idx = np.arange(n, dtype=np.int64)
    local = idx - starts[gid]
    counts = np.bincount(gid)
    chars = part.column("n_chars_out").to_numpy(zero_copy_only=False)
    char_sums = np.add.reduceat(chars, starts)
    part = part.drop_columns(["pkey"])
    part = part.append_column("local_ord", pa.array(local.astype(np.int32)))
    part = part.append_column(
        "bucket_n", pa.array(counts[gid].astype(np.int32))
    )
    return part.append_column(
        "bucket_chars", pa.array(char_sums[gid].astype(np.int64))
    )


def _make_finalizer(lookup_ref):
    """Streaming map (NO shuffle): global counters from the broadcast
    (offsets, totals, chars) lookup, one Python lookup per bucket."""

    def finalize(batch: pa.Table) -> pa.Table:
        offsets, totals, chars = ray.get(lookup_ref)
        n = batch.num_rows
        if n == 0:
            return batch.drop_columns(
                ["salt", "local_ord", "bucket_n", "bucket_chars"]
            )
        conv = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
        salt = batch.column("salt").to_numpy(zero_copy_only=False)
        local = batch.column("local_ord").to_numpy(zero_copy_only=False)
        # blocks come out of the reducer sorted by (conv, salt) → spans
        gid, starts = _group_spans([conv, salt])
        base = np.array(
            [offsets[(conv[s], int(salt[s]))] for s in starts], dtype=np.int64
        )
        tot = np.array([totals[conv[s]] for s in starts], dtype=np.int64)
        chr_ = np.array([chars[conv[s]] for s in starts], dtype=np.int64)
        batch = batch.drop_columns(
            ["salt", "local_ord", "bucket_n", "bucket_chars"]
        )
        batch = batch.append_column(
            "turn_ord", pa.array((base[gid] + local).astype(np.int32))
        )
        batch = batch.append_column(
            "n_turns_of_conv", pa.array(tot[gid].astype(np.int32))
        )
        return batch.append_column(
            "conv_n_chars_out", pa.array(chr_[gid].astype(np.int64))
        )

    return finalize


def assemble_conversations_salted(ds, salt_bucket_turns: int = 256,
                                  num_partitions: int = 64):
    """Skew-safe assembly: salted hash partitions + broadcast counter
    lookup. A conversation larger than ``salt_bucket_turns`` spreads
    across partitions; reducer input stays balanced regardless of
    conversation-size skew.

    Execution shape (the fast path — measured, not guessed):

      extract → add(salt, pkey) → groupby(pkey) [THE one exchange,
      reducer computes bucket-local ranks] → materialize
      → driver-small summary scan → broadcast → finalize map

    The shuffle is the FIRST wide op of the session's pipeline
    (extraction overlaps its map side; no barrier before it) and the
    per-bucket aggregate is read off the ranked output (rows with
    ``local_ord == 0`` carry the bucket summary) — no separate
    pre-aggregate pass, which measurably degraded the subsequent
    shuffle (2.1s → 5.8s on the sf0.1 bench corpus)."""
    ds = ds.map_batches(
        lambda b: _add_pkey(b, num_partitions, salt_bucket_turns),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bucketed = ds.groupby("pkey").map_groups(
        _bucket_rank_partition, batch_format="pyarrow"
    ).materialize()

    # driver-small: exactly one row per (conv, salt) bucket
    summaries = bucketed.map_batches(
        lambda b: b.filter(pc.equal(b.column("local_ord"), 0)).select(
            ["conv_id", "salt", "bucket_n", "bucket_chars"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from doc_parser_ray.util import collect_table

    offsets, totals, chars = combine_bucket_summaries(collect_table(summaries))
    lookup_ref = ray.put((offsets, totals, chars))
    return bucketed.map_batches(
        _make_finalizer(lookup_ref), batch_format="pyarrow",
        zero_copy_batch=True,
    )
