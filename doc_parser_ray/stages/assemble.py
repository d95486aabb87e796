"""Conversation assembly: stable turn ordering + per-conversation counters.

The reference's per-document assembly (ReadingOrderModel, a per-document
reduce over pages — docling/models/readingorder_model.py; chunk counters
— facade ``compose_vectors`` per-doc counters,
genon/preprocessor/facade/intelligent_processor.py:1222-1304) becomes a
keyed shuffle here: the ONE wide operation of the pipeline, keyed on
``conv_id`` and reused for every order-sensitive step.

Two strategies:

1. ``assemble_conversations`` — ``groupby(conv_id).map_groups`` with an
   explicit in-group ``sort_by(turn_idx)``. Correct for bounded
   conversations; one task per group batch.

2. ``assemble_conversations_salted`` — explicit skew handling for
   Zipf-heavy conversation sizes (a 5k-turn conversation must not pin a
   single reducer): the group key is salted with
   ``salt = turn_idx // salt_bucket_turns``, which both bounds reducer
   input AND aligns bucket order with turn order, so global per-conv
   counters are restored with a second, tiny reduce over per-bucket
   aggregates that is broadcast back via ``ray.put`` (small-side lookup,
   not a second all-to-all shuffle).

Output adds to each extracted row:
  - ``turn_ord``   : int32 dense rank of the turn within its conversation
                     (0-based, ordered by turn_idx) — the stable ordering
                     the north rule requires;
  - ``n_turns_of_conv`` : int32 (forward-looking total, the analog of
                     ``n_chunk_of_doc`` — intelligent_processor.py:1292);
  - ``conv_n_chars_out`` : int64 total extracted chars of the conversation.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _assemble_group(group: pa.Table) -> pa.Table:
    """Sort one conversation by turn_idx and attach counters."""
    group = group.sort_by([("turn_idx", "ascending")])
    n = group.num_rows
    total_chars = pc.sum(group.column("n_chars_out")).as_py() or 0
    group = group.append_column("turn_ord", pa.array(range(n), pa.int32()))
    group = group.append_column(
        "n_turns_of_conv", pa.array([n] * n, pa.int32())
    )
    group = group.append_column(
        "conv_n_chars_out", pa.array([total_chars] * n, pa.int64())
    )
    return group


def assemble_conversations(ds):
    """Plain keyed assembly: one shuffle on conv_id."""
    return ds.groupby("conv_id").map_groups(_assemble_group, batch_format="pyarrow")


def _add_salt(batch: pa.Table, salt_bucket_turns: int) -> pa.Table:
    salt = pc.cast(
        pc.floor(pc.divide(pc.cast(batch.column("turn_idx"), pa.float64()), salt_bucket_turns)),
        pa.int32(),
    )
    return batch.append_column("salt", salt)


def _assemble_bucket(group: pa.Table) -> pa.Table:
    """Phase-1 reducer: local order within one (conv_id, salt) bucket."""
    group = group.sort_by([("turn_idx", "ascending")])
    n = group.num_rows
    local_chars = pc.sum(group.column("n_chars_out")).as_py() or 0
    group = group.append_column("local_ord", pa.array(range(n), pa.int32()))
    group = group.append_column("bucket_n", pa.array([n] * n, pa.int32()))
    group = group.append_column("bucket_chars", pa.array([local_chars] * n, pa.int64()))
    return group


class _FinalizeCounters:
    """Phase-2 map: turn bucket-local ranks into global per-conv counters
    using the broadcast (conv_id, salt) → (offset, n_turns, n_chars)
    table. The lookup object is put in the object store ONCE and read
    zero-copy by every task (broadcast join, not a shuffle join)."""

    def __init__(self, lookup):
        # constructor args are shipped through the object store once per
        # actor by Ray (an ObjectRef here triggers a restartability
        # warning, see ray#53727 — the plain value is the same cost)
        self.offsets, self.totals, self.chars = lookup

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column("conv_id").to_pylist()
        salts = batch.column("salt").to_pylist()
        local = batch.column("local_ord").to_pylist()
        ords = [
            self.offsets[(c, s)] + lo for c, s, lo in zip(conv_ids, salts, local)
        ]
        n_turns = [self.totals[c] for c in conv_ids]
        n_chars = [self.chars[c] for c in conv_ids]
        batch = batch.drop_columns(["salt", "local_ord", "bucket_n", "bucket_chars"])
        batch = batch.append_column("turn_ord", pa.array(ords, pa.int32()))
        batch = batch.append_column("n_turns_of_conv", pa.array(n_turns, pa.int32()))
        batch = batch.append_column("conv_n_chars_out", pa.array(n_chars, pa.int64()))
        return batch


def assemble_conversations_salted(ds, salt_bucket_turns: int = 256):
    """Skew-safe assembly: salted shuffle + tiny second reduce + broadcast.

    Reducer input is bounded by ``salt_bucket_turns`` rows per group no
    matter how long a conversation is. The per-bucket aggregate table is
    ~(#convs x #buckets-per-conv) rows — driver-small — and is shipped to
    finalize tasks through ``ray.put`` once.
    """
    ds = ds.map_batches(
        lambda b: _add_salt(b, salt_bucket_turns),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bucketed = ds.groupby(["conv_id", "salt"]).map_groups(
        _assemble_bucket, batch_format="pyarrow"
    )
    # Streaming halts here by necessity: counters need every bucket's size.
    # The materialized set is the full extracted table (same size as the
    # output); the *aggregate* pulled to the driver is only
    # (conv_id, salt, n, chars) — tiny.
    bucketed = bucketed.materialize()

    agg = (
        bucketed.select_columns(["conv_id", "salt", "bucket_n", "bucket_chars"])
        .groupby(["conv_id", "salt"])
        .max("bucket_n")
        .to_pandas()
    )
    # bucket sizes are constant within a bucket → max == the size.
    chars_agg = (
        bucketed.select_columns(["conv_id", "salt", "bucket_chars"])
        .groupby(["conv_id", "salt"])
        .max("bucket_chars")
        .to_pandas()
    )

    agg = agg.sort_values(["conv_id", "salt"])
    offsets: dict = {}
    totals: dict = {}
    running: dict = {}
    for conv_id, salt, bn in zip(agg["conv_id"], agg["salt"], agg["max(bucket_n)"]):
        off = running.get(conv_id, 0)
        offsets[(conv_id, salt)] = off
        running[conv_id] = off + int(bn)
    totals = {c: int(v) for c, v in running.items()}
    chars: dict = {}
    for conv_id, bc in zip(chars_agg["conv_id"], chars_agg["max(bucket_chars)"]):
        chars[conv_id] = chars.get(conv_id, 0) + int(bc)

    return bucketed.map_batches(
        _FinalizeCounters,
        fn_constructor_args=((offsets, totals, chars),),
        batch_format="pyarrow",
        concurrency=(1, 8),
        zero_copy_batch=True,
    )
