"""Sequence packing — concatenate-and-split sample packing for LLM
training: documents are laid out back-to-back in a deterministic order
(per group, ordered by id) and cut into fixed token-budget training
sequences; a document may straddle a sequence boundary (the GPT-style
packing rule, as opposed to greedy bin packing whose sequential
fit-or-open-new decision doesn't vectorize or SQL-express).

The reference stops at per-document chunking (C1–C5); packing chunks
into fixed-length training sequences is the step a 100 TB pipeline
runs right before tokenized-corpus write-out, so it's part of the
training-data extension surface.

Scale shape: ONE bounded keyed exchange on the group column (the
sessionize shape — hash(group) % num_partitions, every group lands
whole); inside each partition the layout is pure per-group prefix
sums over the token counts — fully vectorized, no per-group Python.
Deterministic in (group, id) regardless of block order, so a resumed
or re-partitioned run packs identically.

Output per input row: ``seq_idx`` (which sequence its first token
lands in, 0-based per group), ``seq_offset`` (token offset inside that
sequence), ``n_seqs`` (how many sequences the doc spans; empty docs
span 1 by convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_sequences(ds, *, budget_tokens: int, group_col: str = "source",
                   id_col: str = "doc_id", tokens_col: str = "n_tokens",
                   num_partitions: int = 16):
    """Assign concat-and-split packing coordinates to every row.

    Returns a Dataset with the input's (group, id, tokens) projection
    plus ``seq_idx`` / ``seq_offset`` / ``n_seqs`` (all int64).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive: {budget_tokens}")

    def add_pkey(batch: pa.Table) -> pa.Table:
        from doc_parser_ray.stages.sketch import hash_partition

        return batch.append_column(
            "pkey", hash_partition(batch.column(group_col), num_partitions))

    def pack(part: pa.Table) -> pa.Table:
        part = part.sort_by([(group_col, "ascending"),
                             (id_col, "ascending")])
        n = part.num_rows
        if n == 0:
            return part.drop_columns(["pkey"])
        g = np.asarray(part.column(group_col).to_pylist(), dtype=object)
        tok = part.column(tokens_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ends = np.cumsum(tok)
        cum = ends - tok  # exclusive prefix sum, global
        # rebase per group: subtract each group's starting cum
        new_g = np.r_[True, g[1:] != g[:-1]]
        starts = np.flatnonzero(new_g)
        gid = np.cumsum(new_g) - 1
        cum = cum - cum[starts][gid]
        end = cum + tok
        seq_idx = cum // budget_tokens
        seq_offset = cum % budget_tokens
        n_seqs = np.where(tok == 0, 1,
                          (end - 1) // budget_tokens - seq_idx + 1)
        part = part.drop_columns(["pkey"])
        part = part.append_column("seq_idx", pa.array(seq_idx, pa.int64()))
        part = part.append_column("seq_offset",
                                  pa.array(seq_offset, pa.int64()))
        return part.append_column("n_seqs", pa.array(n_seqs, pa.int64()))

    keyed = ds.select_columns([group_col, id_col, tokens_col]).map_batches(
        add_pkey, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()  # boundary sampling would re-run the upstream map
    return keyed.groupby("pkey").map_groups(pack, batch_format="pyarrow")
