"""Join strategies.

``broadcast_join``: the scale-correct pattern for dimension tables —
the small side is ``ray.put`` into the object store ONCE and every map
task reads it zero-copy; the big side streams through ``map_batches``
with a vectorized (pandas merge) per-batch lookup. No all-to-all
shuffle. Use ``Dataset.join`` (hash shuffle join) only for big⋈big.

The reference has no cross-document joins at all (SURVEY.md §2.6) — its
only join-like ops are intra-document spatial/fuzzy matches — so this
module is part of the engine-completeness surface, not reference parity.
"""

from __future__ import annotations

import pyarrow as pa

import ray


class _BroadcastJoin:
    def __init__(self, small_ref, left_key: str, right_key: str, how: str):
        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.small_df = small.to_pandas().set_index(right_key)
        self.left_key = left_key
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        joined = df.join(self.small_df, on=self.left_key, how=self.how)
        return pa.Table.from_pandas(joined, preserve_index=False)


def broadcast_join(ds, small: pa.Table, *, left_key: str, right_key: str,
                   how: str = "inner", concurrency=(1, 8)):
    """Join a streaming Dataset against a driver-small pyarrow Table."""
    small_ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoin,
        fn_constructor_args=(small_ref, left_key, right_key, how),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
