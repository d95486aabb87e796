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


# per-worker-process cache: the indexed small side is built once per
# worker (keyed by the broadcast ref), not once per batch — the
# task-based analog of actor __init__ state, without paying actor-pool
# startup for every short query
_SMALL_SIDE_CACHE: dict = {}


def _indexed_small(small_ref, right_key: str):
    key = (small_ref.hex() if hasattr(small_ref, "hex") else id(small_ref),
           right_key)
    if key not in _SMALL_SIDE_CACHE:
        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) \
            else small_ref
        _SMALL_SIDE_CACHE[key] = small.to_pandas().set_index(right_key)
    return _SMALL_SIDE_CACHE[key]


def broadcast_join(ds, small: pa.Table, *, left_key: str, right_key: str,
                   how: str = "inner", concurrency=None):
    """Join a streaming Dataset against a driver-small pyarrow Table.

    The small side is ``ray.put`` ONCE; every map task reads it
    zero-copy from the local object store and caches the built index
    per worker process. Plain tasks (no actor pool): the state is
    recoverable from the object store, so actor lifecycle buys nothing
    here and costs pool startup on every query."""
    small_ref = ray.put(small)

    def join_batch(batch: pa.Table) -> pa.Table:
        small_df = _indexed_small(small_ref, right_key)
        joined = batch.to_pandas().join(small_df, on=left_key, how=how)
        return pa.Table.from_pandas(joined, preserve_index=False)

    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(join_batch, batch_format="pyarrow", **kwargs)
