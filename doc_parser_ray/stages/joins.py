"""Join strategies.

``broadcast_join``: the scale-correct pattern for dimension tables —
the small side is ``ray.put`` into the object store ONCE and every map
task reads it zero-copy; the big side streams through ``map_batches``
with a per-batch pyarrow (Acero) hash join — Arrow-native end to end,
no pandas conversion. No all-to-all shuffle.

``shuffle_hash_join``: the big⋈big equi-join — both sides hash-
co-partitioned on the key into bounded partitions, one Acero join per
partition. Supports inner/left/right/full outer plus semi/anti
(EXISTS / NOT EXISTS); semi/anti shuffle keys only.

``asof_join``: each left row matched to the latest right row with the
same key at-or-before the left timestamp (tie-broken by the largest
value column). Two strategies sharing one vectorized in-partition merge:
  - broadcast (right side fits the budget): right side sorted ONCE into
    flat (key, ts, val) arrays, ``ray.put`` once, binary-searched per
    batch — the left side streams, nothing shuffles;
  - repartition-merge (right side too big to broadcast): both sides are
    hash-partitioned on the key into a BOUNDED number of partitions
    (pkey) and merged per partition — the shuffle moves only the join
    projections of both sides.

The reference has no cross-document joins at all (SURVEY.md §2.6) — its
only join-like ops are intra-document spatial/fuzzy matches — so this
module is part of the engine-completeness surface, not reference parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


# per-worker-process cache of broadcast objects: resolved from the
# object store once per worker (keyed by the ref), not once per batch —
# the task-based analog of actor __init__ state, without paying
# actor-pool startup for every short query
_BROADCAST_CACHE: dict = {}


def _worker_object(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = (ray.get(ref)
                                 if isinstance(ref, ray.ObjectRef) else ref)
    return _BROADCAST_CACHE[key]


def broadcast_join(ds, small: pa.Table, *, left_key: str, right_key: str,
                   how: str = "inner", concurrency=None):
    """Join a streaming Dataset against a driver-small pyarrow Table.

    The small side is ``ray.put`` ONCE; every map task reads it
    zero-copy from the local object store. Each batch runs one pyarrow
    ``Table.join`` (Acero hash join) — vectorized C++, no pandas.
    Plain tasks (no actor pool): the state is recoverable from the
    object store, so actor lifecycle buys nothing here and costs pool
    startup on every query.

    Only ``inner`` and ``left`` are broadcast-safe: a right/full outer
    join evaluated per streaming batch would re-emit the small side's
    unmatched rows once PER BATCH (and rows matched only in some other
    batch would still surface as spurious null-joined rows). Those
    semantics need a shuffle join (``Dataset.join``) — refuse here."""
    if how in ("right", "outer", "full outer", "right outer"):
        raise ValueError(
            f"broadcast_join cannot evaluate how={how!r} per batch: "
            "unmatched small-side rows would duplicate once per batch. "
            "Use an inner/left broadcast join or a shuffle join "
            "(Dataset.join) for right/full outer semantics.")
    small_ref = ray.put(small)
    join_type = {"left": "left outer"}.get(how, how)

    def join_batch(batch: pa.Table) -> pa.Table:
        small_tab = _worker_object(small_ref)
        return batch.join(small_tab, keys=[left_key], right_keys=[right_key],
                          join_type=join_type, right_suffix="_r")

    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(join_batch, batch_format="pyarrow", **kwargs)


# ---------------------------------------------------- shuffle hash


_SHUFFLE_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "outer": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def _pkey_array(keys, num_partitions: int) -> pa.Array:
    """Bounded hash-partition keys from a key column — one vectorized
    pass for every dtype (integer modulo / seeded-xxhash string pass),
    see ``stages.sketch.hash_partition``. Accepts a pyarrow column or a
    numpy array."""
    from doc_parser_ray.stages.sketch import hash_partition

    return hash_partition(keys, num_partitions)


def shuffle_hash_join(left_ds, right_ds, *, left_key: str, right_key: str,
                      how: str = "inner", num_partitions: int = 32):
    """Large⋈large equi-join: both sides hash-co-partitioned on the key
    into a BOUNDED number of partitions (``pkey``), then one pyarrow
    (Acero) hash join per partition.

    Because every key value lands in exactly one partition, ALL join
    semantics are correct per partition — including the right/full
    outer joins that ``broadcast_join`` must refuse (a per-batch outer
    join would re-emit unmatched small-side rows once per batch) and
    the semi/anti forms SQL spells EXISTS / NOT EXISTS:

      - ``inner`` / ``left`` / ``right`` / ``outer``
      - ``semi``  (left rows with ≥1 match; right side never emitted)
      - ``anti``  (left rows with NO match)

    For ``semi``/``anti`` the right side is projected to its key column
    before the exchange, so the shuffle moves keys only. The output of
    the non-semi forms carries the left columns plus the right columns
    (key coalesced; name clashes suffixed ``_r``), exactly like
    ``broadcast_join``. At 100 TB this is the shape for fact⋈fact:
    the shuffle moves only the two join projections, and partition
    count bounds the per-task working set; use ``broadcast_join`` when
    one side is dimension-scale.
    """
    if how not in _SHUFFLE_JOIN_TYPES:
        raise ValueError(
            f"how={how!r}: expected one of {sorted(_SHUFFLE_JOIN_TYPES)}")
    join_type = _SHUFFLE_JOIN_TYPES[how]
    if how in ("semi", "anti"):
        right_ds = right_ds.select_columns([right_key])
    left_schema = left_ds.schema().base_schema
    right_schema = right_ds.schema().base_schema

    # the two sides are partitioned independently by _pkey_array, which
    # branches on the key's physical kind (integer modulo vs string
    # hash) — keys of different KINDS (int64 vs string/float/decimal)
    # would land equal logical values in different partitions and
    # silently lose matches before Acero could even raise. Refuse early.
    def _key_kind(t: pa.DataType) -> str:
        if pa.types.is_integer(t):
            return "integer"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        return str(t)  # exact-type match required for everything else

    lk, rk = (_key_kind(left_schema.field(left_key).type),
              _key_kind(right_schema.field(right_key).type))
    if lk != rk:
        raise TypeError(
            f"shuffle_hash_join key kinds differ: {left_key}={lk} vs "
            f"{right_key}={rk} — cast one side so both partition "
            "identically (equal logical keys would otherwise land in "
            "different partitions and drop matches)")
    lt_t = left_schema.field(left_key).type
    rt_t = right_schema.field(right_key).type
    if lk == "integer" and lt_t != rt_t:
        # same kind, different widths: partitioning agrees (value
        # modulo) but Acero refuses mixed-width join keys — widen BOTH
        # key columns to int64 (lossless for signed ints; uint64 keys
        # above 2^63 fail the safe cast loudly rather than silently)
        def widen(key_col):
            def fn(batch: pa.Table) -> pa.Table:
                i = batch.column_names.index(key_col)
                return batch.set_column(
                    i, key_col, batch.column(key_col).cast(pa.int64()))
            return fn

        left_ds = left_ds.map_batches(widen(left_key),
                                      batch_format="pyarrow")
        right_ds = right_ds.map_batches(widen(right_key),
                                        batch_format="pyarrow")
        left_schema = pa.schema(
            [pa.field(f.name, pa.int64()) if f.name == left_key else f
             for f in left_schema])
        right_schema = pa.schema(
            [pa.field(f.name, pa.int64()) if f.name == right_key else f
             for f in right_schema])
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)

    def tag(side: int, key_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {"pkey": _pkey_array(batch.column(key_col),
                                        num_partitions),
                    "side": pa.array(np.full(n, side, dtype="int8"))}
            for c in left_cols:
                cols[f"l_{c}"] = (batch.column(c) if side == 0
                                  else pa.nulls(n, left_schema.field(c).type))
            for c in right_cols:
                cols[f"r_{c}"] = (batch.column(c) if side == 1
                                  else pa.nulls(n, right_schema.field(c).type))
            return pa.table(cols)
        return fn

    both = (left_ds.map_batches(tag(0, left_key), batch_format="pyarrow")
            .union(right_ds.map_batches(tag(1, right_key),
                                        batch_format="pyarrow"))
            .materialize())

    def merge(part: pa.Table) -> pa.Table:
        side = part.column("side").to_numpy(zero_copy_only=False)
        lt_rows = part.filter(pa.array(side == 0))
        rt_rows = part.filter(pa.array(side == 1))
        lt = pa.table({c: lt_rows.column(f"l_{c}") for c in left_cols})
        rt = pa.table({c: rt_rows.column(f"r_{c}") for c in right_cols})
        out = lt.join(rt, keys=[left_key], right_keys=[right_key],
                      join_type=join_type, right_suffix="_r")
        if join_type == "right outer" and left_key not in out.column_names:
            # Acero emits the (uncoalesced) right key for right outer —
            # rename to the left key so every `how` shares the convention
            out = out.rename_columns(
                [left_key if c == right_key else c
                 for c in out.column_names])
        return out

    return both.groupby("pkey").map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------------------ range


def _interval_lookup(keys: np.ndarray, ts: np.ndarray, rk: np.ndarray,
                     rs: np.ndarray, re_: np.ndarray,
                     rv: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized interval containment against (key, start, val)-sorted
    right arrays: for each left (key, ts) emit one match per right
    interval with the same key and ``start ≤ ts < end``. Left rows are
    grouped by key (one argsort), then one (rows × intervals) mask per
    distinct key. Returns (left_row_indices, matched_vals) — parallel
    arrays, possibly empty."""
    n = len(keys)
    take_idx: list[np.ndarray] = []
    vals: list[np.ndarray] = []
    order = np.argsort(keys, kind="stable")
    i = 0
    while i < n:
        j = i
        u = keys[order[i]]
        while j < n and keys[order[j]] == u:
            j += 1
        rows = order[i:j]
        s = np.searchsorted(rk, u, side="left")
        e = np.searchsorted(rk, u, side="right")
        if e > s:
            starts = rs[s:e]
            ends = re_[s:e]
            hit = ((starts[None, :] <= ts[rows, None])
                   & (ts[rows, None] < ends[None, :]))
            li, ri = np.nonzero(hit)
            if len(li):
                take_idx.append(rows[li])
                vals.append(rv[s + ri])
        i = j
    if not take_idx:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=rv.dtype))
    return np.concatenate(take_idx), np.concatenate(vals)


def interval_join(left_ds, right, *, left_key: str, left_ts: str,
                  right_key: str, start_col: str, end_col: str,
                  right_val: str, broadcast_budget_rows: int = 2_000_000,
                  num_partitions: int = 16):
    """Range (interval) join: every left row matched to EVERY right
    interval of the same key with ``start ≤ ts < end``.

    Two strategies sharing one vectorized containment kernel
    (``_interval_lookup``), budget-switched exactly like ``asof_join``:

      - broadcast (right side fits ``broadcast_budget_rows``): the right
        side is collected, sorted ONCE into flat (key, start, end, val)
        arrays and ``ray.put`` once; the left side streams unshuffled
        and each batch evaluates containment per distinct key;
      - repartition-merge (right side too big — e.g. a fact⋈fact
        self-join): both sides hash-partition on the key into a BOUNDED
        number of partitions and the identical kernel runs per
        partition. The shuffle moves only the join projections.

    Returns a Dataset with the left columns plus ``right_val``
    (one output row per match; unmatched left rows drop).
    """
    from doc_parser_ray.util import collect_table

    if isinstance(right, pa.Table):
        right_tab, right_rows = right, right.num_rows
    else:
        right = right.materialize()
        right_rows = right.count()
        right_tab = None  # collected only on the broadcast path

    if right_rows <= broadcast_budget_rows:
        if right_tab is None:
            right_tab = collect_table(right)
        right_tab = right_tab.select(
            [right_key, start_col, end_col, right_val]
        ).sort_by([(right_key, "ascending"), (start_col, "ascending"),
                   (right_val, "ascending")])
        rk = right_tab.column(right_key).to_numpy(zero_copy_only=False)
        rs = right_tab.column(start_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        re_ = right_tab.column(end_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        rv = right_tab.column(right_val).to_numpy(zero_copy_only=False)
        ref = ray.put((rk, rs, re_, rv))
        val_type = right_tab.schema.field(right_val).type

        def join_batch(batch: pa.Table) -> pa.Table:
            rk_, rs_, re2, rv_ = _worker_object(ref)
            keys = batch.column(left_key).to_numpy(zero_copy_only=False)
            ts = batch.column(left_ts).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            idx, vals = _interval_lookup(keys, ts, rk_, rs_, re2, rv_)
            if not len(idx):
                out = batch.slice(0, 0)
                return out.append_column(right_val, pa.array([], val_type))
            out = batch.take(pa.array(idx))
            return out.append_column(right_val, pa.array(vals, val_type))

        return left_ds.map_batches(join_batch, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # ---- repartition-merge fallback: both sides keyed into bounded
    # partitions; only join projections shuffle (mirrors asof_join)
    left_cols = left_ds.schema().names
    left_schema = left_ds.schema().base_schema
    left_key_type = left_schema.field(left_key).type
    right_val_type = right.schema().base_schema.field(right_val).type

    def tag(side: int, key_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {"pkey": _pkey_array(batch.column(key_col),
                                        num_partitions),
                    "side": pa.array(np.full(n, side, dtype="int8"))}
            if side == 0:
                for c in left_cols:
                    cols[f"l_{c}"] = batch.column(c)
                cols["r_start"] = pa.nulls(n, pa.int64())
                cols["r_end"] = pa.nulls(n, pa.int64())
                cols["r_val"] = pa.nulls(n, right_val_type)
            else:
                for c in left_cols:
                    cols[f"l_{c}"] = pa.nulls(
                        n, left_schema.field(c).type)
                # cast to the LEFT key type so the union schema agrees
                cols[f"l_{left_key}"] = batch.column(key_col).cast(
                    left_key_type)
                cols["r_start"] = batch.column(start_col).cast(pa.int64())
                cols["r_end"] = batch.column(end_col).cast(pa.int64())
                cols["r_val"] = batch.column(right_val)
            return pa.table(cols)
        return fn

    right_proj = (right.select_columns(
        [right_key, start_col, end_col, right_val])
        .map_batches(tag(1, right_key), batch_format="pyarrow"))
    left_tagged = left_ds.map_batches(tag(0, left_key),
                                      batch_format="pyarrow")
    both = left_tagged.union(right_proj).materialize()

    def merge(part: pa.Table) -> pa.Table:
        side = part.column("side").to_numpy(zero_copy_only=False)
        rt_tab = part.filter(pa.array(side == 1))
        lt_tab = part.filter(pa.array(side == 0))
        empty_cols = {c: pa.array([], left_schema.field(c).type)
                      for c in left_cols}
        empty_cols[right_val] = pa.array([], right_val_type)
        if rt_tab.num_rows == 0 or lt_tab.num_rows == 0:
            return pa.table(empty_cols)
        rt_tab = rt_tab.sort_by(
            [(f"l_{left_key}", "ascending"), ("r_start", "ascending"),
             ("r_val", "ascending")]
        )
        rk = rt_tab.column(f"l_{left_key}").to_numpy(zero_copy_only=False)
        rs = rt_tab.column("r_start").to_numpy(zero_copy_only=False)
        re_ = rt_tab.column("r_end").to_numpy(zero_copy_only=False)
        rv = rt_tab.column("r_val").to_numpy(zero_copy_only=False)
        keys = lt_tab.column(f"l_{left_key}").to_numpy(zero_copy_only=False)
        ts = lt_tab.column(f"l_{left_ts}").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        idx, vals = _interval_lookup(keys, ts, rk, rs, re_, rv)
        if not len(idx):
            return pa.table(empty_cols)
        out = lt_tab.take(pa.array(idx))
        cols = {c: out.column(f"l_{c}") for c in left_cols}
        cols[right_val] = pa.array(vals, right_val_type)
        return pa.table(cols)

    return both.groupby("pkey").map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------------------- as-of


def _sorted_right_arrays(right: pa.Table, key: str, ts: str,
                         val: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(key, ts, val) arrays sorted by (key, ts, val) — one vectorized
    table sort, no per-row Python. The rightmost in-span match under
    this order IS the as-of winner with max-val tie-breaking."""
    right = right.select([key, ts, val]).sort_by(
        [(key, "ascending"), (ts, "ascending"), (val, "ascending")]
    )
    return (
        right.column(key).to_numpy(zero_copy_only=False),
        right.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False),
        right.column(val).to_numpy(zero_copy_only=False),
    )


def _asof_lookup(batch_keys: np.ndarray, batch_ts: np.ndarray,
                 rk: np.ndarray, rt: np.ndarray,
                 rv: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized as-of: for each (key, ts) find the right-side row with
    the same key and max ts' ≤ ts (ties → max val). Returns (hit_mask,
    matched_vals[hit]). Left rows are grouped by key (one argsort), then
    one searchsorted per distinct key in the batch."""
    n = len(batch_keys)
    hit = np.zeros(n, dtype=bool)
    out_val = np.empty(n, dtype=rv.dtype)
    order = np.argsort(batch_keys, kind="stable")
    i = 0
    while i < n:
        j = i
        u = batch_keys[order[i]]
        while j < n and batch_keys[order[j]] == u:
            j += 1
        rows = order[i:j]
        s = np.searchsorted(rk, u, side="left")
        e = np.searchsorted(rk, u, side="right")
        if e > s:
            pos = np.searchsorted(rt[s:e], batch_ts[rows], side="right") - 1
            found = pos >= 0
            hit[rows[found]] = True
            out_val[rows[found]] = rv[s + pos[found]]
        i = j
    return hit, out_val


def asof_join(left_ds, right, *, left_key: str, right_key: str,
              left_ts: str, right_ts: str, right_val: str,
              broadcast_budget_rows: int = 2_000_000,
              num_partitions: int = 16):
    """As-of join (latest right ≤ left ts per key; max-val tie-break).

    ``right`` is a Dataset or pyarrow Table. When its row count fits
    ``broadcast_budget_rows`` the sorted right arrays are broadcast and
    the left side streams unshuffled; otherwise both sides repartition
    on a bounded key hash and the identical vectorized merge runs per
    partition. Returns a Dataset with the left columns (unmatched rows
    dropped) plus ``right_val``.
    """
    from doc_parser_ray.util import collect_table

    if isinstance(right, pa.Table):
        right_tab, right_rows = right, right.num_rows
    else:
        right = right.materialize()
        right_rows = right.count()
        right_tab = None  # collected only on the broadcast path

    if right_rows <= broadcast_budget_rows:
        if right_tab is None:
            right_tab = collect_table(right)
        rk, rt, rv = _sorted_right_arrays(right_tab, right_key, right_ts,
                                          right_val)
        arrays_ref = ray.put((rk, rt, rv))

        def asof_batch(batch: pa.Table) -> pa.Table:
            rk_, rt_, rv_ = _worker_object(arrays_ref)
            keys = batch.column(left_key).to_numpy(zero_copy_only=False)
            ts = batch.column(left_ts).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hit, vals = _asof_lookup(keys, ts, rk_, rt_, rv_)
            out = batch.filter(pa.array(hit))
            return out.append_column(right_val, pa.array(vals[hit]))

        return left_ds.map_batches(asof_batch, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # ---- repartition-merge fallback: both sides keyed into bounded
    # partitions; only join projections shuffle
    left_cols = left_ds.schema().names

    def tag(side: int, key_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {"pkey": _pkey_array(batch.column(key_col),
                                        num_partitions),
                    "side": pa.array(np.full(n, side, dtype="int8"))}
            if side == 0:
                for c in left_cols:
                    cols[f"l_{c}"] = batch.column(c)
                cols["r_ts"] = pa.nulls(n, pa.int64())
                cols["r_val"] = pa.nulls(n, right_val_type)
            else:
                for c in left_cols:
                    cols[f"l_{c}"] = pa.nulls(
                        n, left_schema.field(c).type)
                # cast to the LEFT key type so the union schema agrees
                # even when the two key columns differ (e.g. int32/int64)
                cols[f"l_{left_key}"] = batch.column(key_col).cast(
                    left_schema.field(left_key).type)
                cols["r_ts"] = batch.column(right_ts).cast(pa.int64())
                cols["r_val"] = batch.column(right_val)
            return pa.table(cols)
        return fn

    left_schema = left_ds.schema().base_schema
    right_val_type = right.schema().base_schema.field(right_val).type
    right_proj = (right.select_columns([right_key, right_ts, right_val])
                  .map_batches(tag(1, right_key), batch_format="pyarrow"))
    left_tagged = left_ds.map_batches(tag(0, left_key),
                                      batch_format="pyarrow")
    both = left_tagged.union(right_proj).materialize()

    def merge(part: pa.Table) -> pa.Table:
        side = part.column("side").to_numpy(zero_copy_only=False)
        rt_tab = part.filter(pa.array(side == 1))
        lt_tab = part.filter(pa.array(side == 0))
        empty_cols = {c: pa.array([], left_schema.field(c).type)
                      for c in left_cols}
        empty_cols[right_val] = pa.array([], rt_tab.schema.field("r_val").type)
        if rt_tab.num_rows == 0 or lt_tab.num_rows == 0:
            return pa.table(empty_cols)
        rt_tab = rt_tab.sort_by(
            [(f"l_{left_key}", "ascending"), ("r_ts", "ascending"),
             ("r_val", "ascending")]
        )
        rk = rt_tab.column(f"l_{left_key}").to_numpy(zero_copy_only=False)
        rt = rt_tab.column("r_ts").to_numpy(zero_copy_only=False)
        rv = rt_tab.column("r_val").to_numpy(zero_copy_only=False)
        keys = lt_tab.column(f"l_{left_key}").to_numpy(zero_copy_only=False)
        ts = lt_tab.column(f"l_{left_ts}").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hit, vals = _asof_lookup(keys, ts, rk, rt, rv)
        out = lt_tab.filter(pa.array(hit))
        cols = {c: out.column(f"l_{c}") for c in left_cols}
        cols[right_val] = pa.array(vals[hit])
        return pa.table(cols)

    return both.groupby("pkey").map_groups(merge, batch_format="pyarrow")
