"""Distributed sketches — approximate aggregates whose partial states
merge associatively, the map-side-combine shape taken to its limit:
every block produces a tiny fixed-size state, states merge in one
reduce, the corpus never shuffles.

HyperLogLog (Flajolet et al. 2007, with the small-range correction)
for approximate distinct counts: per-block register arrays (numpy max
per bucket), elementwise-max merge, driver-side harmonic estimate.
Standard error ≈ 1.04/sqrt(2^p).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


_POLARS_READY = False


def _polars():
    """Import polars defensively: inside a Ray worker a concurrent
    partial import can intermittently leave ``polars._reexport``
    without ``Series`` (AttributeError deep inside ``pl.from_arrow`` →
    ``wrap_s``). Attribute checks on the module proved unreliable
    (round-3/4 bench flakes), so the probe EXERCISES the failing code
    path itself — a one-element ``from_arrow`` — and retries until it
    succeeds; success is cached per process."""
    global _POLARS_READY
    import sys
    import time

    import polars as pl

    if _POLARS_READY:
        return pl
    last = None
    for attempt in range(30):
        try:
            pl.from_arrow(pa.array(["_probe"]))
            _POLARS_READY = True
            return pl
        except AttributeError as e:
            # a broken partial import is PERMANENT for the process
            # (retrying the same module object never heals) — purge
            # polars from sys.modules and import fresh; the import
            # lock serializes us against any in-flight import thread
            last = e
            time.sleep(0.02 * (attempt + 1))
            for name in [k for k in list(sys.modules)
                         if k == "polars" or k.startswith("polars.")]:
                sys.modules.pop(name, None)
            import polars as pl
    raise last  # genuinely broken install — surface the real error


def _hash64(values) -> np.ndarray:
    """Vectorized 64-bit hash of a column of values.

    Accepts a pyarrow Array/ChunkedArray (cast to string zero-ish-copy,
    hashed in one Rust pass via polars' seeded xxhash — deterministic
    across processes for a fixed seed and version) or any Python
    iterable of strings (ingested directly; non-string elements are
    stringified so the hash matches the Arrow string path). No per-row
    Python in the Arrow / string-sequence paths.
    """
    pl = _polars()

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        t = values.type
        if (pa.types.is_binary(t) or pa.types.is_large_binary(t)
                or pa.types.is_fixed_size_binary(t)):
            # binary keys hash natively (a cast to string would choke
            # on non-utf8 bytes)
            s = pl.from_arrow(values.cast(pa.binary())
                              if pa.types.is_fixed_size_binary(t)
                              else values)
        else:
            s = pl.from_arrow(values.cast(pa.string()))
    else:
        try:
            s = pl.Series(values, dtype=pl.String)
        except TypeError:
            s = pl.Series([str(v) for v in values])
    return s.hash(seed=0).to_numpy().astype(np.uint64, copy=False)


def hash_partition(col, num_partitions: int) -> pa.Array:
    """Bounded int32 partition ids for a key column — ONE vectorized
    pass, never per-value Python. Integer keys partition by value
    modulo (stable, debuggable, matches the SQL-emulable contract);
    every other type goes through the seeded-xxhash string pass."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array) and pa.types.is_integer(col.type):
        ids = col.to_numpy(zero_copy_only=False)
        return pa.array((ids % num_partitions).astype("int32"))
    if isinstance(col, np.ndarray) and col.dtype.kind in "iu":
        return pa.array((col % num_partitions).astype("int32"))
    return pa.array((_hash64(col) % np.uint64(num_partitions))
                    .astype("int32"))


# standard bias-correction constants (Flajolet et al. 2007 Fig. 3):
# exact values for m=16/32/64, the closed form for m >= 128
_ALPHA_SMALL = {4: 0.673, 5: 0.697, 6: 0.709}


class HyperLogLog:
    """Dense HLL with 2**p registers (4 <= p <= 16)."""

    def __init__(self, p: int = 12):
        if not 4 <= p <= 16:
            raise ValueError(f"HyperLogLog p must be in [4, 16], got {p}")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self.alpha = _ALPHA_SMALL.get(p, 0.7213 / (1 + 1.079 / self.m))

    def add_hashes(self, hashes: np.ndarray) -> None:
        bucket = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        # sentinel bit p-1 caps the rank at 64-p+1 when the remaining
        # bits are all zero; rest is therefore never 0
        rest = (hashes << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1, via bit length.
        # log2 on uint64 loses precision near 2^64, so take the HIGH 53
        # bits (exact in float64) and frexp; values < 2^11 would under-
        # rank through that path (frexp(0) -> 0 -> bitlen 11), so they
        # get the direct conversion, which IS exact below 2^53.
        hi = (rest >> np.uint64(11)).astype(np.float64)
        bitlen = np.frexp(hi)[1] + 11  # rest ≈ hi * 2^11
        small = rest < np.uint64(1 << 11)
        if small.any():
            bitlen[small] = np.frexp(rest[small].astype(np.float64))[1]
        rank = (64 - bitlen + 1).astype(np.uint8)
        np.maximum.at(self.registers, bucket, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        est = self.alpha * m * m / np.sum(
            np.power(2.0, -self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)


def approx_distinct(ds, column: str, *, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): per-block HLL registers,
    one elementwise-max reduce — blocks never shuffle."""
    def block_state(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_hashes(_hash64(batch.column(column)))
        return pa.table({"registers": pa.array([hll.registers.tobytes()],
                                               pa.binary())})

    states = ds.select_columns([column]).map_batches(
        block_state, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = HyperLogLog(p)
    for batch in states.iter_batches(batch_format="pyarrow"):
        for blob in batch.column("registers").to_pylist():
            other = HyperLogLog(p)
            other.registers = np.frombuffer(blob, dtype=np.uint8).copy()
            merged.merge(other)
    return merged.estimate()


def approx_distinct_by(ds, key: str, column: str, *, p: int = 12) -> pa.Table:
    """Per-key approximate distinct counts: register states combine in
    a keyed groupby whose shuffle carries (key, 2^p bytes) rows only."""
    def block_state(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        hashes = _hash64(batch.column(column))
        order = np.argsort(keys, kind="stable")
        out_k, out_r = [], []
        i, n = 0, len(keys)
        while i < n:  # one HLL per distinct key span — O(distinct keys)
            j = i
            u = keys[order[i]]
            while j < n and keys[order[j]] == u:
                j += 1
            hll = HyperLogLog(p)
            hll.add_hashes(hashes[order[i:j]])
            out_k.append(u)
            out_r.append(hll.registers.tobytes())
            i = j
        return pa.table({key: pa.array(out_k),
                         "registers": pa.array(out_r, pa.binary())})

    def merge_group(group: pa.Table) -> pa.Table:
        merged = HyperLogLog(p)
        for blob in group.column("registers").to_pylist():
            other = HyperLogLog(p)
            other.registers = np.frombuffer(blob, dtype=np.uint8).copy()
            merged.merge(other)
        return pa.table({
            key: group.column(key).slice(0, 1),
            "approx_distinct": pa.array([int(round(merged.estimate()))],
                                        pa.int64()),
        })

    states = ds.select_columns([key, column]).map_batches(
        block_state, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return states.groupby(key).map_groups(merge_group,
                                          batch_format="pyarrow")


# ------------------------------------------------- Misra-Gries top-k


class MisraGries:
    """Misra–Gries / SpaceSaving frequency summary with ``capacity``
    counters (Misra & Gries 1982; merge rule from Agarwal et al.,
    "Mergeable Summaries", PODS'12): after summarizing a stream of n
    items, every counter is within n/capacity of the item's true count,
    and any item with true count > n/capacity is guaranteed present.
    Fixed-size, associatively mergeable — the HLL shape for heavy
    hitters: blocks never shuffle, states do.
    """

    def __init__(self, capacity: int = 64):
        self.capacity = capacity
        self.counts: dict = {}

    def add_batch(self, values, counts=None) -> None:
        """Vectorized bulk insert: pre-aggregate the batch (numpy
        unique), add, then ONE decrement pass — equivalent to item-wise
        Misra-Gries, no per-item Python loop over the raw stream.

        With ``counts`` the caller asserts ``values`` are ALREADY
        pre-aggregated (unique) and aligned 1:1 with ``counts`` —
        np.unique would reorder/dedup values away from their counts, so
        it is skipped and the alignment is checked instead."""
        arr = np.asarray(values)
        if counts is None:
            if arr.dtype == object:
                arr = arr[np.array([v is not None for v in arr])]  # drop nulls
            vals, cnts = np.unique(arr, return_counts=True)
        else:
            cnts = np.asarray(counts)
            if len(arr) != len(cnts):
                raise ValueError(
                    f"values/counts length mismatch: {len(arr)} != {len(cnts)}")
            if len(np.unique(arr)) != len(arr):
                raise ValueError(
                    "add_batch(values, counts) requires pre-unique values")
            vals = arr
        for v, c in zip(vals.tolist(), cnts.tolist()):
            self.counts[v] = self.counts.get(v, 0) + int(c)
        self._shrink()

    def merge(self, other: "MisraGries") -> None:
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + c
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counts) <= self.capacity:
            return
        # decrement all by the (cap+1)-th largest count and drop <= 0 —
        # the batched equivalent of repeated Misra-Gries decrements
        arr = np.fromiter(self.counts.values(), dtype=np.int64)
        kth = np.partition(arr, -(self.capacity + 1))[-(self.capacity + 1)]
        self.counts = {v: c - int(kth)
                       for v, c in self.counts.items() if c > kth}

    def items(self) -> list[tuple]:
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))

    def to_arrow(self) -> pa.Table:
        ks = [str(v) for v, _ in self.counts.items()]
        cs = [c for _, c in self.counts.items()]
        return pa.table({"item": pa.array(ks, pa.string()),
                         "cnt": pa.array(cs, pa.int64())})


def approx_top_items(ds, column: str, *, capacity: int = 64,
                     k: int = 20) -> pa.Table:
    """Approximate top-k heavy hitters of a column: per-block
    Misra-Gries states (fixed size, built from the block's numpy-unique
    pre-aggregate), one driver-side merge — the corpus never shuffles.
    Returns (item, cnt_lower) — cnt is the MG lower bound; items with
    true frequency > n/capacity are guaranteed present.
    """

    def block_state(batch: pa.Table) -> pa.Table:
        mg = MisraGries(capacity)
        mg.add_batch(batch.column(column).to_numpy(zero_copy_only=False))
        t = mg.to_arrow()
        return pa.table({"state_items": pa.array([t.column("item").to_pylist()],
                                                 pa.list_(pa.string())),
                         "state_counts": pa.array([t.column("cnt").to_pylist()],
                                                  pa.list_(pa.int64()))})

    states = ds.select_columns([column]).map_batches(
        block_state, batch_format="pyarrow", zero_copy_batch=True)
    merged = MisraGries(capacity)
    for b in states.iter_batches(batch_format="pyarrow"):
        for items, cnts in zip(b.column("state_items").to_pylist(),
                               b.column("state_counts").to_pylist()):
            other = MisraGries(capacity)
            other.counts = dict(zip(items, cnts))
            merged.merge(other)
    top = merged.items()[:k]
    return pa.table({"item": pa.array([v for v, _ in top], pa.string()),
                     "cnt_lower": pa.array([c for _, c in top], pa.int64())})
