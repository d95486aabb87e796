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


def _hash64(values) -> np.ndarray:
    """Vectorized 64-bit hash of a column of values.

    Accepts a pyarrow Array/ChunkedArray (cast to string zero-ish-copy,
    hashed in one Rust pass via polars' seeded xxhash — deterministic
    across processes for a fixed seed and version) or any Python
    iterable (stringified first). No per-row Python in the Arrow path.
    """
    import polars as pl

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(values.cast(pa.string()))
    else:
        s = pl.Series([str(v) for v in values])
    return s.hash(seed=0).to_numpy().astype(np.uint64, copy=False)


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
