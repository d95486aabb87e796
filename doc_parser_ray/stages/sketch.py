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

import hashlib

import numpy as np
import pyarrow as pa


def _hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        out[i] = np.frombuffer(h, dtype=np.uint64)[0]
    return out


class HyperLogLog:
    """Dense HLL with 2**p registers."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 12:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        elif p >= 7:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = 0.673

    def add_hashes(self, hashes: np.ndarray) -> None:
        bucket = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (hashes << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1, vectorized via
        # bit-length: 64 - floor(log2(rest))
        rank = np.zeros(len(hashes), dtype=np.uint8)
        nonzero = rest != 0
        # log2 on uint64 loses precision near 2^64 — use float128-safe
        # approach: count via np.left_shift probing is slow; use
        # np.frexp on float conversion of the HIGH 53 bits
        hi = (rest >> np.uint64(11)).astype(np.float64)  # 53-bit safe
        exp = np.frexp(hi)[1]  # rest ≈ hi * 2^11, bitlen = exp + 11
        bitlen = exp + 11
        rank[nonzero] = (64 - bitlen[nonzero] + 1).astype(np.uint8)
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
        hll.add_hashes(_hash64(batch.column(column).to_pylist()))
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
        keys = batch.column(key).to_pylist()
        vals = batch.column(column).to_pylist()
        by_key: dict = {}
        hashes = _hash64(vals)
        for k, h in zip(keys, hashes):
            by_key.setdefault(k, []).append(h)
        out_k, out_r = [], []
        for k, hs in by_key.items():
            hll = HyperLogLog(p)
            hll.add_hashes(np.array(hs, dtype=np.uint64))
            out_k.append(k)
            out_r.append(hll.registers.tobytes())
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
