"""HyperLogLog sketch: error bounds, merge associativity, determinism."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from doc_parser_ray.stages.sketch import (
    HyperLogLog,
    _hash64,
    approx_distinct,
    approx_distinct_by,
)
from doc_parser_ray.util import collect_table


class TestHll:
    def test_error_bound_high_cardinality(self):
        n = 200_000
        hll = HyperLogLog(p=12)
        hll.add_hashes(_hash64(range(n)))
        est = hll.estimate()
        # standard error 1.04/sqrt(4096) ≈ 1.6%; allow 4 sigma
        assert abs(est - n) / n < 0.065, est

    def test_merge_equals_union(self):
        a, b, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
        ha = _hash64(range(0, 50_000))
        hb = _hash64(range(30_000, 80_000))
        a.add_hashes(ha)
        b.add_hashes(hb)
        u.add_hashes(np.concatenate([ha, hb]))
        merged = a.merge(b)
        assert np.array_equal(merged.registers, u.registers)

    def test_small_range_linear_counting(self):
        hll = HyperLogLog()
        hll.add_hashes(_hash64(range(150)))
        assert round(hll.estimate()) in (149, 150, 151)

    def test_deterministic(self):
        x = HyperLogLog(); y = HyperLogLog()
        x.add_hashes(_hash64(["a", "b", "c"]))
        y.add_hashes(_hash64(["a", "b", "c"]))
        assert np.array_equal(x.registers, y.registers)


@pytest.mark.usefixtures("ray_session")
class TestDistributedSketch:
    def test_blockwise_equals_single_state(self):
        vals = [f"u{i % 500}" for i in range(5000)]
        tab = pa.table({"v": pa.array(vals)})
        ds = ray.data.from_arrow(tab).repartition(8)
        est = approx_distinct(ds, "v")
        ref = HyperLogLog()
        ref.add_hashes(_hash64(vals))
        assert abs(est - ref.estimate()) < 1e-9  # merge is lossless

    def test_per_key(self):
        tab = pa.table({
            "k": pa.array(["a"] * 400 + ["b"] * 100),
            "v": pa.array([f"x{i % 37}" for i in range(400)]
                          + [f"y{i}" for i in range(100)]),
        })
        out = collect_table(
            approx_distinct_by(ray.data.from_arrow(tab), "k", "v")
        ).sort_by([("k", "ascending")])
        rows = {r["k"]: r["approx_distinct"] for r in out.to_pylist()}
        assert abs(rows["a"] - 37) <= 2
        assert abs(rows["b"] - 100) <= 4
