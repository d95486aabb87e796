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

    def test_rank_exact_when_remaining_bits_zero(self):
        """hash=0 at p=8: rest is just the sentinel (2^7 < 2^11), which
        the high-53-bit path would under-rank to 54; the exact rank is
        the maximum, 64 - p + 1."""
        hll = HyperLogLog(p=8)
        hll.add_hashes(np.array([0], dtype=np.uint64))
        assert hll.registers[0] == 64 - 8 + 1

    def test_small_p_alpha_table_and_validation(self):
        assert HyperLogLog(p=4).alpha == 0.673
        assert HyperLogLog(p=5).alpha == 0.697
        assert HyperLogLog(p=6).alpha == 0.709
        for bad in (3, 17):
            with pytest.raises(ValueError):
                HyperLogLog(p=bad)

    def test_error_bound_small_p(self):
        """p=6 exercises the small-p alpha and the small-rest rank path
        (any hash whose low 58 bits are < 2^5 lands there)."""
        n = 50_000
        hll = HyperLogLog(p=6)
        hll.add_hashes(_hash64(range(n)))
        est = hll.estimate()
        # standard error 1.04/sqrt(64) = 13%; allow 4 sigma
        assert abs(est - n) / n < 0.52, est

    def test_arrow_column_and_pylist_hash_agree(self):
        col = pa.chunked_array([pa.array([1, 2, 3], pa.int64())])
        assert np.array_equal(_hash64(col), _hash64([1, 2, 3]))


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


class TestMisraGries:
    def test_exact_when_under_capacity(self):
        from doc_parser_ray.stages.sketch import MisraGries

        mg = MisraGries(capacity=16)
        mg.add_batch(["a"] * 5 + ["b"] * 3 + ["c"])
        assert dict(mg.items()) == {"a": 5, "b": 3, "c": 1}

    def test_heavy_hitter_guarantee_and_lower_bound(self):
        from doc_parser_ray.stages.sketch import MisraGries

        rng = np.random.RandomState(0)
        # one heavy item (40%) in a long tail of 200 distinct values
        stream = (["HH"] * 400
                  + [f"t{i}" for i in rng.randint(0, 200, size=600)])
        rng.shuffle(stream)
        mg = MisraGries(capacity=8)
        for i in range(0, len(stream), 100):  # batched inserts
            mg.add_batch(stream[i:i + 100])
        got = dict(mg.items())
        assert "HH" in got                 # freq > n/capacity present
        assert got["HH"] <= 400            # count is a lower bound
        assert got["HH"] >= 400 - len(stream) // 8  # within n/capacity
        assert len(got) <= 8

    def test_merge_matches_single_stream(self):
        from doc_parser_ray.stages.sketch import MisraGries

        a = ["x"] * 50 + ["y"] * 30 + ["z"] * 5
        b = ["x"] * 40 + ["w"] * 25 + ["z"] * 5
        m1 = MisraGries(4); m1.add_batch(a)
        m2 = MisraGries(4); m2.add_batch(b)
        m1.merge(m2)
        whole = MisraGries(4); whole.add_batch(a + b)
        # same guarantee set: every true-heavy item survives both paths
        assert "x" in dict(m1.items()) and "x" in dict(whole.items())
        assert dict(m1.items())["x"] <= 90

    @pytest.mark.usefixtures("ray_session")
    def test_approx_top_items_exact_small_vocab(self):
        import ray.data

        from doc_parser_ray.stages.sketch import approx_top_items

        vals = ["p"] * 30 + ["q"] * 20 + ["r"] * 10 + ["s"] * 5
        ds = ray.data.from_arrow(
            pa.table({"v": pa.array(vals, pa.string())})).repartition(4)
        out = approx_top_items(ds, "v", capacity=16, k=3)
        assert out.column("item").to_pylist() == ["p", "q", "r"]
        assert out.column("cnt_lower").to_pylist() == [30, 20, 10]

    def test_nulls_dropped(self):
        from doc_parser_ray.stages.sketch import MisraGries

        mg = MisraGries(4)
        mg.add_batch(np.array(["a", None, "a", None], dtype=object))
        assert dict(mg.items()) == {"a": 2}
