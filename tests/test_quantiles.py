"""exact_quantiles: both strategies (small-histogram vs bucketed
two-pass) must agree with the naive rank rule on the same data."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from doc_parser_ray.pipelines.relational import exact_quantiles


def _naive(vals, quantiles):
    s = np.sort(vals)
    n = len(s)
    return [int(s[max(1, int(np.ceil(q * n))) - 1]) for q in quantiles]


@pytest.mark.usefixtures("ray_session")
class TestExactQuantiles:
    QS = (0.5, 0.9, 0.99)

    def _run(self, vals, budget):
        ds = ray.data.from_arrow(
            pa.table({"v": pa.array(vals, pa.int64())})).repartition(4)
        return exact_quantiles(ds, "v", self.QS, distinct_budget=budget,
                               num_buckets=64)

    def test_small_histogram_path(self):
        rng = np.random.RandomState(3)
        vals = rng.randint(0, 50, 4000)  # 50 distinct — takes the
        assert self._run(vals, 10**6) == _naive(vals, self.QS)

    def test_bucketed_path_high_cardinality(self):
        """distinct_budget=1 forces the bucketed two-pass fallback on
        nearly-all-distinct data; results must be identical."""
        rng = np.random.RandomState(5)
        vals = rng.randint(-10**6, 10**9, 6000)
        assert self._run(vals, 1) == _naive(vals, self.QS)

    def test_paths_agree_with_duplicates_and_skew(self):
        rng = np.random.RandomState(9)
        vals = np.concatenate([
            np.full(3000, 7, dtype=np.int64),  # hot value
            rng.randint(0, 10**7, 3000),
        ])
        want = _naive(vals, self.QS)
        assert self._run(vals, 10**6) == want
        assert self._run(vals, 1) == want


@pytest.mark.usefixtures("ray_session")
class TestGroupedQuantiles:
    def test_matches_per_group_naive(self):
        from doc_parser_ray.pipelines.relational import grouped_quantiles

        rng = np.random.RandomState(7)
        keys = rng.choice(["a", "b", "c"], size=500).tolist()
        vals = rng.randint(0, 40, size=500)  # heavy ties
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(keys, pa.string()),
            "v": pa.array(vals, pa.int64()),
        })).repartition(4)
        out = grouped_quantiles(ds, "k", "v", quantiles=(0.5, 0.9))
        got = {(r["k"], r["pct"]): r["value_c"] for r in out.to_pylist()}
        for g in ("a", "b", "c"):
            gv = vals[np.array(keys) == g]
            for q, pct in ((0.5, 50), (0.9, 90)):
                assert got[(g, pct)] == _naive(gv, [q])[0]

    def test_single_row_groups_and_exact_boundary(self):
        from doc_parser_ray.pipelines.relational import grouped_quantiles

        # n=10 with q=0.5 → rank exactly 5 (100*cum >= 50*10 boundary)
        tab = pa.table({
            "k": pa.array(["x"] * 10 + ["solo"], pa.string()),
            "v": pa.array(list(range(1, 11)) + [42], pa.int64()),
        })
        out = grouped_quantiles(ray.data.from_arrow(tab), "k", "v",
                                quantiles=(0.5,))
        got = {(r["k"], r["pct"]): r["value_c"] for r in out.to_pylist()}
        assert got[("x", 50)] == 5
        assert got[("solo", 50)] == 42
