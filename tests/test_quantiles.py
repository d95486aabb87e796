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
