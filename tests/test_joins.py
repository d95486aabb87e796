"""Join-strategy tests: Arrow-native broadcast join and the two as-of
strategies (broadcast arrays vs repartition-merge) must agree."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from doc_parser_ray.stages.joins import asof_join, broadcast_join
from doc_parser_ray.util import collect_table


def _sorted_rows(tab: pa.Table, keys):
    return tab.sort_by([(k, "ascending") for k in keys]).to_pylist()


@pytest.mark.usefixtures("ray_session")
class TestBroadcastJoin:
    def test_inner_matches_pandas(self):
        big = pa.table({
            "k": pa.array([1, 2, 3, 4, 2, 1], pa.int64()),
            "x": pa.array([10, 20, 30, 40, 21, 11], pa.int64()),
        })
        small = pa.table({
            "sk": pa.array([1, 2, 5], pa.int64()),
            "name": pa.array(["a", "b", "c"]),
        })
        out = collect_table(broadcast_join(
            ray.data.from_arrow(big), small, left_key="k", right_key="sk"
        ))
        want = big.to_pandas().merge(
            small.to_pandas(), left_on="k", right_on="sk"
        )[["k", "x", "name"]]
        got = _sorted_rows(out.select(["k", "x", "name"]), ["k", "x"])
        assert got == want.sort_values(["k", "x"]).to_dict("records")

    def test_left_outer_keeps_unmatched(self):
        big = pa.table({"k": pa.array([1, 9], pa.int64())})
        small = pa.table({"k2": pa.array([1], pa.int64()),
                          "v": pa.array([7], pa.int64())})
        out = collect_table(broadcast_join(
            ray.data.from_arrow(big), small, left_key="k", right_key="k2",
            how="left",
        ))
        rows = _sorted_rows(out.select(["k", "v"]), ["k"])
        assert rows == [{"k": 1, "v": 7}, {"k": 9, "v": None}]

    def test_right_and_outer_refused(self):
        """Per-batch right/full-outer joins would duplicate unmatched
        small-side rows once per batch — the API must refuse them."""
        big = pa.table({"k": pa.array([1], pa.int64())})
        small = pa.table({"k2": pa.array([1], pa.int64())})
        for how in ("right", "outer"):
            with pytest.raises(ValueError, match="broadcast_join"):
                broadcast_join(ray.data.from_arrow(big), small,
                               left_key="k", right_key="k2", how=how)


def _asof_fixture(n_left=500, n_right=200, n_keys=20, seed=7):
    rng = np.random.RandomState(seed)
    left = pa.table({
        "event_id": pa.array(range(n_left), pa.int64()),
        "user_id": pa.array(rng.randint(0, n_keys, n_left), pa.int64()),
        "ts": pa.array(rng.randint(0, 10_000, n_left), pa.int64()),
    })
    right = pa.table({
        "o_custkey": pa.array(rng.randint(0, n_keys + 5, n_right), pa.int64()),
        "o_orderdate": pa.array(rng.randint(0, 10_000, n_right), pa.int64()),
        "o_orderkey": pa.array(rng.permutation(n_right), pa.int64()),
    })
    return left, right


def _asof_expected(left: pa.Table, right: pa.Table):
    """Reference semantics: latest right ≤ ts per key, max-val tie-break."""
    rr = right.to_pylist()
    out = []
    for row in left.to_pylist():
        best = None
        for r in rr:
            if r["o_custkey"] == row["user_id"] and \
                    r["o_orderdate"] <= row["ts"]:
                cand = (r["o_orderdate"], r["o_orderkey"])
                if best is None or cand > best:
                    best = cand
        if best is not None:
            out.append({"event_id": row["event_id"],
                        "o_orderkey": best[1]})
    return sorted(out, key=lambda d: d["event_id"])


@pytest.mark.usefixtures("ray_session")
class TestAsofJoin:
    def _run(self, budget):
        left, right = _asof_fixture()
        out = asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate", right_val="o_orderkey",
            broadcast_budget_rows=budget,
        )
        tab = collect_table(out).select(["event_id", "o_orderkey"])
        return _sorted_rows(tab, ["event_id"])

    def test_broadcast_path_matches_naive(self):
        left, right = _asof_fixture()
        assert self._run(budget=10**9) == _asof_expected(left, right)

    def test_partitioned_path_matches_broadcast(self):
        """budget=0 forces the repartition-merge fallback; results must
        be identical to the broadcast path (and the naive oracle)."""
        left, right = _asof_fixture()
        assert self._run(budget=0) == _asof_expected(left, right)

    def test_ties_break_to_max_val(self):
        left = pa.table({
            "event_id": pa.array([0], pa.int64()),
            "user_id": pa.array([1], pa.int64()),
            "ts": pa.array([100], pa.int64()),
        })
        right = pa.table({
            "o_custkey": pa.array([1, 1, 1], pa.int64()),
            "o_orderdate": pa.array([100, 100, 50], pa.int64()),
            "o_orderkey": pa.array([3, 9, 99], pa.int64()),
        })
        out = asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate", right_val="o_orderkey",
        )
        assert collect_table(out).to_pylist()[0]["o_orderkey"] == 9


@pytest.mark.usefixtures("ray_session")
class TestIntervalJoin:
    def test_multi_match_containment(self):
        from doc_parser_ray.stages.joins import interval_join

        left = pa.table({
            "id": pa.array([0, 1, 2, 3], pa.int64()),
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([5, 15, 25, 5], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([1, 1, 2], pa.int64()),
            "s": pa.array([0, 10, 100], pa.int64()),
            "e": pa.array([20, 30, 200], pa.int64()),
            "v": pa.array([100, 200, 300], pa.int64()),
        })
        out = collect_table(interval_join(
            ray.data.from_arrow(left), right,
            left_key="k", left_ts="ts", right_key="k",
            start_col="s", end_col="e", right_val="v",
        ))
        got = sorted((r["id"], r["v"]) for r in out.to_pylist())
        # ts=5 → [0,20) only; ts=15 → both; ts=25 → [10,30) only;
        # k=2 ts=5 → no interval
        assert got == [(0, 100), (1, 100), (1, 200), (2, 200)]

    def test_boundaries_half_open(self):
        from doc_parser_ray.stages.joins import interval_join

        left = pa.table({
            "k": pa.array([1, 1], pa.int64()),
            "ts": pa.array([0, 10], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([1], pa.int64()),
            "s": pa.array([0], pa.int64()),
            "e": pa.array([10], pa.int64()),
            "v": pa.array([7], pa.int64()),
        })
        out = collect_table(interval_join(
            ray.data.from_arrow(left), right,
            left_key="k", left_ts="ts", right_key="k",
            start_col="s", end_col="e", right_val="v",
        ))
        assert [r["ts"] for r in out.to_pylist()] == [0]  # end exclusive

    def test_matches_bruteforce_on_random_data(self):
        from doc_parser_ray.stages.joins import interval_join

        rng = np.random.RandomState(11)
        n_left, n_right = 400, 120
        left = pa.table({
            "id": pa.array(range(n_left), pa.int64()),
            "k": pa.array(rng.randint(0, 15, n_left), pa.int64()),
            "ts": pa.array(rng.randint(0, 1000, n_left), pa.int64()),
        })
        starts = rng.randint(0, 1000, n_right)
        right = pa.table({
            "k": pa.array(rng.randint(0, 18, n_right), pa.int64()),
            "s": pa.array(starts, pa.int64()),
            "e": pa.array(starts + rng.randint(1, 300, n_right),
                          pa.int64()),
            "v": pa.array(range(n_right), pa.int64()),
        })
        out = collect_table(interval_join(
            ray.data.from_arrow(left), right,
            left_key="k", left_ts="ts", right_key="k",
            start_col="s", end_col="e", right_val="v",
        ))
        got = sorted((r["id"], r["v"]) for r in out.to_pylist())
        want = sorted(
            (lr["id"], rr["v"])
            for lr in left.to_pylist() for rr in right.to_pylist()
            if lr["k"] == rr["k"] and rr["s"] <= lr["ts"] < rr["e"]
        )
        assert got == want

    def test_partitioned_path_matches_broadcast(self):
        """budget=0 forces the repartition-merge fallback (the fact⋈fact
        path); results must equal the broadcast path's on the same
        random data, including a right key of a DIFFERENT Arrow type
        (int32 vs int64) to pin the union-schema cast."""
        from doc_parser_ray.stages.joins import interval_join

        rng = np.random.RandomState(23)
        n_left, n_right = 300, 90
        left = pa.table({
            "id": pa.array(range(n_left), pa.int64()),
            "k": pa.array(rng.randint(0, 12, n_left), pa.int64()),
            "ts": pa.array(rng.randint(0, 800, n_left), pa.int64()),
        })
        starts = rng.randint(0, 800, n_right)
        right = pa.table({
            "k": pa.array(rng.randint(0, 14, n_right), pa.int32()),
            "s": pa.array(starts, pa.int64()),
            "e": pa.array(starts + rng.randint(1, 200, n_right),
                          pa.int64()),
            "v": pa.array(range(n_right), pa.int64()),
        })

        def run(budget):
            out = collect_table(interval_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                left_key="k", left_ts="ts", right_key="k",
                start_col="s", end_col="e", right_val="v",
                broadcast_budget_rows=budget, num_partitions=5,
            ))
            return sorted((r["id"], r["v"]) for r in out.to_pylist())

        want = sorted(
            (lr["id"], rr["v"])
            for lr in left.to_pylist() for rr in right.to_pylist()
            if lr["k"] == rr["k"] and rr["s"] <= lr["ts"] < rr["e"]
        )
        assert run(10**9) == want
        assert run(0) == want


@pytest.mark.usefixtures("ray_session")
class TestAsofJoinKeyTypeCast:
    def test_partitioned_path_with_mismatched_key_types(self):
        """int32 right key vs int64 left key through the repartition-
        merge fallback: the union must not fail on schema mismatch."""
        left = pa.table({
            "event_id": pa.array([0, 1], pa.int64()),
            "user_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([100, 100], pa.int64()),
        })
        right = pa.table({
            "o_custkey": pa.array([1, 2], pa.int32()),
            "o_orderdate": pa.array([50, 60], pa.int64()),
            "o_orderkey": pa.array([11, 22], pa.int64()),
        })
        out = asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate", right_val="o_orderkey",
            broadcast_budget_rows=0,
        )
        rows = _sorted_rows(
            collect_table(out).select(["event_id", "o_orderkey"]),
            ["event_id"])
        assert rows == [{"event_id": 0, "o_orderkey": 11},
                        {"event_id": 1, "o_orderkey": 22}]


@pytest.mark.usefixtures("ray_session")
class TestShuffleHashJoin:
    """Big⋈big hash-co-partitioned join vs a DuckDB oracle, all six
    join semantics, forced across multiple partitions."""

    @staticmethod
    def _fixture(key_type="int", seed=11):
        rng = np.random.RandomState(seed)
        n_l, n_r = 400, 300
        lk = rng.randint(0, 50, n_l)
        rk = rng.randint(25, 75, n_r)  # partial overlap both ways
        if key_type == "str":
            lcol = pa.array([f"k{v:03d}" for v in lk])
            rcol = pa.array([f"k{v:03d}" for v in rk])
        else:
            lcol = pa.array(lk, pa.int64())
            rcol = pa.array(rk, pa.int64())
        left = pa.table({"k": lcol, "x": pa.array(range(n_l), pa.int64())})
        right = pa.table({"rk": rcol, "y": pa.array(range(n_r), pa.int64())})
        return left, right

    _SQL = {
        "inner": "SELECT l.k, l.x, r.y FROM l JOIN r ON l.k = r.rk",
        "left": "SELECT l.k, l.x, r.y FROM l LEFT JOIN r ON l.k = r.rk",
        "right": ("SELECT COALESCE(l.k, r.rk) AS k, l.x, r.y "
                  "FROM l RIGHT JOIN r ON l.k = r.rk"),
        "outer": ("SELECT COALESCE(l.k, r.rk) AS k, l.x, r.y "
                  "FROM l FULL JOIN r ON l.k = r.rk"),
        "semi": ("SELECT k, x FROM l WHERE EXISTS "
                 "(SELECT 1 FROM r WHERE r.rk = l.k)"),
        "anti": ("SELECT k, x FROM l WHERE NOT EXISTS "
                 "(SELECT 1 FROM r WHERE r.rk = l.k)"),
    }

    @pytest.mark.parametrize("key_type", ["int", "str"])
    @pytest.mark.parametrize(
        "how", ["inner", "left", "right", "outer", "semi", "anti"])
    def test_matches_duckdb(self, how, key_type):
        import collections

        import duckdb

        from doc_parser_ray.stages.joins import shuffle_hash_join

        left, right = self._fixture(key_type)
        out = collect_table(shuffle_hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_key="k", right_key="rk", how=how, num_partitions=8,
        ))
        cols = ["k", "x"] if how in ("semi", "anti") else ["k", "x", "y"]
        got = collections.Counter(
            tuple(r[c] for c in cols) for r in out.select(cols).to_pylist())
        con = duckdb.connect()
        con.register("l", left.to_pandas())
        con.register("r", right.to_pandas())
        want_rows = con.execute(self._SQL[how]).fetchall()
        con.close()
        want = collections.Counter(
            tuple(None if v != v else v if not hasattr(v, "item") else
                  int(v) for v in row) if key_type == "int"
            else tuple(row) for row in want_rows)
        # normalize NaN/None from duckdb fetchall (ints come back as
        # None for outer-join misses already)
        assert got == want, f"{how}/{key_type}: {len(got)} vs {len(want)}"

    def test_bad_how_refused(self):
        from doc_parser_ray.stages.joins import shuffle_hash_join

        left, right = self._fixture()
        with pytest.raises(ValueError, match="how="):
            shuffle_hash_join(ray.data.from_arrow(left),
                              ray.data.from_arrow(right),
                              left_key="k", right_key="rk", how="cross")

    def test_name_clash_suffixed(self):
        """A right column sharing a left column's name must survive with
        the _r suffix, matching broadcast_join's convention."""
        from doc_parser_ray.stages.joins import shuffle_hash_join

        left = pa.table({"k": pa.array([1, 2], pa.int64()),
                         "v": pa.array([10, 20], pa.int64())})
        right = pa.table({"k2": pa.array([1], pa.int64()),
                          "v": pa.array([99], pa.int64())})
        out = collect_table(shuffle_hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_key="k", right_key="k2", how="inner", num_partitions=4,
        ))
        assert set(out.column_names) == {"k", "v", "v_r"}
        assert out.to_pylist() == [{"k": 1, "v": 10, "v_r": 99}]
