"""Stratified sampling + benchmark decontamination with planted truth."""

import numpy as np
import pyarrow as pa

import pytest

import ray.data

from doc_parser_ray.stages.decontam import (
    collect_benchmark_ngrams,
    decontaminate,
)
from doc_parser_ray.stages.sampling import (
    SAMPLE_MOD,
    SAMPLE_MULT,
    epoch_mix,
    stratified_sample,
)
from doc_parser_ray.util import collect_table


class TestStratifiedSample:
    def test_matches_hash_rule_per_stratum(self):
        n = 400
        ids = np.arange(n, dtype=np.int64)
        langs = ["en", "ko", "de", "en"] * (n // 4)
        tab = pa.table({"doc_id": pa.array(ids),
                        "lang": pa.array(langs, pa.string())})
        rates = {"en": 9000, "ko": 1000}
        out = collect_table(stratified_sample(
            ray.data.from_arrow(tab), rates_e4=rates, default_e4=5000,
            stratum_col="lang", id_col="doc_id"))
        got = sorted(out.column("doc_id").to_pylist())
        bucket = (ids * np.int64(SAMPLE_MULT)) % SAMPLE_MOD
        want = sorted(
            int(i) for i, l in zip(ids, langs)
            if bucket[i] < rates.get(l, 5000))
        assert got == want
        # every stratum is actually sampled at a distinct rate
        kept = set(got)
        per = {l: sum(1 for i, ll in zip(ids, langs)
                      if ll == l and int(i) in kept) for l in ("en", "ko", "de")}
        assert per["en"] > per["de"] > per["ko"]

    def test_deterministic_across_runs(self):
        tab = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                        "lang": pa.array(["en"] * 100, pa.string())})
        runs = [sorted(collect_table(stratified_sample(
            ray.data.from_arrow(tab), rates_e4={}, default_e4=3000,
        )).column("doc_id").to_pylist()) for _ in range(2)]
        assert runs[0] == runs[1]


class TestEpochMix:
    def test_matches_hash_rule(self):
        n = 300
        ids = np.arange(n, dtype=np.int64)
        langs = (["hi", "lo", "z"] * n)[:n]
        tab = pa.table({"doc_id": pa.array(ids),
                        "lang": pa.array(langs, pa.string())})
        weights = {"hi": 25000, "lo": 5000, "z": 10000}  # 2.5 / 0.5 / 1.0
        out = collect_table(epoch_mix(
            ray.data.from_arrow(tab), weights_e4=weights,
            default_e4=10000))
        got = sorted(zip(out.column("doc_id").to_pylist(),
                         out.column("copy").to_pylist()))
        bucket = (ids * np.int64(SAMPLE_MULT)) % SAMPLE_MOD
        want = []
        for i, l in zip(ids, langs):
            w = weights[l]
            reps = w // SAMPLE_MOD + (1 if bucket[i] < w % SAMPLE_MOD else 0)
            want += [(int(i), c) for c in range(1, reps + 1)]
        assert got == sorted(want)
        # 2.5-epoch stratum really averages ~2.5 copies per doc
        hi = [c for d, c in got if langs[d] == "hi"]
        n_hi = sum(1 for l in langs if l == "hi")
        assert 2.2 < len(hi) / n_hi < 2.8
        # 0.5-epoch stratum drops roughly half
        n_lo_kept = len({d for d, _ in got if langs[d] == "lo"})
        n_lo = sum(1 for l in langs if l == "lo")
        assert 0.3 < n_lo_kept / n_lo < 0.7

    def test_copies_carry_all_columns(self):
        tab = pa.table({"doc_id": pa.array([7], pa.int64()),
                        "lang": pa.array(["x"], pa.string()),
                        "text": pa.array(["payload"], pa.string())})
        out = collect_table(epoch_mix(
            ray.data.from_arrow(tab), weights_e4={"x": 30000}))
        assert out.num_rows == 3
        assert set(out.column("text").to_pylist()) == {"payload"}
        assert sorted(out.column("copy").to_pylist()) == [1, 2, 3]


class TestDecontaminate:
    BENCH = ["the secret benchmark answer is forty two exactly",
             "short"]
    CORPUS = [
        # 0: contains the planted eval 5-gram "secret benchmark answer is forty"
        "we know the secret benchmark answer is forty two and more text",
        # 1: clean
        "completely unrelated text about rivers and mountains in spring",
        # 2: shorter than n -> no grams -> clean by the standard rule
        "tiny doc",
        # 3: shares words but no full 5-gram
        "the secret answer benchmark is two forty exactly reversed order",
    ]

    def _run(self, keep):
        bench = pa.table({"doc_id": pa.array([100, 101], pa.int64()),
                          "text": pa.array(self.BENCH, pa.string())})
        corpus = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                           "text": pa.array(self.CORPUS, pa.string())})
        ref = collect_benchmark_ngrams(ray.data.from_arrow(bench), n=5)
        out = collect_table(decontaminate(
            ray.data.from_arrow(corpus), ref, n=5, keep=keep))
        return sorted(out.column("doc_id").to_pylist())

    def test_clean_drops_overlapping_doc(self):
        assert self._run("clean") == [1, 2, 3]

    def test_contaminated_arm_flags_it(self):
        assert self._run("contaminated") == [0]

    def test_empty_benchmark_keeps_everything(self):
        corpus = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                           "text": pa.array(self.CORPUS[:3], pa.string())})
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())})
        ref = collect_benchmark_ngrams(ray.data.from_arrow(empty), n=5)
        out = collect_table(decontaminate(
            ray.data.from_arrow(corpus), ref, n=5))
        assert sorted(out.column("doc_id").to_pylist()) == [0, 1, 2]


@pytest.mark.usefixtures("ray_session")
class TestBottomkSample:
    def test_matches_naive_and_is_stable_across_partitioning(self):
        import numpy as np

        from doc_parser_ray.stages.sampling import (
            SAMPLE_MULT, bottomk_sample)

        ids = np.arange(200, dtype=np.int64)
        groups = ["even" if i % 2 == 0 else "odd" for i in ids]
        tab = pa.table({"source": pa.array(groups, pa.string()),
                        "doc_id": pa.array(ids)})

        def naive(k):
            out = {}
            for g in ("even", "odd"):
                rows = [(int((i * SAMPLE_MULT) % 1_000_003), int(i))
                        for i in ids if (("even" if i % 2 == 0 else "odd")
                                         == g)]
                rows.sort()
                out[g] = sorted(i for _, i in rows[:k])
            return out

        for parts in (1, 7):
            ds = ray.data.from_arrow(tab).repartition(parts)
            got = bottomk_sample(ds, group_col="source", id_col="doc_id",
                                 k=5)
            by_g = {}
            for r in got.to_pylist():
                by_g.setdefault(r["source"], []).append(r["doc_id"])
            assert by_g == naive(5), f"parts={parts}"

    def test_group_smaller_than_k_keeps_all(self):
        from doc_parser_ray.stages.sampling import bottomk_sample

        tab = pa.table({"source": pa.array(["a", "a", "b"], pa.string()),
                        "doc_id": pa.array([1, 2, 3], pa.int64())})
        got = bottomk_sample(ray.data.from_arrow(tab), group_col="source",
                             id_col="doc_id", k=10)
        assert got.num_rows == 3
