"""Round-4 additions: vectorized shingle/gram hashing parity, the
SQL-twinnable gram fingerprint, multiplicative-hash wraparound contract,
MisraGries pre-aggregated input validation, shuffle-join key-kind guard,
distributed knn top-k reduce under forced many-block input, Arrow-native
embedding matrix ingestion, and the near-dedup training-corpus flag."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data


# ------------------------------------------------- gram fingerprint

_P = 2147483647


def _ref_word_hash(w: str) -> int:
    h = 0
    for b in w.encode("utf-8"):
        h = (h * 257 + b) % _P
    return h


def _ref_fp(text: str, k: int = 5) -> int:
    ws = text.split(" ")
    hs = [_ref_word_hash(w) for w in ws]
    ke = min(k, len(hs))
    best = None
    for i in range(len(hs) - ke + 1):
        g = hs[i]
        for j in range(1, ke):
            g = (g * 1000003 + hs[i + j]) % _P
        best = g if best is None or g < best else best
    return best if best is not None else 0


class TestGramFingerprint:
    TEXTS = ["hello world a b c d e f", "x", "", "a a a a a a",
             "one two three four", "word " * 40 + "tail",
             "q w e r t y u i o p"]

    def test_matches_scalar_reference(self):
        from doc_parser_ray.functions.textstats import gram_fingerprint_batch

        got = gram_fingerprint_batch(pa.array(self.TEXTS))
        want = [_ref_fp(t) for t in self.TEXTS]
        assert list(got) == want

    def test_matches_duckdb_expression(self):
        import duckdb

        from doc_parser_ray.functions.textstats import gram_fingerprint_batch

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, '{t}')" for i, t in enumerate(self.TEXTS))
            + ") t(doc_id, text)"
        )
        sql = r"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM d),
        vocab AS (SELECT DISTINCT unnest(ws) AS word FROM w),
        wh AS (SELECT word,
                 CASE WHEN length(word) = 0 THEN CAST(0 AS BIGINT)
                      ELSE list_reduce(list_transform(
                             range(1, length(word) + 1),
                             i -> CAST(ascii(substr(word, CAST(i AS INTEGER), 1)) AS BIGINT)),
                           (a, b) -> (a * 257 + b) % 2147483647) END AS h
               FROM vocab),
        toks AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS i FROM w),
        tw AS (SELECT t.doc_id, t.i, wh.h
               FROM toks t JOIN w USING (doc_id) JOIN wh ON wh.word = w.ws[t.i]),
        hs AS (SELECT doc_id, list(h ORDER BY i) AS hl FROM tw GROUP BY doc_id)
        SELECT doc_id,
            CASE WHEN len(hl) <= 5
                 THEN list_reduce(hl, (a, b) -> (a * 1000003 + b) % 2147483647)
                 ELSE list_min(list_transform(range(1, len(hl) - 3),
                      i -> (((((((hl[i] * 1000003 + hl[i+1]) % 2147483647)
                           * 1000003 + hl[i+2]) % 2147483647)
                           * 1000003 + hl[i+3]) % 2147483647)
                           * 1000003 + hl[i+4]) % 2147483647)) END AS fp
        FROM hs ORDER BY doc_id
        """
        want = [r[1] for r in con.execute(sql).fetchall()]
        got = list(gram_fingerprint_batch(pa.array(self.TEXTS)))
        assert got == want


# ------------------------------------------ vectorized shingle hashing


class TestShingleHashesBatch:
    def test_distinct_counts_and_jaccard_match_scalar(self):
        from doc_parser_ray.stages.dedup import (
            _shingle_hashes_batch,
            _shingles,
            ngram_jaccard,
        )

        texts = [
            "The quick brown fox jumps over the lazy dog",
            "the QUICK  brown fox jumps over the lazy dog",  # ws/case
            "tiny doc",              # < k words -> single whole gram
            "",                      # empty -> nothing
            "   ",                   # whitespace-only -> nothing
            "one two three one two three one two three",  # repeats
        ]
        doc_idx, gh, counts = _shingle_hashes_batch(pa.array(texts), 3)
        # per-doc distinct sizes equal the scalar set sizes
        for d, t in enumerate(texts):
            assert counts[d] == len(_shingles(t, 3)), t
        # hashes sorted + distinct within each doc
        for d in range(len(texts)):
            seg = gh[doc_idx == d]
            assert (np.diff(seg.astype(np.uint64)) > 0).all() if len(seg) > 1 else True
        # pairwise jaccard computed from the vectorized hashes equals
        # the scalar ngram_jaccard for every pair
        segs = [set(gh[doc_idx == d].tolist()) for d in range(len(texts))]
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                sa, sb = segs[a], segs[b]
                if not sa and not sb:
                    j = 1.0
                elif not sa or not sb:
                    j = 0.0
                else:
                    j = len(sa & sb) / len(sa | sb)
                assert j == pytest.approx(ngram_jaccard(texts[a], texts[b], 3))

    def test_short_docs_none_mode(self):
        from doc_parser_ray.stages.dedup import _shingle_hashes_batch

        texts = ["a b", "a b c d", ""]
        _, _, counts = _shingle_hashes_batch(pa.array(texts), 3,
                                             short_docs="none")
        assert counts.tolist() == [0, 2, 0]


# ------------------------------------------------ sampling wraparound


class TestMultHashWraparound:
    def test_uint64_wrap_matches_hugeint_emulation(self):
        import duckdb

        from doc_parser_ray.stages.sampling import _mult_hash

        ids = np.array([0, 1, 12345, 2**41, 2**55 + 17, 2**62 + 3,
                        2**63 - 1], dtype=np.int64)
        got = _mult_hash(ids, 2246822519, 10_000)
        con = duckdb.connect()
        want = [
            con.execute(
                f"SELECT CAST(((CAST({int(i)} AS HUGEINT) * 2246822519) "
                "% 18446744073709551616) % 10000 AS BIGINT)"
            ).fetchone()[0]
            for i in ids
        ]
        assert got.tolist() == want


# ----------------------------------------------------- MisraGries API


class TestMisraGriesCounts:
    def test_preaggregated_counts_are_used_verbatim(self):
        from doc_parser_ray.stages.sketch import MisraGries

        mg = MisraGries(capacity=8)
        mg.add_batch(np.array(["b", "a"]), counts=np.array([5, 2]))
        assert mg.counts == {"b": 5, "a": 2}

    def test_mismatched_lengths_raise(self):
        from doc_parser_ray.stages.sketch import MisraGries

        mg = MisraGries(capacity=8)
        with pytest.raises(ValueError):
            mg.add_batch(np.array(["a", "b"]), counts=np.array([1]))

    def test_duplicate_values_with_counts_raise(self):
        from doc_parser_ray.stages.sketch import MisraGries

        mg = MisraGries(capacity=8)
        with pytest.raises(ValueError):
            mg.add_batch(np.array(["a", "a"]), counts=np.array([1, 2]))


# ------------------------------------------------ join key-kind guard


@pytest.mark.usefixtures("ray_session")
class TestJoinKeyKindGuard:
    def test_int_vs_string_keys_refused(self):
        from doc_parser_ray.stages.joins import shuffle_hash_join

        left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2, 3])}))
        right = ray.data.from_arrow(
            pa.table({"k": pa.array(["1", "2"]), "v": pa.array([10, 20])}))
        with pytest.raises(TypeError, match="key kinds differ"):
            shuffle_hash_join(left, right, left_key="k", right_key="k")

    def test_int32_vs_int64_ok(self):
        from doc_parser_ray.stages.joins import shuffle_hash_join
        from doc_parser_ray.util import collect_table

        left = ray.data.from_arrow(
            pa.table({"k": pa.array([1, 2, 3], pa.int32())}))
        right = ray.data.from_arrow(
            pa.table({"k": pa.array([2, 3], pa.int64()),
                      "v": pa.array([20, 30])}))
        out = collect_table(
            shuffle_hash_join(left, right, left_key="k", right_key="k"))
        assert sorted(out.column("v").to_pylist()) == [20, 30]


# ----------------------------------------- knn distributed top-k reduce


@pytest.mark.usefixtures("ray_session")
class TestKnnManyBlocks:
    def test_topk_independent_of_block_count(self):
        from doc_parser_ray.stages.similarity import knn_cosine

        rng = np.random.RandomState(7)
        n, d = 400, 16
        X = rng.randn(n, d).astype(np.float32)
        tab = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.reshape(-1), pa.float32()), d),
        })
        qids = [0, 1, 2]
        qvecs = X[:3].tolist()
        one = knn_cosine(ray.data.from_arrow(tab), qids, qvecs, k=5)
        # force the DISTRIBUTED per-query reduce on a many-block input
        many = knn_cosine(
            ray.data.from_arrow(tab).repartition(37), qids, qvecs, k=5,
            driver_merge_rows=0)
        # block size changes BLAS summation order → last-ulp cosine
        # wiggle; ids/ranks must be exactly stable
        key = ["query_id", "vec_id", "rank"]
        assert one.select(key).to_pylist() == many.select(key).to_pylist()
        np.testing.assert_allclose(
            np.array(one.column("cosine")), np.array(many.column("cosine")),
            rtol=1e-9)
        assert one.num_rows == 15  # nq × k reaches the driver, no more


# --------------------------------------------- Arrow matrix ingestion


class TestEmbeddingMatrix:
    def test_matrix_matches_pylist_path(self):
        from doc_parser_ray.stages.similarity import _matrix

        rng = np.random.RandomState(3)
        X = rng.randn(10, 8).astype(np.float32)
        var = pa.array(X.tolist(), pa.list_(pa.float32()))
        fixed = pa.FixedSizeListArray.from_arrays(
            pa.array(X.reshape(-1), pa.float32()), 8)
        for col in (var, fixed, pa.chunked_array([var])):
            m = _matrix(col, np.float64)
            assert m.dtype == np.float64
            np.testing.assert_array_equal(
                m, np.asarray(col.to_pylist() if not isinstance(col, pa.ChunkedArray)
                              else col.combine_chunks().to_pylist(),
                              dtype=np.float64))

    def test_ragged_raises(self):
        from doc_parser_ray.stages.similarity import _matrix

        col = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))
        with pytest.raises(ValueError, match="ragged"):
            _matrix(col)


# ------------------------------------------ near-dedup corpus flag


@pytest.mark.usefixtures("ray_session")
class TestCorpusNearDedup:
    def test_near_dedup_turns_drops_near_duplicates(self):
        from doc_parser_ray.pipelines.corpus import near_dedup_turns
        from doc_parser_ray.util import collect_table

        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lam mu nu xi omicron pi rho sigma tau upsilon")
        near = base.replace("tau", "tau2")  # high trigram overlap
        far = "completely different words with no shared trigrams at all ok"
        tab = pa.table({
            "conv_id": pa.array(["c1", "c2", "c3"]),
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "extracted_text": pa.array([base, near, far]),
        })
        out = collect_table(near_dedup_turns(
            ray.data.from_arrow(tab), threshold=0.5))
        texts = set(out.column("extracted_text").to_pylist())
        assert far in texts
        # exactly one of the near-dup pair survives
        assert len({base, near} & texts) == 1
        assert "turn_uid" not in out.column_names

    def test_build_training_corpus_flag_keeps_invariants(self):
        from doc_parser_ray.pipelines.corpus import build_training_corpus
        from doc_parser_ray.sources.transcripts import transcripts_dataset
        from doc_parser_ray.util import collect_table

        ds = transcripts_dataset(n_convs=12, seed=42, max_turns=10)
        out = collect_table(build_training_corpus(
            ds, max_tokens=64, near_dedup_threshold=0.5))
        assert out.num_rows > 0
        # counters remain consistent per conversation
        import collections

        per_conv = collections.Counter(out.column("conv_id").to_pylist())
        for conv, n in per_conv.items():
            rows = out.filter(
                pa.compute.equal(out.column("conv_id"), conv))
            assert set(rows.column("chunk_ord").to_pylist()) == set(range(n))
            assert set(rows.column("n_chunks_of_conv").to_pylist()) == {n}


# ----------------------------------------- chunk_suite composition


@pytest.mark.usefixtures("ray_session")
class TestChunkSuiteComposite:
    def test_matches_standalone_variant_functions(self):
        from doc_parser_ray.pipelines import trainingdata as T

        sf = "/root/testdata/sf0.001"
        suite = T.chunk_suite(sf)
        rows = {}
        for r in suite.to_pylist():
            rows.setdefault(r["variant"], set()).add(
                (r["conv_id"], r["chunk_ord"], r["n_chars"],
                 r["n_chunks_of_conv"]))
        import pyarrow.compute as pc_

        for name, fn in (("hybrid", T.chunk_transcripts),
                         ("legacy", T.chunk_transcripts_legacy),
                         ("bpe", T.chunk_transcripts_bpe)):
            tab = fn(sf)
            want = set(zip(
                tab.column("conv_id").to_pylist(),
                [int(x) for x in tab.column("chunk_ord").to_pylist()],
                [int(x) for x in
                 pc_.utf8_length(tab.column("chunk_text")).to_pylist()],
                [int(x) for x in
                 tab.column("n_chunks_of_conv").to_pylist()]))
            assert rows[name] == want, name


# -------------------------------------- fused sketch-pair composite


@pytest.mark.usefixtures("ray_session")
class TestSketchPairsComposite:
    def test_matches_standalone_operators(self):
        from doc_parser_ray.pipelines import trainingdata as T

        sf = "/root/testdata/sf0.001"
        suite = T.dedup_sketch_pairs(sf)
        got = {}
        for r in suite.to_pylist():
            got.setdefault(r["method"], {})[
                (r["left_id"], r["right_id"])] = r["score"]
        mh = T.dedup_minhash(sf)
        want_mh = {(l, r): int(np.floor(j * 10000.0 + 0.5))
                   for l, r, j in zip(mh.column("left_id").to_pylist(),
                                      mh.column("right_id").to_pylist(),
                                      mh.column("est_jaccard").to_pylist())}
        sh = T.dedup_simhash(sf)
        want_sh = {(l, r): h
                   for l, r, h in zip(sh.column("left_id").to_pylist(),
                                      sh.column("right_id").to_pylist(),
                                      sh.column("hamming").to_pylist())}
        # pair sets match exactly; minhash scores may differ ±1 in the
        # 4th decimal (standalone rounds est to 4dp before the e4 floor)
        assert set(got.get("minhash", {})) == set(want_mh)
        for k, v in got.get("minhash", {}).items():
            assert abs(v - want_mh[k]) <= 1
        assert got.get("simhash", {}) == want_sh


# ------------------------------------- ngram verify broadcast path


@pytest.mark.usefixtures("ray_session")
class TestNgramVerifyPaths:
    def test_broadcast_and_exchange_paths_agree(self):
        from doc_parser_ray.stages.dedup import ngram_jaccard_pairs
        from doc_parser_ray.util import collect_table

        base = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu xi omicron pi rho sigma tau upsilon")
        texts = [base, base.replace("tau", "tau2"),
                 base.replace("alpha beta", "a b"),
                 "totally different content with no overlap whatsoever x",
                 base]
        tab = pa.table({"doc_id": pa.array(range(len(texts)),
                                           type=pa.int64()),
                        "text": pa.array(texts)})

        def run(**kw):
            out = collect_table(ngram_jaccard_pairs(
                ray.data.from_arrow(tab), k=3, threshold=0.3, **kw))
            return sorted(
                (l, r, round(j, 9)) for l, r, j in zip(
                    out.column("left_id").to_pylist(),
                    out.column("right_id").to_pylist(),
                    out.column("jaccard").to_pylist()))

        broadcast = run()                       # default: sigs broadcast
        exchange = run(broadcast_sigs_rows=0)   # forced 2-round exchange
        assert broadcast == exchange
        assert any(l == 0 and r == 4 for l, r, _ in broadcast)  # dup pair


# -------------------------------------------------- sequence packing


@pytest.mark.usefixtures("ray_session")
class TestPackSequences:
    def test_layout_matches_manual_prefix_sums(self):
        from doc_parser_ray.stages.packing import pack_sequences
        from doc_parser_ray.util import collect_table

        tab = pa.table({
            "source": pa.array(["a", "a", "a", "b", "b", "a"]),
            "doc_id": pa.array([1, 2, 3, 1, 2, 4], pa.int64()),
            "n_tokens": pa.array([5, 0, 12, 9, 10, 3], pa.int64()),
        })
        out = collect_table(pack_sequences(
            ray.data.from_arrow(tab), budget_tokens=8,
            group_col="source", id_col="doc_id", tokens_col="n_tokens"))
        rows = {(r["source"], r["doc_id"]):
                (r["seq_idx"], r["seq_offset"], r["n_seqs"])
                for r in out.to_pylist()}
        # source a, id order 1,2,3,4: exclusive cums 0,5,5,17
        assert rows[("a", 1)] == (0, 0, 1)
        assert rows[("a", 2)] == (0, 5, 1)   # zero-token doc spans 1
        assert rows[("a", 3)] == (0, 5, 3)   # 12 tokens from offset 5
        assert rows[("a", 4)] == (2, 1, 1)
        assert rows[("b", 1)] == (0, 0, 2)   # 9 tokens cross one cut
        assert rows[("b", 2)] == (1, 1, 2)

    def test_block_order_invariance(self):
        from doc_parser_ray.stages.packing import pack_sequences
        from doc_parser_ray.util import collect_table

        rng = np.random.RandomState(5)
        n = 400
        tab = pa.table({
            "source": pa.array([f"s{i % 7}" for i in range(n)]),
            "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
            "n_tokens": pa.array(rng.randint(0, 50, n).astype(np.int64)),
        })
        a = collect_table(pack_sequences(
            ray.data.from_arrow(tab), budget_tokens=32)).sort_by(
            [("source", "ascending"), ("doc_id", "ascending")])
        b = collect_table(pack_sequences(
            ray.data.from_arrow(tab).random_shuffle(seed=3).repartition(11),
            budget_tokens=32)).sort_by(
            [("source", "ascending"), ("doc_id", "ascending")])
        assert a.to_pylist() == b.to_pylist()


# ----------------------------------------- size-adaptive components


@pytest.mark.usefixtures("ray_session")
class TestComponentsAdaptive:
    def _labels(self, pairs_tab, **kw):
        from doc_parser_ray.stages.dedup import connected_components
        from doc_parser_ray.util import collect_table

        out = collect_table(connected_components(
            ray.data.from_arrow(pairs_tab), **kw))
        return sorted(zip(out.column("node").to_pylist(),
                          out.column("component").to_pylist()))

    def test_local_fast_path_matches_distributed_rounds(self):
        rng = np.random.RandomState(11)
        left = rng.randint(0, 300, size=500).astype(np.int64)
        right = rng.randint(0, 300, size=500).astype(np.int64)
        tab = pa.table({"left_id": pa.array(left),
                        "right_id": pa.array(right)})
        local = self._labels(tab)  # default threshold → one-task path
        dist = self._labels(tab, local_threshold=0)  # forced star rounds
        assert local == dist
        # sanity: labels are cluster minima
        comp_of = dict(local)
        for l, r in zip(left, right):
            if l != r:
                assert comp_of[l] == comp_of[r]
                assert comp_of[l] <= min(l, r)

    def test_self_loops_are_singletons_in_both_paths(self):
        tab = pa.table({"left_id": pa.array([5, 1], type=pa.int64()),
                        "right_id": pa.array([5, 2], type=pa.int64())})
        assert self._labels(tab) == [(1, 1), (2, 1)]
        assert self._labels(tab, local_threshold=0) == [(1, 1), (2, 1)]


# --------------------------------------------- real-tokenizer seam test


class TestTokenizerSeam:
    def test_hf_tokenizer_contract_if_available(self):
        """C2 stand-in seam: when a real HF tokenizer is importable the
        actor-pool counting stage must accept it unchanged (the swap is
        a constructor argument, not a code path). Skipped in this
        container (no weights/network)."""
        try:
            from transformers import AutoTokenizer  # noqa: F401
        except ImportError:
            pytest.skip("transformers not installed in this environment")
        tok = AutoTokenizer.from_pretrained(
            "sentence-transformers/all-MiniLM-L6-v2")
        from doc_parser_ray.functions.wordpiece import DeterministicWordPiece

        ours = DeterministicWordPiece()
        text = "hello tokenization world"
        assert isinstance(ours.count(text), int)
        assert isinstance(len(tok.tokenize(text)), int)
