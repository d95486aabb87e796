"""End-to-end training-corpus pipeline — the 100 TB user story composed
from the engine's stages as ONE streaming Dataset graph:

    read transcripts
      └─ extract            stateless pyarrow tasks (all format backends)
      └─ exact-dedup turns  ONE bounded keyed exchange: rows co-located
                            by content-hash partition, min-(conv,turn)
                            winner kept in-partition — no driver set, no
                            broadcast, no second pass
      └─ quality gate       per-turn M1 parse score ≥ threshold
      └─ chunk              WordPiece actor pool (C1–C4 with real token
                            budgets)
      └─ conv counters      bounded conv-keyed exchange (C5)

Every stage is individually oracle- or unit-verified elsewhere; this
module is the composition exemplar and is itself invariant-tested
(no duplicate extracted text survives, all chunks meet the quality
gate's provenance, counters are consistent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from doc_parser_ray.functions.confidence import turn_parse_score


def dedup_turns_exact(ds, *, num_partitions: int = 64):
    """Drop turns whose normalized extracted text repeats: hash key in
    the map pass, ONE bounded exchange co-locates equal keys, the
    in-partition winner is min (conv_id, turn_idx) — vectorized span
    scan, shuffle carries full rows exactly once (the corpus would be
    re-joined anyway; for key-only shuffles see stages/dedup.py)."""
    from doc_parser_ray.stages.dedup import exact_key_batch

    def add_key(batch: pa.Table) -> pa.Table:
        # fully vectorized 128-bit content key (shared with
        # stages/dedup.py::exact_key_batch — one Arrow normalize pass +
        # two seeded-xxhash passes, fixed-size-binary packed)
        keys, h0 = exact_key_batch(batch.column("extracted_text"))
        pkeys = pa.array((h0 % np.uint64(num_partitions)).astype(np.int32))
        return batch.append_column("dedup_key", keys) \
                    .append_column("pkey", pkeys)

    def keep_winners(part: pa.Table) -> pa.Table:
        part = part.sort_by([
            ("dedup_key", "ascending"), ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
        ])
        n = part.num_rows
        if n == 0:
            return part.drop_columns(["pkey", "dedup_key"])
        # vectorized first-of-span scan over the fixed-width key bytes
        keys = np.frombuffer(
            b"".join(part.column("dedup_key").to_pylist()), dtype="V16")
        first = np.ones(n, dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        return part.filter(pa.array(first)) \
            .drop_columns(["pkey", "dedup_key"])

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    return keyed.groupby("pkey").map_groups(keep_winners,
                                            batch_format="pyarrow")


def near_dedup_turns(ds, *, threshold: float = 0.5,
                     num_partitions: int = 32,
                     max_shingle_df: int | None = 256):
    """Near-duplicate turn removal for the composed corpus: exact
    word-trigram Jaccard pairs over the extracted text (prefix-filtered
    inverted index, ``stages/dedup.py::ngram_jaccard_pairs``) →
    distributed connected components → keep-one-per-cluster anti join.

    Turns are keyed by a synthetic int64 uid (xxhash of conv_id mixed
    with turn_idx) so the CC machinery's integer-node contract holds;
    collision odds are ~n²/2^64. ``max_shingle_df`` keeps the corpus-
    scale stop-shingle cap ON (this is a composition, not the oracle
    path, which runs uncapped)."""
    import pyarrow.compute as pc

    from doc_parser_ray.stages.dedup import near_dedup, ngram_jaccard_pairs

    def add_uid(batch: pa.Table) -> pa.Table:
        from doc_parser_ray.stages.sketch import _hash64

        h = _hash64(batch.column("conv_id"))
        t = batch.column("turn_idx").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        with np.errstate(over="ignore"):
            uid = h ^ ((t + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15))
        return batch.append_column(
            "turn_uid", pa.array(uid.view(np.int64), pa.int64()))

    keyed = ds.map_batches(add_uid, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    pairs = ngram_jaccard_pairs(
        keyed, id_col="turn_uid", text_col="extracted_text", k=3,
        threshold=threshold, max_shingle_df=max_shingle_df,
        num_partitions=num_partitions)
    out = near_dedup(keyed, pairs, id_col="turn_uid",
                     num_partitions=num_partitions)
    return out.drop_columns(["turn_uid"])


def quality_gate(ds, *, min_parse_score: float = 0.5):
    """Filter turns whose M1 parse score falls below the gate (the
    corpus-quality analog of the reference's ConfidenceReport grades)."""
    def gate(batch: pa.Table) -> pa.Table:
        texts = batch.column("extracted_text").to_pylist()
        spans = batch.column("spans").to_pylist()
        scores = np.array([
            turn_parse_score(t or "", s or "") for t, s in zip(texts, spans)
        ])
        keep = ~np.isnan(scores) & (scores >= min_parse_score)
        out = batch.filter(pa.array(keep))
        return out.append_column(
            "parse_score", pa.array(scores[keep], pa.float64())
        )

    return ds.map_batches(gate, batch_format="pyarrow",
                          zero_copy_batch=True)


def build_training_corpus(ds, *, max_tokens: int = 256,
                          min_parse_score: float = 0.5,
                          num_partitions: int = 32,
                          tokenizer_concurrency=(1, 4),
                          near_dedup_threshold: float | None = None):
    """Transcript Dataset → deduplicated, quality-gated, token-bounded
    chunk records with global per-conversation counters.

    ``near_dedup_threshold``: when set, the full near-dedup chain
    (trigram-Jaccard pairs → connected components → keep-one-per-
    cluster) runs after exact dedup — the complete 100 TB composition."""
    from doc_parser_ray.stages.chunk import assemble_chunk_counters
    from doc_parser_ray.stages.extract import apply_extract
    from doc_parser_ray.stages.tokenize import chunk_turns_wordpiece

    extracted = apply_extract(ds)
    extracted = extracted.filter(expr="status == 'ok'")
    deduped = dedup_turns_exact(extracted, num_partitions=num_partitions)
    if near_dedup_threshold is not None:
        deduped = near_dedup_turns(deduped,
                                   threshold=near_dedup_threshold,
                                   num_partitions=num_partitions)
    gated = quality_gate(deduped, min_parse_score=min_parse_score)
    chunks = chunk_turns_wordpiece(gated, max_tokens=max_tokens,
                                   concurrency=tokenizer_concurrency)
    return assemble_chunk_counters(chunks, num_partitions=num_partitions)


def training_corpus(sf_dir: str) -> pa.Table:
    """Driver-contract query: the composed pipeline over synthetic
    transcripts, with the NEAR-dedup chain on (exact dedup → trigram-
    Jaccard CC near-dedup → quality gate → WordPiece chunking → conv
    counters). Rows-only check — each stage is verified on its own;
    composition invariants are unit-tested."""
    from doc_parser_ray.sources.transcripts import transcripts_dataset
    from doc_parser_ray.util import collect_table

    ds = transcripts_dataset(n_convs=80, seed=42, max_turns=40)
    out = build_training_corpus(ds, max_tokens=128,
                                near_dedup_threshold=0.5)
    tab = collect_table(out.select_columns(
        ["conv_id", "turn_idx", "chunk_idx", "chunk_text", "n_tokens",
         "chunk_ord", "n_chunks_of_conv"]
    ))
    return tab.sort_by([("conv_id", "ascending"), ("chunk_ord", "ascending")])


def run_corpus(extracted_dir: str, out_dir: str, *, resume: bool = True,
               max_tokens: int = 512, min_parse_score: float = 0.5,
               num_partitions: int = 32) -> list[dict]:
    """Checkpointed corpus build over ``run_extraction`` output: each
    extraction shard (conv-aligned by construction) becomes one chunk
    shard with its own DONE marker + lineage metrics; re-running skips
    completed shards. Dedup scope is the conv-aligned shard — the
    partition-level contract at 100 TB (one shard = one resumable unit
    of work); corpus-global exact dedup remains available as
    ``dedup_turns_exact`` over the full dataset.

    Returns the lineage records of the shards processed this call.
    """
    import glob
    import os
    import shutil
    import time

    import ray.data

    from doc_parser_ray.stages.chunk import assemble_chunk_counters
    from doc_parser_ray.stages.tokenize import chunk_turns_wordpiece
    from doc_parser_ray.state.checkpoint import (
        shard_done,
        write_marker,
    )

    shard_dirs = sorted(glob.glob(os.path.join(extracted_dir, "shard=*")))
    if not shard_dirs:
        raise ValueError(f"no extraction shards under {extracted_dir}")
    records: list[dict] = []
    for k, shard_dir in enumerate(shard_dirs):
        files = sorted(glob.glob(os.path.join(shard_dir, "*.parquet")))
        fingerprint = ",".join(files)
        if resume and shard_done(out_dir, k, fingerprint):
            continue
        t0 = time.perf_counter()
        ds = ray.data.read_parquet(
            files, columns=["conv_id", "turn_idx", "extracted_text",
                            "spans", "status"]
        )
        n_in = ds.count()
        ds = ds.filter(expr="status == 'ok'")
        deduped = dedup_turns_exact(ds, num_partitions=num_partitions)
        gated = quality_gate(deduped, min_parse_score=min_parse_score)
        chunks = assemble_chunk_counters(
            chunk_turns_wordpiece(gated, max_tokens=max_tokens),
            num_partitions=num_partitions,
        )
        shard_out = os.path.join(out_dir, f"shard={k:05d}")
        if os.path.isdir(shard_out):
            shutil.rmtree(shard_out)
        chunks.write_parquet(shard_out)
        # one aggregate pass over the written shard (rows + token sum)
        written = ray.data.read_parquet(shard_out, columns=["n_tokens"])

        def _agg(b: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return pa.table({
                "rows": [b.num_rows],
                "tok": [_pc.sum(b.column("n_tokens")).as_py() or 0],
            })

        parts = written.map_batches(_agg, batch_format="pyarrow",
                                    zero_copy_batch=True).to_pandas()
        n_chunks = int(parts["rows"].sum())
        tok = int(parts["tok"].sum())
        wall = time.perf_counter() - t0
        record = {
            "shard": k,
            "stage": "training_corpus",
            "input_fingerprint": fingerprint,
            "rows_in": int(n_in),
            "chunks_out": int(n_chunks),
            "sum_tokens": int(tok or 0),
            "max_tokens": max_tokens,
            "min_parse_score": min_parse_score,
            "wall_sec": wall,
            "completed_at_unix": time.time(),
        }
        write_marker(out_dir, k, record)
        records.append(record)
    return records
