"""Flagship pipeline: transcript Parquet → per-turn extraction →
conversation assembly → partitioned, checkpointed Parquet.

Stage graph (SURVEY.md §7.2):

    read_parquet(input)                              # S1
      └─ map_batches(extract_batch)  pyarrow tasks   # S2/S3 + P1/P2/P5 + M6
      └─ groupby(conv_id).map_groups(assemble)       # the one keyed shuffle
         (salted variant for skewed conversations)
      └─ write_parquet(out/shard=K/) + lineage marker

The whole graph is lazy/streaming; nothing materializes the full corpus
except the salted-assembly barrier (documented in stages/assemble.py).
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow.dataset as pads

import ray.data

from doc_parser_ray.stages.assemble import (
    assemble_conversations,
    assemble_conversations_salted,
)
from doc_parser_ray.stages.extract import apply_extract
from doc_parser_ray.state.checkpoint import (
    shard_done,
    shard_lineage,
    write_marker,
)

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def extract_transcripts(ds, *, assemble: bool = True,
                        salt_bucket_turns: int | None = None,
                        num_partitions: int = 64):
    """Dataset of transcript rows → Dataset of extracted rows.

    ``num_partitions`` bounds the reduce side of the one keyed shuffle
    (stages/assemble.py); size it ≈ total cores of the cluster.
    """
    out = apply_extract(ds)
    if assemble:
        if salt_bucket_turns:
            out = assemble_conversations_salted(
                out, salt_bucket_turns, num_partitions=num_partitions
            )
        else:
            out = assemble_conversations(out, num_partitions=num_partitions)
    return out


def read_transcripts(paths, columns=None):
    """Column-pruned Parquet read (only the columns the pipeline needs
    leave storage — SURVEY.md 'Prune at the read')."""
    return ray.data.read_parquet(paths, columns=columns or TRANSCRIPT_COLUMNS)


def bucket_transcripts(
    input_paths: list[str] | str,
    bucket_dir: str,
    n_buckets: int = 16,
    resume: bool = True,
) -> list[str]:
    """One-time hash-partitioning of the input by ``conv_id``: the ONE
    partitioning key of the whole pipeline (SURVEY.md §7.2 — "pick ONE
    partitioning key and reuse it"). Every conversation lands wholly in
    one ``bucket=K/`` directory, which makes every downstream shard
    conv-aligned — the precondition for global per-conversation counters
    under shard-at-a-time checkpointing. One full streaming pass, its
    own DONE marker (shard id -1), resumable/idempotent.

    Returns the bucket directories in bucket order.
    """
    import pyarrow as pa

    if isinstance(input_paths, str):
        files = sorted(pads.dataset(input_paths, format="parquet").files)
    else:
        files = sorted(input_paths)
    if not files:
        raise ValueError("no input parquet files found")
    fingerprint = f"n={n_buckets};" + ",".join(files)

    bucket_dirs = [f"{bucket_dir}/bucket={k}" for k in range(n_buckets)]
    if resume and shard_done(bucket_dir, 0, fingerprint):
        return bucket_dirs

    def add_bucket(batch: pa.Table) -> pa.Table:
        from doc_parser_ray.stages.sketch import hash_partition

        return batch.append_column(
            "bucket", hash_partition(batch.column("conv_id"), n_buckets))

    if os.path.isdir(bucket_dir):
        shutil.rmtree(bucket_dir)
    ds = read_transcripts(files)
    ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True) \
        .write_parquet(bucket_dir, partition_cols=["bucket"])
    write_marker(bucket_dir, 0, {"input_fingerprint": fingerprint,
                                 "n_buckets": n_buckets,
                                 "stage": "bucket_by_conv"})
    return bucket_dirs


def run_extraction(
    input_paths: list[str] | str,
    out_dir: str,
    *,
    assemble: bool = True,
    salt_bucket_turns: int | None = None,
    shards: int | None = None,
    resume: bool = True,
    conv_aligned_input: bool = False,
    with_confidence: bool = True,
) -> list[dict]:
    """Checkpointed run: the input is split into conv-aligned shards,
    each shard is one streaming pipeline with its own output partition +
    lineage marker. Re-running skips completed shards
    (resume-from-partition).

    Unless ``conv_aligned_input=True`` (caller guarantees no conversation
    spans an input file), a bucketing pass first hash-partitions the
    input by conv_id so per-conversation ordering/counters are globally
    correct under sharded execution.

    Returns the lineage records of the shards processed this call.
    """
    n_shards = shards or 16
    if assemble and not conv_aligned_input:
        bucket_dirs = bucket_transcripts(
            input_paths, f"{out_dir}/_buckets", n_buckets=n_shards, resume=resume
        )
        shard_inputs: list[list[str]] = [[d] for d in bucket_dirs if os.path.isdir(d)]
    else:
        if isinstance(input_paths, str):
            files = sorted(pads.dataset(input_paths, format="parquet").files)
        else:
            files = sorted(input_paths)
        if not files:
            raise ValueError("no input parquet files found")
        n_shards = min(len(files), n_shards)
        groups: list[list[str]] = [[] for _ in range(n_shards)]
        for i, f in enumerate(files):
            groups[i % n_shards].append(f)
        shard_inputs = [g for g in groups if g]

    records: list[dict] = []
    for k, file_group in enumerate(shard_inputs):
        fingerprint = ",".join(file_group)
        if resume and shard_done(out_dir, k, fingerprint):
            continue
        t0 = time.perf_counter()
        if assemble and salt_bucket_turns:
            # measured fast path: fused read→extract→exchange→rank
            # (stages/fused.py; byte-identical to the Dataset path)
            from doc_parser_ray.stages.fused import fused_extract_assemble

            files: list[str] = []
            for f in file_group:
                if os.path.isdir(f):
                    files.extend(sorted(
                        pads.dataset(f, format="parquet").files))
                else:
                    files.append(f)
            out = fused_extract_assemble(
                files, salt_bucket_turns=salt_bucket_turns,
                columns=TRANSCRIPT_COLUMNS,
            )
        else:
            ds = read_transcripts(file_group)
            out = extract_transcripts(
                ds, assemble=assemble, salt_bucket_turns=salt_bucket_turns
            )
        shard_out = f"{out_dir}/shard={k:05d}"
        # idempotent re-run: a crashed shard may have left partial files
        if os.path.isdir(shard_out):
            shutil.rmtree(shard_out)
        out.write_parquet(shard_out)

        # lineage metrics from a cheap aggregate over the written shard
        written = ray.data.read_parquet(
            shard_out, columns=["status", "n_chars_in", "n_chars_out"]
        )
        agg = written.groupby("status").count().to_pandas()
        status_hist = {
            s: int(c) for s, c in zip(agg["status"], agg["count()"])
        }
        sums = written.sum(["n_chars_in", "n_chars_out"])
        # wall / turns-per-sec cover the EXTRACTION work only — the
        # optional confidence pass below is bookkeeping, not throughput
        wall = time.perf_counter() - t0
        confidence = None
        if with_confidence:
            # ConfidenceReport-style shard rollup (grade histogram +
            # scores over the shard's conversations) for the marker
            from doc_parser_ray.stages.confidence import (
                shard_confidence_summary,
            )

            confidence = shard_confidence_summary(shard_out)
        rows_out = int(sum(status_hist.values()))
        record = shard_lineage(
            shard=k,
            input_fingerprint=fingerprint,
            input_desc=f"{len(file_group)} parquet files",
            rows_in=rows_out,
            rows_out=rows_out,
            status_hist=status_hist,
            chars_in=int(sums["sum(n_chars_in)"]),
            chars_out=int(sums["sum(n_chars_out)"]),
            wall_sec=wall,
            confidence=confidence,
        )
        write_marker(out_dir, k, record)
        records.append(record)
    return records
