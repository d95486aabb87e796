"""Checkpointed, resumable partitioned output with per-partition lineage.

The reference has no checkpointing (stateless HTTP service — re-POST the
file on failure); at 10^12-turn scale the north rule requires
resume-from-partition. Design (SURVEY.md §7, "Resumable output"):

  - the input is split into SHARDS (hash ranges of conv_id, or explicit
    file lists); each shard runs as its own streaming Ray pipeline and
    writes ``{out_dir}/shard={k:05d}/`` Parquet;
  - a shard directory is only trusted once its DONE marker
    ``{out_dir}/_manifest/shard-{k:05d}.json`` exists; the marker carries
    the lineage record: input description, row counts, status histogram,
    wall time, turns/sec, boilerplate-removal ratio, engine version
    (the metrics the north rule lists);
  - resume = skip shards whose marker exists (and whose input fingerprint
    matches); a crashed shard leaves no marker and is re-run idempotently
    (output dir is rewritten).

Markers are written atomically (tmp file + rename).
"""

from __future__ import annotations

import json
import os
import time

from doc_parser_ray import __version__


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def marker_path(out_dir: str, shard: int) -> str:
    return os.path.join(_manifest_dir(out_dir), f"shard-{shard:05d}.json")


def shard_done(out_dir: str, shard: int, input_fingerprint: str | None = None) -> bool:
    path = marker_path(out_dir, shard)
    if not os.path.exists(path):
        return False
    if input_fingerprint is None:
        return True
    try:
        with open(path) as f:
            rec = json.load(f)
        return rec.get("input_fingerprint") == input_fingerprint
    except (OSError, json.JSONDecodeError):
        return False


def write_marker(out_dir: str, shard: int, record: dict) -> None:
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    path = marker_path(out_dir, shard)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def shard_lineage(
    *,
    shard: int,
    input_fingerprint: str,
    input_desc: str,
    rows_in: int,
    rows_out: int,
    status_hist: dict[str, int],
    chars_in: int,
    chars_out: int,
    wall_sec: float,
    confidence: dict | None = None,
) -> dict:
    """Build the per-partition lineage + metrics record (north rule:
    turns/sec, boilerplate-removal ratio, parse-failure counts;
    ``confidence`` = the shard's ConfidenceReport-style rollup —
    grade histogram + nan-mean scores over its conversations)."""
    return {
        **({"confidence": confidence} if confidence else {}),
        "shard": shard,
        "engine_version": __version__,
        "input_fingerprint": input_fingerprint,
        "input": input_desc,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "status_hist": status_hist,
        "chars_in": chars_in,
        "chars_out": chars_out,
        "boilerplate_removal_ratio": (chars_out / chars_in) if chars_in else None,
        "parse_failures": status_hist.get("parse_error", 0),
        "wall_sec": wall_sec,
        "turns_per_sec": (rows_in / wall_sec) if wall_sec > 0 else None,
        "completed_at_unix": time.time(),
    }


def load_manifest(out_dir: str) -> list[dict]:
    """All completed-shard lineage records, shard-ordered."""
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return []
    records = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("shard-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                records.append(json.load(f))
    return records
