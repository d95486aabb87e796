"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray


def collect_table(ds) -> pa.Table:
    """Materialize a (driver-small!) Dataset to one pyarrow Table.

    Filters empty blocks (their schema can be empty and break
    concat_tables). Only for results that are known to be small —
    aggregates, top-k, dedup winners — never the full corpus.
    """
    tables = [ray.get(r) for r in ds.to_arrow_refs()]
    non_empty = [t for t in tables if t.num_rows > 0]
    if not non_empty:
        return tables[0] if tables else pa.table({})
    return pa.concat_tables(non_empty, promote_options="default")


def cents(col: pa.ChunkedArray | pa.Array, scale: int = 100) -> pa.Array:
    """Per-row fixed-point discretization: floor(x*scale + 0.5) as int64.

    Per-row arithmetic is bit-identical between engines (same IEEE ops on
    the same inputs) — only aggregation order differs — so discretizing
    BEFORE the aggregate makes sums exactly comparable against a SQL
    oracle using FLOOR(x*scale + 0.5). (Plain ROUND differs between
    engines: half-even vs half-away, and 1-ulp result differences.)
    """
    return pc.cast(
        pc.floor(pc.add(pc.multiply(pc.cast(col, pa.float64()), float(scale)), 0.5)),
        pa.int64(),
    )
