"""Driver-compare emulation: run each queries() entry and its oracle_sql
side-by-side on an sf dir; compare row count, column names, and
order-insensitive value hash (columns sorted by name, rows sorted).

Usable standalone:  python tests/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canonical(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)]
    # normalize cell text; NaN→''
    rows = df.astype(str).values.tolist()
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return len(df), sorted(df.columns), h.hexdigest()[:16]


def run(sf_dir: str, only: set[str] | None = None) -> bool:
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    ok = True
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: ray raised {type(e).__name__}: {e}")
            ok = False
            continue
        if name not in sqls:
            print(f"[rows] {name}: {len(res)} rows (no oracle)")
            continue
        want = con.execute(sqls[name]).df()
        n1, c1, h1 = canonical(res)
        n2, c2, h2 = canonical(want)
        status = "OK  " if (n1, c1, h1) == (n2, c2, h2) else "FAIL"
        if status == "FAIL":
            ok = False
        print(f"[{status}] {name}: ray=({n1},{h1}) oracle=({n2},{h2})")
        if c1 != c2:
            print(f"        cols ray={c1} oracle={c2}")
        elif h1 != h2 and n1 == n2:
            merged = res[sorted(res.columns)].astype(str)
            wanted = want[sorted(want.columns)].astype(str)
            a = set(map(tuple, merged.values.tolist()))
            b = set(map(tuple, wanted.values.tolist()))
            diff_a = list(a - b)[:3]
            diff_b = list(b - a)[:3]
            print(f"        ray-only={diff_a}")
            print(f"        oracle-only={diff_b}")
    return ok


if __name__ == "__main__":
    import ray

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    good = run(sf, only)
    ray.shutdown()
    sys.exit(0 if good else 1)
