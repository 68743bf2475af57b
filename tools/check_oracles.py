"""Local driver-mimic: run every __ray_entry__ query AND its DuckDB oracle
side by side, compare row count + schema + order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        df.astype(str).apply(lambda r: "\x01".join(r.values), axis=1).tolist()
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=16,
            include_dashboard=False,
            logging_level="ERROR",
        )
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"[FAIL] {name}: ray error: {ex!r}")
            failures += 1
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(mine)} rows")
            continue
        try:
            oracle = con.execute(sql).df()
        except Exception as ex:
            print(f"[FAIL] {name}: oracle SQL error: {ex!r}")
            failures += 1
            continue
        problems = []
        if len(mine) != len(oracle):
            problems.append(f"rows {len(mine)} != {len(oracle)}")
        if sorted(mine.columns) != sorted(oracle.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(oracle.columns)}")
        else:
            h1, h2 = value_hash(mine), value_hash(oracle)
            if h1 != h2:
                problems.append("value-hash mismatch")
                m = mine[sorted(mine.columns)].astype(str)
                o = oracle[sorted(oracle.columns)].astype(str)
                mk = set(map(tuple, m.values.tolist()))
                ok = set(map(tuple, o.values.tolist()))
                extra = list(mk - ok)[:3]
                miss = list(ok - mk)[:3]
                if extra:
                    problems.append(f"engine-only: {extra}")
                if miss:
                    problems.append(f"oracle-only: {miss}")
        if problems:
            failures += 1
            print(f"[FAIL] {name}: " + " | ".join(problems))
        else:
            print(f"[ OK ] {name}: {len(mine)} rows")
    return failures


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(1 if rc else 0)
