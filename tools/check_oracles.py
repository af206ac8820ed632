"""Local replica of the driver's correctness gate: run every queries()[k]
against oracle_sql()[k] via DuckDB on the same sf dir; compare row count,
schema width, and order-insensitive values (exact, incl. floats — mirrors a
value-hash).

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [only...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Deliberately NO int/float coercion: the driver's value-hash is
    # dtype-sensitive (DuckDB SUM(BIGINT)->HUGEINT->float64 vs Ray int64 was
    # masked here in r1 and failed the driver gate — VERDICT r1 "What's
    # wrong" #2). Only timestamps are normalized to us resolution.
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows, {len(got.columns)} cols  [{dt:.1f}s]")
            n_pass += 1
            continue
        try:
            want = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            problems.append(f"cols {list(got.columns)} != {list(want.columns)}")
        if not problems:
            for c in got.columns:
                # FULL dtype equality (not just kind): an int32-vs-int64 or
                # float32-vs-float64 skew still breaks the driver's
                # dtype-sensitive value hash. canon() timestamp
                # normalization remains the only allowed coercion.
                if got[c].dtype != want[c].dtype:
                    problems.append(
                        f"col {c}: dtype mismatch {got[c].dtype} vs {want[c].dtype}"
                        " (driver value-hash would fail)"
                    )
                    continue
                a, b = got[c].to_numpy(), want[c].to_numpy()
                if pd.api.types.is_float_dtype(got[c]):
                    eq = np.array_equal(a, b, equal_nan=True)
                else:
                    eq = (pd.Series(a) == pd.Series(b)).all() if len(a) else True
                if not eq:
                    nbad = int((pd.Series(a) != pd.Series(b)).sum())
                    problems.append(f"col {c}: {nbad} mismatches (e.g. {a[:3]} vs {b[:3]})")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows  [{dt:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
