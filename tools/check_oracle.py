"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() (when present) over an sf dir, compare row count, schema
(column names) and values (sorted columns, exact for ints/strings, bitwise
report for floats with allclose fallback).

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    df = res.to_pandas()
    if len(df) == 0 and len(df.columns) == 0:
        # Ray's Dataset.to_pandas() drops columns when there are ZERO rows
        # even though the dataset schema is known (the engine emits typed
        # empty anchor blocks); rebuild the typed empty frame from schema
        sch = res.schema()
        if sch is not None:
            import pyarrow as pa

            df = pa.schema(
                [(n, t) for n, t in zip(sch.names, sch.types)]
            ).empty_table().to_pandas()
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    sortable = [
        c for c in df.columns
        if not df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()
    ]
    if sortable:
        df = df.sort_values(sortable, kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    import time

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_df(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        q_sec = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, "
                  f"{len(got.columns)} cols) [{q_sec:.1f}s]")
            continue
        want = canon(con.execute(oracles[name]).df())
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {sorted(set(got.columns) ^ set(want.columns))}")
            failures += 1
            continue
        bad = []
        for c in got.columns:
            a, w = got[c], want[c]
            # The driver hashes the raw frame, so an int64-vs-float64 dtype
            # divergence fails its gate even when values match (round-1
            # sessions lesson). Treat kind mismatch as a hard failure.
            if a.dtype.kind != w.dtype.kind and {a.dtype.kind, w.dtype.kind} <= {
                "i", "u", "f"
            }:
                bad.append((c, f"dtype {a.dtype} vs {w.dtype}"))
                continue
            if a.dtype.kind == "f" or w.dtype.kind == "f":
                av = a.to_numpy(dtype=float)
                wv = w.to_numpy(dtype=float)
                exact = np.array_equal(av, wv, equal_nan=True)
                close = np.allclose(av, wv, rtol=1e-9, atol=1e-12, equal_nan=True)
                if not close:
                    bad.append((c, "values"))
                elif not exact:
                    bad.append((c, "bits"))
            else:
                if not a.astype(str).equals(w.astype(str)):
                    bad.append((c, "values"))
        hard = [b for b in bad if b[1] != "bits"]
        soft = [b for b in bad if b[1] == "bits"]
        if hard:
            print(f"FAIL {name}: mismatched {hard[:5]}")
            failures += 1
        elif soft:
            print(f"warn {name}: allclose but not bit-exact: {[c for c,_ in soft][:5]}")
        else:
            print(f"ok   {name}: {len(got)} rows bit-exact [{q_sec:.1f}s]")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
                  sys.argv[2:] or None))
