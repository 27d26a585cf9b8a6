"""Standalone driver-contract checker (same comparison the driver runs):
row-count + column-name + order-insensitive value comparison between each
``queries()`` entry and its ``oracle_sql()`` on the same parquet tables.

Usage: python tests/contract_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, spark_df, oracle_df, float_tol=1e-9):
    a, b = normalize(spark_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # dtype pre-flight: the driver's value hash is dtype-sensitive, so an
        # integer column on one side arriving as float on the other (the DuckDB
        # HUGEINT SUM -> float64 artifact) is a failure even when values match.
        int_a = np.issubdtype(av.dtype, np.integer)
        int_b = np.issubdtype(bv.dtype, np.integer)
        flt_a = np.issubdtype(av.dtype, np.floating)
        flt_b = np.issubdtype(bv.dtype, np.floating)
        if (int_a and flt_b) or (flt_a and int_b):
            return (
                f"DTYPE[{c}] {av.dtype} vs {bv.dtype} (int/float split — CAST "
                f"the oracle SQL to Spark's exact output type)"
            )
        if flt_a or flt_b:
            ok = np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=float_tol, equal_nan=True
            )
            exact = (av.astype(float).to_numpy() == bv.astype(float).to_numpy()).all()
            if not ok:
                i = int(np.argmax(~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=float_tol)))
                return f"VALUES[{c}] row{i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
            if not exact:
                print(f"  note: {name}.{c} matches at {float_tol} but not bit-exact")
        else:
            if np.issubdtype(av.dtype, np.integer) and np.issubdtype(bv.dtype, np.integer):
                if av.dtype != bv.dtype:
                    return f"INT WIDTH[{c}] {av.dtype} vs {bv.dtype} (driver may hash differently)"
            if not (av.to_numpy() == bv.to_numpy()).all():
                i = int(np.argmax(~(av == bv).to_numpy()))
                return f"VALUES[{c}] row{i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from tilegrab_spark import get_spark

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spdf = sdf.toPandas()
        if name in oq:
            odf = con.execute(oq[name]).df()
            err = compare(name, spdf, odf)
            status = err or f"OK ({len(spdf)} rows)"
        else:
            status = f"rows-only ({len(spdf)} rows)"
            err = None if len(spdf) >= 0 else "no rows"
        print(f"{name:24s} {status}")
        if err:
            failures.append((name, err))
    # entry smoke
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"{'entry':24s} {'OK' if n > 0 else 'EMPTY'} ({n} rows)")
    spark.stop()
    if failures:
        print("\nFAILURES:")
        for n, e in failures:
            print(" ", n, e)
        sys.exit(1)
    print("\nALL CONTRACT CHECKS PASS")


if __name__ == "__main__":
    main()
