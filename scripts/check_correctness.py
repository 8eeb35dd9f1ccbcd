"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given sf dir; compares row count, column names, and
order-insensitive values. Reports exact-match status plus max float
divergence so rounding hazards are visible before the driver runs.

Usage: python scripts/check_correctness.py [--driver] [sf_dir] [query ...]

``--driver`` emulates the external driver's environment instead of
ours: a bare SparkSession (no engine confs — in particular Arrow
OFF, its out-of-the-box default), row sorting over raw cell objects
(array cells are unsortable there, exactly as in the driver), and a
bitwise float compare (so ``-0.0`` vs ``0.0`` mismatches, as a
byte-level value-hash would). Round-3 lesson: six queries green in
the default mode failed under the driver for exactly these
environment deltas.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from matrixinversion_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


STRICT = False  # --driver mode: emulate the external gate's canon


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints may come back as int32/int64 across engines
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif not STRICT and not pd.api.types.is_numeric_dtype(df[c]):
            # lenient mode only: the driver sorts raw objects, so
            # stringifying here would hide unsortable array cells
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _bitwise_float_eq(av: pd.Series, bv: pd.Series) -> bool:
    """Byte-level equality — distinguishes -0.0/0.0 like a value-hash."""
    import numpy as np

    return bool(
        np.asarray(av, dtype="float64").tobytes()
        == np.asarray(bv, dtype="float64").tobytes()
    )


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str:
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
    max_float_diff = 0.0
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            av, bv = a[c].fillna(math.nan), b[c].fillna(math.nan)
            diff = (av - bv).abs().max()
            if not math.isnan(diff):
                max_float_diff = max(max_float_diff, float(diff))
            if STRICT:
                eq = _bitwise_float_eq(av, bv)
            else:
                eq = ((av == bv) | (av.isna() & bv.isna())).all()
        else:
            eq = a[c].equals(b[c])
        if not eq:
            bad = a[c].ne(b[c]) & ~(a[c].isna() & b[c].isna())
            idx = bad[bad].index[:3].tolist()
            return (
                f"VALUES col={c} rows={idx} "
                f"spark={a[c].iloc[idx].tolist()} oracle={b[c].iloc[idx].tolist()}"
            )
    tag = "OK"
    if max_float_diff > 0:
        tag += f" (float_diff={max_float_diff:g})"
    return tag


def main() -> None:
    global STRICT
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--driver":
        STRICT = True
        argv.pop(0)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if STRICT:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("check_correctness_driverlike")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} SPARK-ERROR {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"{name:32s} rows-only ({len(spark_pdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            n_ok += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ORACLE-ERROR {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        try:
            verdict = compare(name, spark_pdf, oracle_pdf)
        except Exception as e:  # noqa: BLE001 — e.g. unsortable array cells
            verdict = f"CANON-ERROR {type(e).__name__}: {str(e)[:200]}"
        status = "OK" if verdict.startswith("OK") else "MISMATCH"
        n_ok += status == "OK"
        n_bad += status != "OK"
        print(f"{name:32s} {verdict}  ({len(spark_pdf)} rows, "
              f"{time.time()-t0:.1f}s)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
