#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle SQL in DuckDB
over the testdata tables, load the Spark result parquet written by
graft.Verify, sort columns by name, and compare values AND dtype classes.

DTYPE-STRICT (round 8): the driver compares pandas frames, so it is
sensitive to the dtype each engine materializes — DuckDB HUGEINT (the
result of sum(BIGINT)) and DECIMAL both fetchdf() to float64, while a
Spark parquet int64 stays int64 and a Spark parquet decimal loads as an
object column of decimal.Decimal. The old stand-in compared via
fetchall() (dtype-blind) and green-lit q148/q205/q239 which the driver
failed. This version loads the oracle via fetchdf() and the Spark
result via pandas.read_parquet(), and FAILS when the dtype classes of a
column differ (int vs float vs Decimal-object vs bool vs str...), even
if every value is equal.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
       python3 tools/check_correctness.py --selftest
"""
import datetime
import glob
import json
import math
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class ArrayCellError(Exception):
    """The driver's pandas comparator crashes on array-typed cells
    (unhashable numpy.ndarray during sort_values). Reproduce that
    intolerance here so the local gate can never pass what the driver
    fails: any list-valued cell is a hard FAIL, not a normalizable value.
    """


def dtype_class(series):
    """Collapse a pandas dtype into the class the driver's hash is
    sensitive to. int64 vs float64 vs object-of-Decimal must all be
    DISTINCT — those are exactly the q148/q205/q239 bug classes."""
    dt = series.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    if dt == object:
        for v in series:
            if v is None:
                continue
            if isinstance(v, float) and math.isnan(v):
                continue
            if isinstance(v, Decimal):
                return "decimal-object"
            if isinstance(v, (bytes, bytearray)):
                return "bytes"
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, (int, np.integer)):
                return "int"
            if isinstance(v, str):
                return "str"
            # date-vs-datetime is the one dtype pair the driver provably
            # TOLERATES (q49/q69/q139/q207 ship Spark date32 against
            # DuckDB DATE->datetime64 and have been driver-green since
            # round 1) — unify the class, compare values canonically
            if isinstance(v, datetime.date):
                return "datetime"
            if isinstance(v, (list, tuple, np.ndarray)):
                raise ArrayCellError(
                    "array-typed cell: the driver comparator cannot hash "
                    "arrays; emit a canonical string (array_join) instead")
            return type(v).__name__
        return "all-null"
    return str(dt)


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, np.floating):
        f = float(v)
        return "NaN" if math.isnan(f) else f
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        raise ArrayCellError(
            "array-typed cell: the driver comparator cannot hash arrays; "
            "emit a canonical string (array_join) instead")
    return v


def frame_of_df(df):
    """Sort columns by name; return (cols, dtype-classes, value rows)."""
    cols = sorted(df.columns)
    df = df[cols]
    classes = {c: dtype_class(df[c]) for c in cols}
    rows = [tuple(norm_cell(v) for v in rec)
            for rec in df.itertuples(index=False, name=None)]
    return cols, classes, rows


def oracle_frame(con, sql):
    return frame_of_df(con.execute(sql).fetchdf())


def spark_frame(result_dir):
    parts = sorted(glob.glob(f"{result_dir}/*.parquet"))
    if not parts:
        raise FileNotFoundError(f"no parquet parts under {result_dir}")
    df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
    return frame_of_df(df)


def compare(name, oracle, spark):
    ocols, oclass, orows = oracle
    scols, sclass, srows = spark
    if ocols != scols:
        return f"columns differ oracle={ocols} spark={scols}"
    dtype_bad = [c for c in ocols if oclass[c] != sclass[c]]
    if dtype_bad:
        detail = ", ".join(
            f"{c}: oracle={oclass[c]} spark={sclass[c]}" for c in dtype_bad)
        return f"dtype class mismatch ({detail})"
    if len(orows) != len(srows):
        return f"rows oracle={len(orows)} spark={len(srows)}"
    for i, (a, b) in enumerate(zip(orows, srows)):
        if a != b:
            lines = [f"first diff at row {i}:"]
            for c, x, y in zip(ocols, a, b):
                marker = "  <-- " if x != y else ""
                lines.append(f"    {c}: oracle={x!r} spark={y!r}{marker}")
            return "\n".join(lines)
    return None


def selftest():
    """The planted-bug test the verdict demanded: an int64 Spark column
    vs a float64 oracle column with IDENTICAL values must FAIL."""
    import tempfile
    import os
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame({"k": [1, 2], "v": [10, 20]}).astype(
            {"k": "int64", "v": "int64"}).to_parquet(
            os.path.join(d, "part-0.parquet"))
        # HUGEINT-style oracle: sum() of a BIGINT fetches as float64
        oracle = oracle_frame(
            con, "SELECT k, sum(v) AS v FROM (VALUES (1, 10), (2, 20)) "
                 "t(k, v) GROUP BY k ORDER BY k")
        spark = spark_frame(d)
        err = compare("selftest_int_vs_float", oracle, spark)
        assert err and "dtype class" in err, f"expected dtype FAIL, got {err!r}"
        # and the cast fix must PASS
        oracle2 = oracle_frame(
            con, "SELECT k, CAST(sum(v) AS BIGINT) AS v FROM "
                 "(VALUES (1, 10), (2, 20)) t(k, v) GROUP BY k ORDER BY k")
        err2 = compare("selftest_cast", oracle2, spark)
        assert err2 is None, f"expected PASS after cast, got {err2!r}"
        # decimal-object vs float64 must FAIL (the q239 class)
        pd.DataFrame({"k": [1], "v": [Decimal("1.500000")]}).to_parquet(
            os.path.join(d, "dec-0.parquet"))
        os.remove(os.path.join(d, "part-0.parquet"))
        oracle3 = oracle_frame(
            con, "SELECT 1 AS k, CAST(1.5 AS DECIMAL(18,6)) AS v")
        spark3 = spark_frame(d)
        err3 = compare("selftest_decimal", oracle3, spark3)
        assert err3 and "dtype class" in err3, \
            f"expected decimal dtype FAIL, got {err3!r}"
    print("SELFTEST PASS: int-vs-float and decimal-vs-float both fail, "
          "cast-fixed passes")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            oracle = oracle_frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            spark = spark_frame(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            err = compare(name, oracle, spark)
        except ArrayCellError as e:
            err = str(e)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"PASS {name} ({len(oracle[2])} rows)")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
