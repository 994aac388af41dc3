"""Local replica of the driver's correctness gate.

Runs each suite query on Spark AND its DuckDB oracle at a given sf_dir,
compares row count, sorted column names, and order-insensitive values
(exact for ints/strings/timestamps; floats must match after the
round() both sides already apply — we report max abs diff if not).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    key = df.apply(lambda r: tuple(str(x) for x in r), axis=1)
    return df.iloc[key.argsort(kind="stable").values].reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(map(str.lower, spark_pdf.columns)), sorted(map(str.lower, duck_pdf.columns))
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        # the driver stringifies before hashing, so int64 1 vs float64 1.0
        # ("1" vs "1.0") is a driver FAIL even when numerically equal —
        # an int-vs-float dtype split (usually an uncast DuckDB HUGEINT
        # sum) must fail locally too, not slip through the float path
        if pd.api.types.is_float_dtype(av) != pd.api.types.is_float_dtype(bv) and (
            pd.api.types.is_integer_dtype(av) or pd.api.types.is_integer_dtype(bv)
        ):
            problems.append(
                f"col {c}: dtype mismatch spark={av.dtype} duck={bv.dtype} "
                "(driver hash stringifies: int 1 != float 1.0 — cast the oracle)"
            )
            continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            aa = pd.to_numeric(av, errors="coerce")
            bb = pd.to_numeric(bv, errors="coerce")
            both_nan = aa.isna() & bb.isna()
            diff = (aa - bb).abs()
            bad = ~both_nan & ~(diff == 0)
            if bad.any():
                problems.append(
                    f"col {c}: {int(bad.sum())} float mismatches, maxdiff="
                    f"{diff[bad].max() if not math.isnan(diff[bad].max()) else 'nan-mismatch'}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {i}: "
                    f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import duckdb_extension_kafquack_spark.operators  # noqa: F401 — registers north-star queries
    import duckdb_extension_kafquack_spark.streaming  # noqa: F401 — registers streaming queries
    import duckdb_extension_kafquack_spark.functions.udf  # noqa: F401 — registers UDF/UDAF/UDTF queries
    import duckdb_extension_kafquack_spark.tpch  # noqa: F401 — registers TPC-H-shaped queries
    from duckdb_extension_kafquack_spark.session import TABLES, get_spark
    from duckdb_extension_kafquack_spark.suite import REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        import os

        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            spdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if q.oracle is None:
            print(f"SKIP-ORACLE {name}: rows={len(spdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, spdf, dpdf)
        if problems:
            failures += 1
            print(f"FAIL {name}: rows={len(spdf)} ({time.time()-t0:.1f}s)")
            for p in problems[:5]:
                print(f"   - {p}")
        else:
            print(f"OK   {name}: rows={len(spdf)} ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
