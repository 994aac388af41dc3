"""Dump `.explain("formatted")` (and the post-AQE executed plan) for queries.

Usage: python tools/dump_plans.py <sf_dir> <out_dir> <suffix> <query> [<query>...]

Writes <out_dir>/<query>_<suffix>.txt with two sections:
  1. EXPLAIN FORMATTED of the built DataFrame (the initial, pre-AQE plan —
     what `df.explain("formatted")` prints), and
  2. the final executed plan after `.collect()` (AQE's re-optimised plan),
     which is where runtime join-strategy changes and coalesced reads show.

The script resolves the engine package relative to its own location so a
copy dropped into a historical checkout audits THAT tree's code.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import duckdb_extension_kafquack_spark.operators  # noqa: F401
    import duckdb_extension_kafquack_spark.streaming  # noqa: F401
    import duckdb_extension_kafquack_spark.functions.udf  # noqa: F401
    import duckdb_extension_kafquack_spark.tpch  # noqa: F401
    from duckdb_extension_kafquack_spark.plans import final_executed_plan
    from duckdb_extension_kafquack_spark.session import get_spark
    from duckdb_extension_kafquack_spark.suite import REGISTRY

    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    for name in names:
        q = REGISTRY[name]
        df = q.fn(spark, sf_dir)
        formatted = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # plans.final_executed_plan keeps the collect+capture pair (and
        # its bounded-output caveat) in one place (r13 advice)
        final = final_executed_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n\n")
            f.write("---- explain(formatted), initial plan ----\n")
            f.write(formatted)
            f.write("\n---- final executed plan (post-AQE) ----\n")
            f.write(final)
            f.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
