"""Simulate the driver's smoke check: import __spark_entry__ exactly as
the driver does (fresh bare SparkSession, no engine configs), run
entry(), and sanity-run a sample of queries()/oracle_sql().

Usage: python tools/driver_sim.py [query ...]
"""

from __future__ import annotations

import importlib.util
import sys

from pyspark.sql import SparkSession


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # a BARE session, as the driver would build it — catches any reliance
    # on get_spark()'s configs (e.g. the parquet-nanos handling)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = mod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows")
    qs, oracles = mod.queries(), mod.oracle_sql()
    print(f"queries: {len(qs)}, oracles: {len(oracles)}")
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"

    names = sys.argv[1:] or [
        "q1_pricing_summary",
        "kafka_messages_batch",
        "streaming_tumbling_window",
        "dedup_minhash_lsh",
        "ann_cosine_topk",
    ]
    for name in names:
        n = qs[name](spark, "/root/testdata/sf0.001").count()
        print(f"  {name}: {n} rows")
    print("driver-sim OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
