"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the configuration is
chosen so the same logical plans scale to a large cluster:

* AQE on (runtime shuffle coalescing, skew-join splitting) — at 100 TB
  static ``shuffle.partitions`` is always wrong, AQE re-plans from map
  output statistics.
* ``autoBroadcastJoinThreshold`` left at default so dimension tables
  (region/nation/supplier at any SF) broadcast instead of shuffling the
  fact table.
* Arrow enabled for the few pandas-UDF paths (vector kernels).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "kafquack-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster leave it high (or rely on AQE coalescing, which is enabled).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp —
        # read as long, normalize to µs in read_table (matches DuckDB's
        # ns→µs truncation on read).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # RocksDB state store (SURVEY §7.4): streaming state spills to
        # local disk instead of living on the JVM heap — session windows
        # and stateful dedup survive beyond toy state sizes.  Changelog
        # checkpointing uploads per-batch deltas, not full snapshots.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    )
    return builder.getOrCreate()


def ensure_session_conf(spark: SparkSession) -> None:
    """Settings our plans rely on, applied to ANY session (the driver
    builds its own SparkSession without :func:`get_spark`'s configs —
    without ``nanosAsLong`` every events.parquet read throws
    PARQUET_TYPE_ILLEGAL; both confs are runtime-settable SQLConfs)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # a bare session defaults to 200 shuffle partitions — on the local
    # gate that means 200 tasks per stateful-stream micro-batch; size to
    # the machine (runtime-settable; real clusters keep their own value
    # via SPARK_GRAFT_CPUS or AQE coalescing)
    import os as _os

    spark.conf.set(
        "spark.sql.shuffle.partitions", _os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    # streaming-state confs are read at query START, so setting them on a
    # live session covers the driver's bare SparkSession too
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to Spark TIMESTAMP regardless of the
    fixture's physical parquet layout.  Two layouts have shipped:

    * TIMESTAMP(NANOS) → long ns under ``nanosAsLong`` → integer-divide
      to µs (ns values ~1.7e18 overflow double precision), exactly what
      DuckDB does on read;
    * timestamp[us] with isAdjustedToUTC=false → Spark TIMESTAMP_NTZ →
      cast to TIMESTAMP (session TZ is UTC, so the cast is
      wall-clock-preserving and matches DuckDB's naive read).

    Every reader of events — batch ``read_table`` AND the streaming
    ``readStream`` paths — must route through this, since ``unix_micros``
    and ``withWatermark`` both reject TIMESTAMP_NTZ.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000").cast("long"))
        ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    elif dtype == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing types to the logical schema
    (see :func:`normalize_event_ts` for the ``events.ts`` rules)."""
    ensure_session_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}
_ACTIVE_VIEWS: dict[int, str] = {}


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table as a DataFrame and register temp views.

    Parquet scans get column pruning + predicate pushdown from Catalyst
    for free; at 100 TB the same call reads a partitioned table and
    partition pruning applies — nothing here materializes on the driver.

    DataFrames are cached per (session, sf_dir): they are immutable plan
    handles, and re-deriving them costs ~1 s of file listing + schema
    reads per call — pure overhead when a suite runs 79 queries against
    the same directory.  Temp views are (re-)registered whenever the
    session's active sf_dir changes so SQL names always resolve to the
    requested scale factor.
    """
    ensure_session_conf(spark)
    key = (id(spark), sf_dir)
    cached = _TABLE_CACHE.get(key)
    if cached is None:
        cached = {}
        for name in TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                cached[name] = read_table(spark, sf_dir, name)
        _TABLE_CACHE[key] = cached
    if _ACTIVE_VIEWS.get(id(spark)) != sf_dir:
        for name, df in cached.items():
            df.createOrReplaceTempView(name)
        _ACTIVE_VIEWS[id(spark)] = sf_dir
    return cached
