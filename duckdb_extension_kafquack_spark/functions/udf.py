"""User-defined function surface: pandas UDF, UDAF (applyInPandas), UDTF.

The reference exposes no user extension point at all — it *is itself*
the extension (a table function registered into DuckDB,
kafquack_extension.cpp:223-229).  Our engine is a Python library, so
the same extension point is "write Python"; these are the blessed
shapes, each Arrow-vectorized (never row-at-a-time Python):

* scalar: ``@pandas_udf`` — numpy/pandas over Arrow batches,
* aggregate: ``applyInPandas`` over a groupBy — full-group pandas frame,
* table: ``@udtf`` — rows out per row in (Spark 3.5+/4.x, batch only).

Each has an oracle-checked suite entry proving value parity with the
declarative equivalent.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..session import load_tables
from ..suite import query


# a DataType instance (not a DDL string) so the decorator works without
# an active SparkSession at import time
@pandas_udf(DoubleType())
def price_score(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: numpy math over Arrow batches — the shape
    to use when an expression genuinely can't be written with built-ins
    (this one could; it exists to pin the UDF contract)."""
    import numpy as np

    return np.round(np.log10(price * (1 - discount)) * 10) / 10


@query(
    "pandas_udf_scalar",
    """
SELECT ROUND(LOG10(l_extendedprice * (1 - l_discount)) * 10) / 10 AS score,
       COUNT(*) AS n
FROM lineitem
GROUP BY 1
""",
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.select(price_score("l_extendedprice", "l_discount").alias("score"))
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def weighted_avg_price(orders_per_group: pd.DataFrame) -> pd.DataFrame:
    """UDAF body: receives the full group as a pandas frame."""
    w = orders_per_group["l_quantity"]
    v = orders_per_group["l_extendedprice"]
    return pd.DataFrame(
        {
            "l_returnflag": [orders_per_group["l_returnflag"].iloc[0]],
            "weighted_avg_price": [round(float((v * w).sum() / w.sum()), 4)],
            "n": [len(orders_per_group)],
        }
    )


@query(
    "pandas_udaf_group",
    """
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS weighted_avg_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def pandas_udaf_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas UDAF: one shuffle on the group key, whole group to
    one pandas frame.  At scale, guard group cardinality (a single huge
    group lands on one executor — pre-aggregate or salt first)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select("l_returnflag", "l_quantity", "l_extendedprice").groupBy(
        "l_returnflag"
    ).applyInPandas(
        weighted_avg_price,
        "l_returnflag string, weighted_avg_price double, n long",
    )


def register_udtf(spark: SparkSession) -> None:
    """Register the tokenize UDTF for SQL use (``SELECT * FROM tokenize(...)``)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class Tokenize:
        def eval(self, text: str):
            if text:
                for i, t in enumerate(text.split(" ")):
                    if t:
                        yield i, t

    spark.udtf.register("tokenize", Tokenize)


@query(
    "udtf_tokenize",
    """
SELECT t.tok, COUNT(*) AS n
FROM (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents WHERE doc_id < 10
) t
GROUP BY t.tok
""",
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (lateral join over each document) — token counts match
    the declarative unnest oracle."""
    load_tables(spark, sf_dir)
    register_udtf(spark)
    return spark.sql(
        """
        SELECT t.tok, COUNT(*) AS n
        FROM documents, LATERAL tokenize(text) t
        WHERE doc_id < 10
        GROUP BY t.tok
        """
    )
