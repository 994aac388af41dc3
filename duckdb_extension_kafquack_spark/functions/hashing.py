"""Deterministic cross-engine hashing.

The dedup / LSH operators need hash functions that produce IDENTICAL
values in Spark and in the DuckDB oracle (the driver hash-compares
outputs).  Neither engine's native 64-bit hash matches the other's
(Spark ``xxhash64`` is seeded XXH64; DuckDB ``hash()`` is its own), but
``md5`` is bit-identical everywhere, so:

    hash64(s)  = int(md5(s)[0:15], 16)          # 60 bits, fits BIGINT
    Spark      : conv(substring(md5(s),1,15),16,10) cast long
    DuckDB     : ('0x' || substr(md5(s),1,15))::BIGINT

Seeded variants prefix the payload (``md5(seed || ':' || s)``), giving a
family of independent permutation approximations for MinHash/SimHash.
This stays entirely JVM-side in Spark (no Python UDF) and entirely
vectorized in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits — safely inside a signed 64-bit integer


def spark_seeded_md5(col: Column, seed: int) -> Column:
    """md5 hex digest of ``seed || ':' || col`` — a string whose *lexical*
    min is a valid MinHash (min over an approximately random permutation)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def spark_hash64(col: Column, seed: int | None = None) -> Column:
    """Deterministic 60-bit integer hash, identical to :func:`duck_hash64`."""
    h = F.md5(col) if seed is None else spark_seeded_md5(col, seed)
    return F.conv(F.substring(h, 1, HEX_CHARS), 16, 10).cast("long")


def duck_seeded_md5(expr: str, seed: int) -> str:
    """DuckDB SQL text equivalent of :func:`spark_seeded_md5`."""
    return f"md5('{seed}:' || {expr})"


def duck_hash64(expr: str, seed: int | None = None) -> str:
    """DuckDB SQL text equivalent of :func:`spark_hash64`."""
    h = f"md5({expr})" if seed is None else duck_seeded_md5(expr, seed)
    return f"('0x' || substr({h}, 1, {HEX_CHARS}))::BIGINT"
