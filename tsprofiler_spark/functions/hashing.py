"""Cross-engine deterministic hashing.

``h32(s)`` = first 8 hex chars of md5 as an unsigned 32-bit integer —
identical in Spark (`conv(substr(md5(x),1,8),16,10)`) and DuckDB
(`CAST(concat('0x', substr(md5(x),1,8)) AS UBIGINT)`), which keeps every
hash-based pipeline operator oracle-comparable. md5 here is a content
fingerprint, not a security primitive.

At scale, swap for xxhash64 (Spark-native, faster) when oracle parity is
not needed — the operators take the hash expression as a parameter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(c: Column) -> Column:
    """Unsigned 32-bit hash of a string column (JVM-side)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def h32_sql_duckdb(expr: str) -> str:
    return f"CAST(CAST(concat('0x', substr(md5({expr}), 1, 8)) AS UBIGINT) AS BIGINT)"


def h32_py(s: str) -> int:
    """Driver-side Python twin of ``h32`` — for deterministic constants
    (LSH plane weights, universal-hash (a, b) pairs) that are folded into
    codegen SQL as literals. Keeping all three representations (Spark
    Column, DuckDB SQL, Python) in this one file means a future widening
    (as happened to h60) cannot silently desynchronize them."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def h60(c: Column) -> Column:
    """Unsigned 60-bit hash (first 15 md5 hex chars) — for identity-bearing
    hashes where 32-bit birthday collisions matter at corpus scale (e.g.
    the MinHash base hash: a base-hash collision aliases two shingles in
    EVERY derived signature position)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h60_sql_duckdb(expr: str) -> str:
    return f"CAST(CAST(concat('0x', substr(md5({expr}), 1, 15)) AS UBIGINT) AS BIGINT)"
