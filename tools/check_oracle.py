#!/usr/bin/env python
"""Local harness mimicking the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, compare row count, schema width, and an order-insensitive
value hash (stringified, column-name-sorted)."""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if hasattr(v, "isoformat"):
        s = v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
        return s.rstrip("0").rstrip(".") if "." in s else s
    return str(v)


def hash_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


# Types DuckDB may legally emit from an oracle: everything here crosses Arrow
# with the same physical representation Spark uses. Anything else — HUGEINT
# (SUM over BIGINT), DECIMAL (SUM over INT), unsigned ints — hash-mismatches
# the driver even when values are identical (cost rounds 1-3: series_stats,
# text_pack_sequences). LIST/STRUCT payloads are linted on their element type.
_OK_TYPES = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BLOB",
}


def _type_ok(t: str) -> bool:
    t = t.strip().upper()
    if t.endswith("[]"):
        return _type_ok(t[:-2])
    if t.startswith("STRUCT(") and t.endswith(")"):
        # best-effort: flag if any banned keyword appears inside
        inner = t[7:-1]
        return not any(bad in inner for bad in ("HUGEINT", "DECIMAL", "UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT"))
    return t in _OK_TYPES


def lint_oracle_types(con, oracles) -> int:
    """DESCRIBE every oracle in DuckDB; fail on any column whose type is not
    Arrow-identical to a Spark type (r3 verdict ask #2). DESCRIBE only plans,
    so this is near-free and runs before the row-level compare."""
    bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:
            print(f"LINT FAIL {name}: describe error: {str(e).splitlines()[0]}")
            bad += 1
            continue
        offending = [(c, t) for c, t, *_ in desc if not _type_ok(t)]
        if offending:
            print(f"LINT FAIL {name}: non-portable oracle column types: {offending}")
            bad += 1
    if bad:
        print(f"\noracle type lint: {bad} oracle(s) with non-portable types")
    else:
        print("oracle type lint: all columns portable")
    return bad


def main(only: list[str] | None = None):
    lint_only = bool(only) and "--lint" in only
    if lint_only:
        only = [a for a in only if a != "--lint"] or None

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    def _registry():
        # the local harness checks the FULL registry (driver order + the
        # _DRIVER_EXCLUDED entries the 50-row gate skips) so retired
        # queries keep their value check
        if hasattr(entry, "all_queries"):
            return entry.all_queries()
        return entry.queries(), entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    if lint_only:
        _, oracles = _registry()
        if only:
            oracles = {n: s for n, s in oracles.items() if n in only}
        return lint_oracle_types(con, oracles)

    from tsprofiler_spark.session import get_spark

    spark = get_spark(app_name="check-oracle", cores=8, shuffle_partitions=8)

    queries, oracles = _registry()
    failures = lint_oracle_types(con, oracles if not only else {n: s for n, s in oracles.items() if n in only})
    if only:
        unknown = [n for n in only if n not in queries]
        if unknown:
            # a typo'd filter must not report a false-green "0 failures"
            print(f"FAIL: requested queries not in the registry: {unknown}")
            return 1
    ran = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(srows)} rows")
            continue
        try:
            ddf = con.sql(oracles[name])
            drows = ddf.fetchall()
            dcols = [d[0] for d in ddf.description]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            sh = hash_rows([tuple(r) for r in srows], scols)
            dh = hash_rows(drows, dcols)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"OK   {name}: {len(srows)} rows match")
    if ran == 0:
        print("FAIL: no queries ran")
        return 1
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:] or None) else 0)
