"""Differential-test harness mirroring the driver's correctness gate.

Runs a registered query's Spark implementation and its DuckDB oracle SQL
over the same parquet tables, then compares row count, column names, and
(order-insensitively) every value — exactly, because the driver compares
value hashes. Columns are sorted by name and rows by all values, matching
the driver's described procedure.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from hadoop_prototype_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    # Numeric-type-STRICT, mirroring the driver's typed value hash: an int
    # 6 and a float 6.0 must MISMATCH (DuckDB typing a bare integer sum as
    # HUGEINT while Spark emits BIGINT is exactly the drift the driver's
    # gate rejects — see CORRECTNESS_r05 dedup_window_fraction). Values are
    # tagged with a type marker so equal-valued cross-type pairs differ.
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (str, bytes)):
        return v
    # decimals and other exotics: stringify (type-tagged so a Decimal('6')
    # never silently equals the string '6')
    return (type(v).__name__, str(v))


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def compare_query(spark, sf_dir: str, spark_fn, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    errors: list[str] = []
    sdf = spark_fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    srows = [
        tuple(_norm(r[c]) for c in spark_cols) for r in sdf.collect()
    ]

    con = duckdb_connection(sf_dir)
    try:
        # Fetch through Arrow, like the driver does: DuckDB's Arrow export
        # maps HUGEINT to double, so a bare integer sum(...) oracle column
        # surfaces as float here (and mismatches Spark's int) exactly as it
        # does under the driver's typed hash. fetchall() would hide that by
        # returning a Python int.
        atbl = con.execute(oracle).arrow()
        ora_cols_orig = list(atbl.column_names)
        orows_raw = [
            tuple(d[c] for c in ora_cols_orig) for d in atbl.to_pylist()
        ]
    finally:
        con.close()
    ora_cols = sorted(ora_cols_orig)
    if spark_cols != ora_cols:
        errors.append(f"columns differ: spark={spark_cols} oracle={ora_cols}")
        return errors
    idx = [ora_cols_orig.index(c) for c in ora_cols]
    orows = [tuple(_norm(r[i]) for i in idx) for r in orows_raw]

    if len(srows) != len(orows):
        errors.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
    srows.sort(key=_sort_key)
    orows.sort(key=_sort_key)
    n_bad = 0
    for srow, orow in zip(srows, orows):
        if srow != orow:
            n_bad += 1
            if n_bad <= 5:
                errors.append(f"row differs:\n  spark : {srow}\n  oracle: {orow}")
    if n_bad > 5:
        errors.append(f"... {n_bad} differing rows total of {len(srows)}")
    return errors
