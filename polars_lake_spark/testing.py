"""Local mirror of the driver's correctness gate: run a Spark query and a
DuckDB oracle SQL side-by-side and compare row count + column names +
order-insensitive values (exact after in-query rounding).
"""

from __future__ import annotations

import datetime as _dt
import math

from polars_lake_spark.sources.tables import TABLES


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return "\x00null"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    try:  # Decimal → exact string
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"f:{float(v)!r}"
    except ImportError:
        pass
    return f"s:{v}"


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, oracle_sql: str) -> dict:
    """Return a diff report; 'ok' True when count+columns+values all match."""
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = con.sql(oracle_sql)
    o_cols = rel.columns
    o_rows = rel.fetchall()

    report = {
        "ok": False,
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(o_cols),
    }
    if sorted(s_cols) != sorted(o_cols):
        report["error"] = "column mismatch"
        return report
    if len(s_rows) != len(o_rows):
        report["error"] = "row count mismatch"
        return report
    a = _canon_rows(s_cols, [tuple(r) for r in s_rows])
    b = _canon_rows(o_cols, o_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        report["error"] = "value mismatch"
        report["first_diffs"] = diff
        return report
    report["ok"] = True
    return report
