"""Local mirror of the driver's correctness gate: run a Spark query and a
DuckDB oracle SQL side-by-side and compare row count + column names +
order-insensitive values (exact after in-query rounding).
"""

from __future__ import annotations

import datetime as _dt
import decimal
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
    if isinstance(v, decimal.Decimal):
        # Exact string, never float(): collapsing to float hides >2^53
        # divergence AND hides HUGEINT-vs-BIGINT type splits the driver's
        # harness treats as mismatches. Trailing zeros are stripped so
        # DECIMAL(38,2) "1.50" == DECIMAL(12,4) "1.5000".
        if v.is_nan():
            return "f:nan"
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        if s in ("", "-0"):
            s = "0"
        return f"D:{s}"
    return f"s:{v}"


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, oracle_sql: str) -> dict:
    """Return a diff report; 'ok' True when count+columns+values all match."""
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    # Fetch through Arrow, not fetchall(): fetchall() coerces DuckDB
    # HUGEINT (int128, e.g. a raw SUM(BIGINT)) to Python int, which let
    # two oracles pass locally while the driver's canonicalization
    # hash-failed them. Arrow exports HUGEINT as decimal128(38,0), so the
    # local mirror now sees the same type split the driver does.
    tbl = con.sql(oracle_sql).arrow()
    o_cols = list(tbl.column_names)
    # Rows built POSITIONALLY from the columns, never via to_pylist()
    # dicts: duplicate column names in an oracle SELECT would collapse to
    # one dict key and silently compare the wrong values (ADVICE r6).
    o_rows = [
        tuple(vals)
        for vals in zip(*(col.to_pylist() for col in tbl.columns))
    ]

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
