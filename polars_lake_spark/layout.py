"""Physical layout conventions: hive partitions + hash buckets.

The reference lays tables out as hive-style ``k=v`` partition dirs with
``{bucket:06}_file.parquet`` files, bucket = ``value % 5`` for numerics and
a string hash for strings (``/root/reference/src/dataset.rs:149-168``,
``/root/reference/src/buckets.rs:8-30``).  Two reference quirks we fix
rather than copy (SURVEY.md §1.2): the bucket count is hardcoded to 5, and
the string path returns the raw 64-bit hash without the modulo
(``/root/reference/src/buckets.rs:21-26``), so string bucket pruning never
worked there.

Spark-first design: the bucket is a **derived partition column**
``bucket_id = pmod(hash(cols...), n)`` — uniform across all types,
configurable n — so bucket pruning is ordinary hive partition pruning that
Catalyst performs natively (no custom rule), and an equality predicate on
the bucket column's source key prunes file listings at 100 TB scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "bucket_id"
DEFAULT_BUCKETS = 5  # the reference's constant (/root/reference/src/dataset.rs:200)


def bucket_expr(cols: Sequence[str], n_buckets: int) -> Column:
    """``pmod(hash(cols...), n)`` — works uniformly for every data type,
    unlike the reference's per-dtype match (/root/reference/src/buckets.rs:8-30).
    """
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_buckets)).cast("int")


def with_bucket_column(
    df: DataFrame, cols: Sequence[str], n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Add the derived bucket partition column
    (analog of /root/reference/src/dataset.rs:199-204)."""
    return df.withColumn(BUCKET_COL, bucket_expr(cols, n_buckets))


def layout_columns(partition_cols: Sequence[str], bucket_cols: Sequence[str]) -> list[str]:
    """The physical partitioning column list for a table spec."""
    out = list(partition_cols)
    if bucket_cols:
        out.append(BUCKET_COL)
    return out


# ------------------------------------------------------------------ z-order
ZORDER_BITS = 8  # per-column rank resolution (2^8 buckets per column)


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = ZORDER_BITS
) -> Column:
    """Bit-interleaved multi-column clustering key (Z-order curve).

    Each column is rank-bucketed into 2^bits quantile buckets using
    approxQuantile boundaries collected driver-side (bounded: 2^bits
    values per column — never a global-sort window), then the bucket
    bits are interleaved so files sorted by the key are clustered in
    EVERY listed column at once: per-file min/max ranges narrow on all
    of them, and Parquet row-group / file skipping works for predicates
    on any column combination — the Delta OPTIMIZE ZORDER BY analog.

    The bucket lookup is a pure expression over literal boundary arrays
    (map-side, codegen); NULLs land in bucket 0.
    """
    n_b = (1 << bits) - 1
    probs = [i / (n_b + 1) for i in range(1, n_b + 1)]
    key = None
    for ci, c in enumerate(cols):
        bounds = df.stat.approxQuantile(c, probs, 0.001)
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.coalesce(
            F.size(F.filter(barr, lambda b: b <= F.col(c).cast("double"))),
            F.lit(0),
        )
        for bit in range(bits):
            piece = (
                F.shiftright(bucket, bit).bitwiseAND(F.lit(1))
                * F.lit(1 << (bit * len(cols) + ci))
            ).cast("long")
            key = piece if key is None else key + piece
    return key


# --- hive partition path naming (for partition tombstones) -----------------

# The characters Hive/Spark %-encode in partition dir names
# (Hive FileUtils.escapePathName, which Spark's
# ExternalCatalogUtils.escapePathName mirrors): ASCII control chars plus
# the listed specials.  Anything else (including space) passes through.
_HIVE_ESCAPE = (
    {chr(i) for i in range(0x20)}
    | {chr(0x7F)}
    | set('"#%\'*/:=?\\{[]^')
)


def _escape_hive(s: str) -> str:
    return "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_ESCAPE else ch for ch in s
    )


def parse_hive_relpath(relpath: str) -> dict[str, str | None]:
    """Inverse of :func:`hive_relpath` for metadata rollups:
    ``'a=1/b=x%20y'`` → ``{'a': '1', 'b': 'x y'}``;
    ``__HIVE_DEFAULT_PARTITION__`` → ``None``.  Values come back as the
    STRINGS Spark embedded in the directory name — callers cast to the
    table's partition dtypes, exactly what a hive read-back does, so
    typed values round-trip identically to a real scan's partition
    columns."""
    from urllib.parse import unquote

    out: dict[str, str | None] = {}
    for seg in relpath.split("/"):
        if not seg:
            continue
        c, _, v = seg.partition("=")
        v = unquote(v)
        out[unquote(c)] = (
            None if v == "__HIVE_DEFAULT_PARTITION__" else v
        )
    return out


def _java_float_str(v: float, single: bool = False) -> str:
    """Java ``Double.toString`` / ``Float.toString`` rendering — the
    string Spark embeds in hive partition dir names for float-typed
    partition values.  Python's ``str()`` diverges (``0.000781`` vs Java
    ``7.81E-4``, ``1e-07`` vs ``1.0E-7``), which made tombstone/drop
    relpaths silent no-ops on float partitions (ADVICE r7).  Java uses
    decimal notation for 1e-3 <= |v| < 1e7 and ``d.dddEn`` scientific
    otherwise, always with at least one fractional digit, shortest
    round-trip digits, uppercase E, no '+' on positive exponents."""
    import math
    from decimal import Decimal

    f = float(v)
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    neg = math.copysign(1.0, f) < 0
    a = abs(f)
    if single:
        # shortest SINGLE-precision digits (the collected Python float is
        # the widened double — its repr would print the excess digits)
        import numpy as np

        s = str(np.float32(a))
    else:
        s = repr(a)
    if a == 0.0:
        return "-0.0" if neg else "0.0"
    if 1e-3 <= a < 1e7:
        # shortest reprs are already fixed-notation in this range
        if "." not in s:
            s += ".0"
        return ("-" + s) if neg else s
    d = Decimal(s).normalize()
    _sign, digits, exp = d.as_tuple()
    dig = "".join(map(str, digits))
    ex = exp + len(dig) - 1
    mant = dig[0] + "." + (dig[1:] or "0")
    return f"{'-' if neg else ''}{mant}E{ex}"


def hive_relpath(
    cols: Sequence[str],
    values: Sequence,
    dtypes: Sequence[str] | None = None,
) -> str:
    """The hive partition directory rel-path Spark writes for one
    partition tuple — ``a=1/b=x%20y`` — so metadata operations (snapshot
    partition tombstones, plain-table partition drops) can name an
    existing directory WITHOUT scanning for it.  Must stay byte-identical
    to Spark's own naming (tests/test_maintenance.py pins it against
    directories Spark actually wrote, special characters included;
    tests/test_replace_partitions.py extends the pin to float/double/
    decimal/date/timestamp partition values).

    ``dtypes`` (optional, parallel to ``cols``): Spark dtype strings —
    only consulted to render single-precision ``float`` columns with
    Java ``Float.toString`` digits; every other type's ``str()`` already
    matches Spark's naming (decimal keeps scale, date/timestamp are ISO,
    the ``:`` escapes)."""
    segs = []
    for i, (c, v) in enumerate(zip(cols, values)):
        if v is None:
            sv = "__HIVE_DEFAULT_PARTITION__"
        elif isinstance(v, bool):
            sv = "true" if v else "false"
        elif isinstance(v, float):
            sv = _java_float_str(
                v, single=(dtypes is not None and dtypes[i] == "float")
            )
        else:
            sv = str(v)
        segs.append(f"{_escape_hive(str(c))}={_escape_hive(sv)}")
    return "/".join(segs)
