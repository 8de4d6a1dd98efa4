"""Mutation operators: upsert / delete / dedup / schema evolution / audit.

These reproduce the reference's maintenance semantics (SURVEY.md §2.b) as
pure DataFrame → DataFrame transforms, so they compose with any storage
tier and stay fully inside Catalyst (broadcast/SMJ selection, AQE) — no
driver-side loops, no per-part objects.

Upsert semantics preserved exactly (``/root/reference/src/dataset.rs:108-147``):

* ``old FULL OUTER JOIN new ON keys`` then per non-key column
  ``coalesce(new.c, old.c)`` — incoming non-null values win; an incoming
  NULL does NOT clobber an existing value
  (``/root/reference/src/dataset.rs:115``).
* Output schema = old table's column set; extra incoming columns are
  dropped (schema evolution was an open TODO there,
  ``/root/reference/src/main.rs:33`` — we implement it as an explicit
  opt-in instead).

Deliberate divergence (documented per SURVEY.md §2.b fine print): the
reference routes upserts within one (partition, bucket) part only, so a key
living in a different partition duplicates instead of updating
(``/root/reference/src/dataset.rs:306-317``).  Our merge is global over the
joined frames — strictly more correct, and identical whenever partition and
bucket columns are functions of the key (the only configuration in which
the reference is correct).

The delete / drop-duplicates / schema-evolution / audit-column operators
implement the reference's TODO roadmap (``/root/reference/src/main.rs:31-34``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    *,
    evolve: bool = False,
    null_clobbers: bool = False,
) -> DataFrame:
    """Keyed merge: new rows inserted, matched rows take new non-null
    values, unmatched old rows kept.

    evolve=True unions the column sets (reference TODO
    /root/reference/src/main.rs:33); default drops incoming extras like
    the reference. null_clobbers=True switches to last-write-wins
    (Delta ``UPDATE SET *`` semantics) instead of coalesce.
    """
    keys = list(keys)
    if evolve:
        old = evolve_schema(old, new)
    old_cols = old.columns
    new_cols = set(new.columns)

    missing_keys = [k for k in keys if k not in new_cols]
    if missing_keys:
        raise ValueError(f"upsert keys missing from incoming frame: {missing_keys}")

    o = old.alias("o")
    n = new.alias("n")
    # Full outer on keys: Catalyst picks the physical join; at scale both
    # sides shuffle on the key — co-partitioned layouts (same bucket spec)
    # avoid one side's exchange.
    joined = o.join(n, on=[F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys], how="full_outer")

    select = []
    for c in old_cols:
        if c in keys:
            select.append(F.coalesce(F.col(f"o.{c}"), F.col(f"n.{c}")).alias(c))
        elif c in new_cols:
            if null_clobbers:
                # Row matched in new → take new value even if NULL.
                matched = F.col(f"n.{keys[0]}").isNotNull()
                select.append(
                    F.when(matched, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}")).alias(c)
                )
            else:
                # Reference expression (/root/reference/src/dataset.rs:115).
                select.append(F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c))
        else:
            select.append(F.col(f"o.{c}").alias(c))
    return joined.select(*select)


def delete_keys(old: DataFrame, deletes: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Delete-by-key = left anti join — the reference's planned
    "delete operation (anti right)" (/root/reference/src/main.rs:31)."""
    return old.join(deletes.select(*keys).distinct(), on=list(keys), how="left_anti")


def drop_duplicates_keyed(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str] | None = None
) -> DataFrame:
    """Keyed dedup (reference TODO /root/reference/src/main.rs:32).

    With ``order_by`` the survivor is deterministic (first row per key in
    that ordering — implemented as a window row_number, one shuffle on the
    key); without it, Spark's ``dropDuplicates`` (arbitrary survivor,
    map-side partial aggregation, cheapest at scale).
    """
    if not order_by:
        return df.dropDuplicates(list(keys))
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# Spark simpleString names, narrowest → widest.
_WIDEN_ORDER = ["tinyint", "smallint", "int", "bigint", "float", "double"]


def _widened(t1: str, t2: str) -> str | None:
    """Numeric widening lattice (int→bigint→double style); None if the
    two types don't widen to each other."""
    if t1 == t2:
        return t1
    if t1 in _WIDEN_ORDER and t2 in _WIDEN_ORDER:
        # bigint+float would lose precision as float; promote to double
        if {t1, t2} == {"bigint", "float"}:
            return "double"
        return _WIDEN_ORDER[max(_WIDEN_ORDER.index(t1), _WIDEN_ORDER.index(t2))]
    return None


def evolve_schema(old: DataFrame, new: DataFrame) -> DataFrame:
    """mergeSchema-style evolution (reference TODO
    /root/reference/src/main.rs:33): widen ``old`` with columns that only
    exist in ``new`` (as NULLs), and up-cast numeric columns whose type
    widened in ``new`` (int→long, float→double, …)."""
    new_types = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    for f in old.schema.fields:
        nt = new_types.get(f.name)
        if nt is None:
            continue
        ot = f.dataType.simpleString()
        if nt != ot:
            w = _widened(ot, nt)
            if w is not None and w != ot:
                old = old.withColumn(f.name, F.col(f.name).cast(w))
    extra = [f for f in new.schema.fields if f.name not in old.columns]
    for f in extra:
        old = old.withColumn(f.name, F.lit(None).cast(f.dataType))
    return old


def with_audit_columns(
    df: DataFrame, *, created: bool = True, changed: bool = True, ts=None
) -> DataFrame:
    """CREATED_AT / CHANGED_AT audit columns (reference TODO
    /root/reference/src/main.rs:34). ``ts`` pins a deterministic literal
    timestamp (tests/oracles); default is current_timestamp()."""
    # Pinned stamps are UTC wall-clock (ntz) so they compare engine-agnostically.
    t = F.lit(ts).cast("timestamp_ntz") if ts is not None else F.current_timestamp()
    if created and "created_at" not in df.columns:
        df = df.withColumn("created_at", t)
    if changed:
        df = df.withColumn("changed_at", t)
    return df


def merge_into(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    *,
    when_matched_delete=None,
    when_matched_update: bool = True,
    when_not_matched_insert: bool = True,
    null_clobbers: bool = False,
    set_exprs: dict | None = None,
    when_not_matched_by_source_delete=None,
    when_matched_update_condition=None,
) -> DataFrame:
    """SQL MERGE INTO semantics as a pure transform (the Delta/Iceberg
    statement the reference never reached):

    * matched  + ``when_matched_delete`` condition true  → row removed
    * matched  (otherwise, if ``when_matched_update`` — optionally gated
      by ``when_matched_update_condition``, Delta's ``WHEN MATCHED AND c
      THEN UPDATE``; matched rows failing the condition keep old values)
      → coalesce merge (or last-write-wins with ``null_clobbers=True``;
      or the explicit ``set_exprs`` assignments — Delta's ``UPDATE SET
      c = e`` — where unassigned columns keep their OLD values)
    * source-only (if ``when_not_matched_insert``)        → inserted
    * target-only + ``when_not_matched_by_source_delete`` condition true
      → row removed (Delta's WHEN NOT MATCHED BY SOURCE THEN DELETE);
      target-only otherwise                               → kept

    ``when_matched_delete``, ``when_matched_update_condition``, and each
    ``set_exprs`` value are Columns evaluated over the joined row —
    reference source columns as ``n.<col>`` and target as ``o.<col>``;
    ``when_not_matched_by_source_delete`` sees only the target side.
    One full-outer join on the keys, same shuffle shape as upsert().
    """
    keys = list(keys)
    old_cols = old.columns
    new_cols = set(new.columns)
    if set_exprs:
        unknown = sorted(set(set_exprs) - set(old_cols))
        if unknown:
            raise ValueError(
                f"merge_into: SET columns {unknown} are not target columns"
            )
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(
        n,
        on=[F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys],
        how="full_outer",
    ).withColumn("__o_present", F.col(f"o.{keys[0]}").isNotNull()).withColumn(
        "__n_present", F.col(f"n.{keys[0]}").isNotNull()
    )
    matched = F.col("__o_present") & F.col("__n_present")
    # the rows the update clause actually touches: matched, and (when a
    # clause condition was given) passing it — others keep old values
    upd_gate = matched
    if when_matched_update_condition is not None:
        upd_gate = matched & F.coalesce(
            when_matched_update_condition, F.lit(False)
        )

    keep = F.lit(True)
    if when_matched_delete is not None:
        keep = ~(matched & F.coalesce(when_matched_delete, F.lit(False)))
    if when_not_matched_by_source_delete is not None:
        target_only = F.col("__o_present") & ~F.col("__n_present")
        keep = keep & ~(
            target_only
            & F.coalesce(when_not_matched_by_source_delete, F.lit(False))
        )
    if not when_not_matched_insert:
        keep = keep & (F.col("__o_present") | F.lit(False))
    joined = joined.filter(keep)

    select = []
    for c in old_cols:
        if c in keys:
            select.append(F.coalesce(F.col(f"o.{c}"), F.col(f"n.{c}")).alias(c))
        elif set_exprs is not None:
            # explicit assignments: matched rows take their SET
            # expression (unassigned columns keep old values); inserts
            # take source values; target-only rows keep old values (for
            # insert rows the o side is a typed NULL, so the fallback
            # never manufactures a wrong type)
            upd = set_exprs[c] if c in set_exprs else F.col(f"o.{c}")
            select.append(
                F.when(upd_gate, upd)
                .when(F.col("__o_present"), F.col(f"o.{c}"))
                .otherwise(
                    F.col(f"n.{c}") if c in new_cols else F.col(f"o.{c}")
                )
                .alias(c)
            )
        elif c in new_cols:
            if not when_matched_update:
                # updates suppressed: matched rows keep old values; pure
                # inserts still take source values
                select.append(
                    F.when(F.col("__o_present"), F.col(f"o.{c}"))
                    .otherwise(F.col(f"n.{c}"))
                    .alias(c)
                )
            elif null_clobbers:
                select.append(
                    F.when(upd_gate, F.col(f"n.{c}"))
                    .when(F.col("__o_present"), F.col(f"o.{c}"))
                    .otherwise(F.col(f"n.{c}"))
                    .alias(c)
                )
            else:
                select.append(
                    F.when(
                        upd_gate,
                        F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")),
                    )
                    .when(F.col("__o_present"), F.col(f"o.{c}"))
                    .otherwise(F.col(f"n.{c}"))
                    .alias(c)
                )
        else:
            select.append(F.col(f"o.{c}").alias(c))
    return joined.select(*select)
