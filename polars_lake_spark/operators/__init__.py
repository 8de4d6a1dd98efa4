from polars_lake_spark.operators.merge import (
    delete_keys,
    drop_duplicates_keyed,
    evolve_schema,
    upsert,
    with_audit_columns,
)

__all__ = [
    "delete_keys",
    "drop_duplicates_keyed",
    "evolve_schema",
    "upsert",
    "with_audit_columns",
]
