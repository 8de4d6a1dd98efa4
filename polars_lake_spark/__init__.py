"""polars_lake_spark — a PySpark-native lakehouse analytics engine.

A from-scratch rebuild of the capabilities of ``TomScheffers/polars-lake``
(reference surveyed in SURVEY.md): a multi-table database over
hive-partitioned + hash-bucketed Parquet with insert/upsert/delete
maintenance operators, a full SQL query surface, micro-batched streaming
ingest — re-expressed on Spark DataFrame/SQL/Catalyst/Structured Streaming
and extended with large-scale training-data-pipeline operators
(deduplication, similarity search, text analysis, multimodal columns).

Everything is declarative DataFrame/SQL so Catalyst supplies predicate
pushdown, column pruning, partition pruning, join selection and AQE; the
custom code is confined to the table manifest/layout convention, the merge
semantics, and the extension operators.
"""

from polars_lake_spark.engine import Engine, TableSpec
from polars_lake_spark.session import configure_session, get_spark

__all__ = ["Engine", "TableSpec", "configure_session", "get_spark"]

__version__ = "0.1.0"
