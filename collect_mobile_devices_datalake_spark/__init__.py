"""collect_mobile_devices_datalake_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference crawler/ETL
system (``/root/reference/app.js``): dynamic-schema ingest, extraction &
normalization operators, incremental dedup/resume, wide-record storage and
catalog introspection — re-expressed as idiomatic DataFrame / SQL /
Structured-Streaming pipelines — plus the large-scale training-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) the reference stores data *for* but never implements.

Design principles (100 TB target):
- Declarative DataFrame plans; Catalyst does pushdown/pruning/join choice.
- Built-in ``pyspark.sql.functions`` in hot paths (whole-stage codegen);
  Arrow-batched pandas UDFs only at the fetch/parse edge.
- Broadcast small dimensions; shuffle only on true aggregation/join keys.
- No driver-side ``collect()`` loops in any operator.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
