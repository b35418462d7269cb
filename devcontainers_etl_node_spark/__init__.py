"""devcontainers_etl_node_spark — a PySpark-native analytics/ETL engine.

Brand-new engine with the query and data-processing capabilities of the
reference `marcoscobo/devcontainers-etl-node` (a single-threaded pandas ETL
node), re-expressed Spark-first:

- Sources: JDBC / bounded-Kafka / multi-file CSV with provenance (reference
  ``src/etl/extractors.py``), plus Parquet for the analytics corpus.
- Transforms: schema conformance (reference ``src/etl/loaders.py:115-149``),
  star-join enrichment (reference ``src/etl/etl.py:20-54``).
- Sinks: JDBC batch append, Kafka producer, partitioned file layouts
  (reference ``src/etl/loaders.py``, ``src/data_chargers/minio_loader.py``).
- Query catalog: the full analytics surface (filter/agg/join/window/setop/
  scalar) checked against a DuckDB oracle.
- LLM-data operators: dedup (exact/MinHash/SimHash), similarity search,
  text analysis, multimodal column plumbing — designed for 100 TB scale.

Everything is lazy DataFrame plans; Catalyst/Tungsten pick physical
strategies. No RDDs, no driver-side loops in hot paths.
"""

from devcontainers_etl_node_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
