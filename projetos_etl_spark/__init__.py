"""projetos_etl_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the reference repo
``rogeriojunior92/projetos-etl`` (an Airflow + pandas + MinIO + Postgres
medallion ETL; see SURVEY.md) as an idiomatic Apache Spark engine:

- DataFrame / Spark SQL first (Catalyst + AQE do the physical planning),
- medallion layers (bronze ingest -> silver conform -> gold marts),
- the full relational operator surface the reference's unbuilt gold
  layer implies (joins, aggregation, windows, set ops, scalar packs),
- LLM-data-pipeline operators (dedup exact/MinHash/SimHash, similarity
  search, text analysis, multimodal plumbing),
- Structured Streaming over event tables.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

from projetos_etl_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
