"""Sources & sinks (SURVEY.md §2B "Scans/sources" / "Sinks").

Replaces the reference's MinIO-GET + pandas-parse scan path
(``bronze:151-154``, ``silver:39-43``) and its row-at-a-time JDBC insert
loop (``bronze:165-177``) with Spark-native, distributed readers/writers.
"""

from projetos_etl_spark.sources.io import (
    TABLES,
    load_table,
    register_views,
    scan_csv,
    scan_parquet,
    sink_parquet,
    sink_partitioned,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "scan_csv",
    "scan_parquet",
    "sink_parquet",
    "sink_partitioned",
]
