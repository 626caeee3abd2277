"""Custom Python Data Source WRITER: a ``jsonldir`` sink format.

The write-side twin of ``sources/httpds.py``'s custom reader — together
they cover both halves of the Python Data Source API (Spark >= 4.0),
the extension point a reference user would reach for when a sink Spark
doesn't ship (feed a bespoke service, an internal wire format, a legacy
system) has to scale out. Usage:

    spark.dataSource.register(JsonlDirDataSource)
    df.write.format("jsonldir").option("path", out).mode("append").save()

Execution model — the part that matters at 100 TB:

- ``write`` runs ON THE EXECUTORS, once per input partition: each task
  streams its own rows to its own shard file (``part-<id>.jsonl``), so
  an N-partition write is N-wide with the driver never touching a row
  (the reference's HTTP/DB I/O all funnels through one process).
- The task's rows are streamed straight to disk — O(1) memory per task,
  never materialized.
- The two-phase commit protocol is real: each task returns a
  WriterCommitMessage naming the file it wrote; only the DRIVER's
  ``commit`` publishes the ``_SUCCESS`` manifest listing exactly the
  committed shards, and ``abort`` removes the orphans a failed job left
  behind. Readers that honor the manifest never observe a partial job.
- Local-mode caveat: shard files land on the local filesystem, which is
  shared here; on a real cluster this sink (like every file sink) needs
  shared storage or an object store under ``path``.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage
from pyspark.sql.types import StructType


@dataclass
class _ShardCommit(WriterCommitMessage):
    file_path: str
    n_rows: int


class JsonlDirWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("jsonldir: the 'path' option is required")
        self.path = path
        self.field_names = [f.name for f in schema.fields]

    def write(self, iterator: Iterator) -> _ShardCommit:
        # Runs ON THE EXECUTOR, once per partition.
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        n = 0
        with open(shard, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.field_names, row)), default=str))
                f.write("\n")
                n += 1
        return _ShardCommit(file_path=shard, n_rows=n)

    def commit(self, messages: list[_ShardCommit]) -> None:
        # Runs ON THE DRIVER once every task has succeeded: publish the
        # manifest naming exactly the committed shards.
        manifest = {
            "files": sorted(m.file_path for m in messages),
            "rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages: list[_ShardCommit]) -> None:
        # Failed job: remove whatever partial shards reported in.
        for m in messages:
            if m is not None and os.path.exists(m.file_path):
                os.remove(m.file_path)


class JsonlDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonldir"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(schema, self.options)


def register(spark) -> None:
    """Idempotent per-session registration. Ships the package zip first:
    the writer class deserializes ON EXECUTORS, which on a real cluster
    don't share the driver's sys.path (local mode masks this)."""
    key = "_pes_jsonldir_registered"
    if getattr(spark, key, False):
        return
    from projetos_etl_spark.session import ship_package

    ship_package(spark)
    spark.dataSource.register(JsonlDirDataSource)
    setattr(spark, key, True)
