"""Custom Python Data Source: a reusable ``httpfile`` format.

SURVEY.md §2A op #1 maps the reference's HTTP ingest
(``bronze:40-94``) to "a custom Python Data Source
(``spark.dataSource.register``, Spark >= 4.0) for a reusable ``http``
format". This is that source: CSV/JSON-lines over http(s):// or
file:// URLs, readable as

    spark.dataSource.register(HttpFileDataSource)
    spark.read.format("httpfile").schema(schema)
         .option("url", "https://.../data.csv").load()

Partitioning: one partition per URL (the ``url`` option is a
comma-separated list) — each executor fetches its own URL, so a
manifest of N shard URLs scans N-wide with zero driver involvement.
That is the 100 TB shape for HTTP ingest: the driver never touches the
bytes (unlike the reference, which spools everything through one
process; ``medallion.source_http`` keeps the driver-spool variant for
single small files like the reference's xlsx).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class HttpFileReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.urls = [u.strip() for u in options.get("url", "").split(",") if u.strip()]
        if not self.urls:
            raise ValueError("httpfile: the 'url' option is required")
        self.fmt = options.get("format", "csv").lower()
        self.header = options.get("header", "true").lower() == "true"
        self.sep = options.get("sep", ",")

    def partitions(self) -> Sequence[_UrlPartition]:
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        # Runs ON THE EXECUTOR: fetch this partition's URL and parse.
        import csv
        import io
        import json
        import urllib.request

        with urllib.request.urlopen(partition.url, timeout=60) as resp:
            text = resp.read().decode("utf-8")

        names = [f.name for f in self.schema.fields]
        casters = {
            "integer": int, "long": int, "short": int,
            "double": float, "float": float,
            "boolean": lambda v: str(v).lower() in ("true", "1"),
        }

        # PERMISSIVE posture (matching the engine's CSV scans): one bad
        # line must never kill the whole partition/task. Ragged rows
        # null-fill the missing fields; unparseable numerics become NULL
        # for that field only.
        def cast_row(d: dict) -> tuple:
            out = []
            for f in self.schema.fields:
                v = d.get(f.name)
                if v is None or v == "":
                    out.append(None)
                else:
                    try:
                        out.append(casters.get(f.dataType.typeName(), str)(v))
                    except (ValueError, TypeError):
                        out.append(None)
            return tuple(out)

        if self.fmt == "jsonl":
            for line in text.splitlines():
                if not line.strip():
                    continue
                try:
                    obj = json.loads(line)
                except ValueError:
                    obj = {}  # corrupt line -> all-NULL row, never a task kill
                yield cast_row(obj if isinstance(obj, dict) else {})
        else:
            rows = csv.reader(io.StringIO(text), delimiter=self.sep)
            if self.header:
                header = next(rows, None)
                idx = {name: i for i, name in enumerate(header or [])}
                for r in rows:
                    yield cast_row(
                        {n: r[idx[n]] for n in names if n in idx and idx[n] < len(r)}
                    )
            else:
                for r in rows:
                    yield cast_row(dict(zip(names, r)))


class HttpFileDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "httpfile"

    def reader(self, schema: StructType) -> HttpFileReader:
        return HttpFileReader(schema, self.options)
