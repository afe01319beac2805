"""REST pagination sources as Spark 4 Python DataSources.

The reference's two scan styles (SURVEY.md §2.1) as proper pluggable
sources, so pagination happens *inside* the scan with its optimizations
(O5 server-side LIMIT, O6 cursor-cycle guard) where they belong:

* ``paged_rest`` — offset pagination (``?limit=50&page=N``,
  task.ts:116-127). The reader asks the server for the total count once,
  then emits ONE INPUT PARTITION PER PAGE RANGE — pages are fetched in
  parallel across executors. This is the scalable form the reference's
  sequential loop cannot express.
* ``cursor_rest`` — token pagination (``next_page_token``,
  task.ts:143-166). Inherently sequential, single partition, with the
  reference's repeat-token cycle guard (task.ts:160-166). The scalable
  pattern at 100 TB is land-then-read: this source drains the cursor to
  object storage once, then analytics run on the landed parquet.

Auth (S6/S7: token exchange before scanning) is modeled by an optional
``auth_token`` option forwarded as a header — the exchange itself is a
driver-side pre-step exactly as in the reference (task.ts:97-106).

Options (both sources): ``url``, ``schema_ddl`` (DDL column list; fields
are pulled from each JSON item by name), ``limit`` (page size, default
50), ``auth_token``. Network I/O uses only stdlib urllib and runs on
executors.
"""

from __future__ import annotations

import json
import math
import urllib.request
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

DEFAULT_PAGE_SIZE = 50  # task.ts:119
MAX_PAGES = 100_000  # runaway-cursor backstop


def _fetch_json(url: str, token: str | None) -> dict:
    req = urllib.request.Request(url)
    if token:
        req.add_header("x-verkada-auth", token)
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.load(resp)


def _row(item: dict, fields: list[str]) -> tuple:
    return tuple(item.get(f) for f in fields)


class _PageRange(InputPartition):
    def __init__(self, start_page: int, end_page: int):
        self.start_page = start_page
        self.end_page = end_page


class PagedRestReader(DataSourceReader):
    """Offset pagination, parallel by page range."""

    def __init__(self, schema: StructType, options: dict):
        self.fields = [f.name for f in schema.fields]
        self.url = options["url"]
        self.limit = int(options.get("limit", DEFAULT_PAGE_SIZE))
        self.token = options.get("auth_token")
        self.pages_per_task = int(options.get("pages_per_task", 4))

    def partitions(self) -> list[InputPartition]:
        # One cheap HEAD-style call for the count (the reference reads
        # `total` off every page response, task.ts:127).
        first = _fetch_json(f"{self.url}?limit=1&page=1", self.token)
        total = int(first["total"])
        n_pages = max(1, math.ceil(total / self.limit))
        return [
            _PageRange(p, min(p + self.pages_per_task, n_pages + 1))
            for p in range(1, n_pages + 1, self.pages_per_task)
        ]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        for page in range(partition.start_page, partition.end_page):
            data = _fetch_json(
                f"{self.url}?limit={self.limit}&page={page}", self.token
            )
            for item in data.get("items", []):
                yield _row(item, self.fields)


class PagedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self):
        return self.options["schema_ddl"]

    def reader(self, schema: StructType) -> DataSourceReader:
        return PagedRestReader(schema, self.options)


class CursorRestReader(DataSourceReader):
    """Token pagination: sequential, with the O6 cycle guard."""

    def __init__(self, schema: StructType, options: dict):
        self.fields = [f.name for f in schema.fields]
        self.url = options["url"]
        self.token = options.get("auth_token")

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(0)]  # a cursor cannot be split

    def read(self, partition) -> Iterator[tuple]:
        page_token: str | None = None
        for _ in range(MAX_PAGES):
            url = self.url
            if page_token:
                sep = "&" if "?" in url else "?"
                url = f"{url}{sep}page_token={page_token}"
            data = _fetch_json(url, self.token)
            for item in data.get("items", []):
                yield _row(item, self.fields)
            nxt = data.get("next_page_token")
            # termination: null/absent token, or token failed to advance
            # (the reference's repeat guard, task.ts:160-166)
            if not nxt or nxt == page_token:
                return
            page_token = nxt


class CursorRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cursor_rest"

    def schema(self):
        return self.options["schema_ddl"]

    def reader(self, schema: StructType) -> DataSourceReader:
        return CursorRestReader(schema, self.options)


def register(spark) -> None:
    """Register both sources on a session."""
    spark.dataSource.register(PagedRestDataSource)
    spark.dataSource.register(CursorRestDataSource)
