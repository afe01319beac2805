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

Auth (S6/S7: token exchange before scanning) is a real driver-side
pre-step in :mod:`.auth` — ``exchange_token`` POSTs the API key for a
bearer (task.ts:97-106), ``fetch_stream_token`` pulls the scoped JWT +
ACL lists (task.ts:129-141) — whose results feed the ``auth_token``
option here (forwarded as the ``x-verkada-auth`` header) and the ACL
broadcast join in ``pipeline.features.acl_flag``.

Options (both sources): ``url``, ``schema_ddl`` (DDL column list; fields
are pulled from each JSON item by name), ``limit`` (page size, default
50), ``auth_token``, ``mode`` (``FAILFAST`` default — a wrong-typed
field aborts the scan, the reference's ``.typed()`` throw,
task.ts:155-158; ``PERMISSIVE`` — the violating item is quarantined
into a declared ``_corrupt_record`` column, Spark's JSON-reader
convention). Network I/O uses only stdlib urllib and runs on
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


#: declared-type -> acceptable Python types for an incoming JSON value.
#: bool is checked before int (bool subclasses int in Python); ints are
#: acceptable doubles (JSON has one number type).
_TYPE_OK = {
    "string": lambda v: isinstance(v, str),
    "bigint": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "int": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "double": lambda v: isinstance(v, (int, float))
    and not isinstance(v, bool),
    "float": lambda v: isinstance(v, (int, float))
    and not isinstance(v, bool),
    "boolean": lambda v: isinstance(v, bool),
}


class _ItemTyper:
    """Per-item schema enforcement — the reference's ``.typed()`` gate
    (task.ts:155-158): every page is validated against the declared
    schema BEFORE rows enter the engine, and the v1.17.0 null-token
    fix's contract is that a violating payload aborts the scan rather
    than flowing through as garbage.

    * ``mode=FAILFAST`` (default, the reference's throw): the first
      wrong-typed field raises with the field, declared type, and
      offending value — the task dies and the read aborts.
    * ``mode=PERMISSIVE``: Spark's JSON-reader convention — the whole
      item is quarantined: data fields null, raw item JSON in the
      ``_corrupt_record`` column when the schema declares one.
    """

    CORRUPT = "_corrupt_record"

    def __init__(self, schema: StructType, options: dict, source: str):
        self.fields = [f.name for f in schema.fields]
        self.types = [f.dataType.simpleString() for f in schema.fields]
        self.mode = options.get("mode", "FAILFAST").upper()
        if self.mode not in ("FAILFAST", "PERMISSIVE"):
            raise ValueError(f"{source}: unknown mode {self.mode!r}")
        self.source = source
        self.corrupt_idx = (
            self.fields.index(self.CORRUPT)
            if self.CORRUPT in self.fields
            else None
        )

    def row(self, item: dict) -> tuple:
        vals: list = []
        for i, (name, typ) in enumerate(zip(self.fields, self.types)):
            if i == self.corrupt_idx:
                vals.append(None)
                continue
            v = item.get(name)
            if v is None:
                vals.append(None)
                continue
            check = _TYPE_OK.get(typ)
            if check is not None and not check(v):
                if self.mode == "FAILFAST":
                    raise ValueError(
                        f"{self.source}: field {name!r} expected {typ} "
                        f"but page item carried {v!r} "
                        f"({type(v).__name__}) — FAILFAST abort "
                        "(reference .typed() throw, task.ts:155-158)"
                    )
                quarantined = [None] * len(self.fields)
                if self.corrupt_idx is not None:
                    quarantined[self.corrupt_idx] = json.dumps(item)
                return tuple(quarantined)
            vals.append(v)
        return tuple(vals)


class _PageRange(InputPartition):
    def __init__(self, start_page: int, end_page: int):
        self.start_page = start_page
        self.end_page = end_page


class PagedRestReader(DataSourceReader):
    """Offset pagination, parallel by page range."""

    def __init__(self, schema: StructType, options: dict):
        self.typer = _ItemTyper(schema, options, "paged_rest")
        self.url = options["url"]
        self.limit = int(options.get("limit", DEFAULT_PAGE_SIZE))
        self.token = options.get("auth_token")
        self.pages_per_task = int(options.get("pages_per_task", 4))
        # Indexing contract: ``first_page`` is the index of the first
        # page (default 1; the reference API is 0-indexed — its loop
        # starts at page=0 and runs while total > 50*page,
        # task.ts:117-127 — so reference-style servers need
        # first_page=0). The count probe asks for 1 item of the first
        # page and requires a ``total`` field in the response; for APIs
        # without ``total``, use the cursor source or land-then-read.
        self.first_page = int(options.get("first_page", 1))

    def partitions(self) -> list[InputPartition]:
        # One cheap HEAD-style call for the count (the reference reads
        # `total` off every page response, task.ts:127).
        probe = f"{self.url}?limit=1&page={self.first_page}"
        total = int(_fetch_json(probe, self.token)["total"])
        n_pages = max(1, math.ceil(total / self.limit))
        last = self.first_page + n_pages  # exclusive
        return [
            _PageRange(p, min(p + self.pages_per_task, last))
            for p in range(self.first_page, last, self.pages_per_task)
        ]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        for page in range(partition.start_page, partition.end_page):
            data = _fetch_json(
                f"{self.url}?limit={self.limit}&page={page}", self.token
            )
            for item in data.get("items", []):
                yield self.typer.row(item)


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
        self.typer = _ItemTyper(schema, options, "cursor_rest")
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
                yield self.typer.row(item)
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
