"""Custom Python DataSource: the reference's numeric page-range crawl
frontier as a first-class Spark source.

The reference generates crawl work from numeric page ranges
(app.js:166-189 builds URL lists from range counters and fans them out
to workers). Here that generator IS a Spark data source
(`spark.read.format("page_range")`): the range is split into input
partitions, so the fetch/render seam parallelizes across executors
exactly like any file scan — at 100 TB-of-pages scale, partition count
(not a driver-side URL list) is what bounds per-task work. Uses the
pyspark 4 Python DataSource API (pyspark.sql.datasource).

The page body is a deterministic synthetic render by default (same
philosophy as sources/fixtures.py: no network by design). The HTTP swap
is SHIPPED, not hypothetical: pass ``option("base_url", ...)`` and each
partition fetches its page range with ``_fetch`` (stdlib urllib,
executor-side, no extra dependencies) instead of rendering — the
partitioning plumbing is identical either way. The loopback e2e test
(tests/test_fetch_seam.py) drives a real ``http.server`` through this
path end to end: discover -> fetch -> parse -> manifest commit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "url string, page_id bigint, status int, html string"


@dataclass
class PageRange(InputPartition):
    start: int  # inclusive
    end: int  # exclusive


def _fetch(base_url: str, source: str, page_id: int, timeout: float = 10.0) -> tuple[str, int, int, str]:
    """Real HTTP fetch of one page — the production body of the seam.

    Non-2xx responses are DATA, not errors (their status flows to the
    ``is_accessable_url`` gate downstream, reference app.js:43-96), so
    HTTPError is caught and surfaced as (status, body) like any row.
    Connection-level failures raise and fail the task — Spark's retry
    is the right layer for a dead server, unlike a 404."""
    import urllib.error
    import urllib.request

    url = f"{base_url.rstrip('/')}/{source}/p_{page_id}"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return (url, page_id, resp.status, resp.read().decode("utf-8", "replace"))
    except urllib.error.HTTPError as e:
        return (url, page_id, e.code, e.read().decode("utf-8", "replace"))


def _render(source: str, page_id: int) -> tuple[str, int, int, str]:
    url = f"https://example.com/devices/{source}/p_{page_id}"
    # every 29th page 404s — mirrors the fixtures' is_accessable_url gate
    status = 500 if page_id % 29 == 3 else 200
    html = (
        f'<div class="model">brand_{page_id % 7} model_{page_id}</div>'
        f'<span class="score">{page_id * 47}</span>'
    )
    return (url, page_id, status, html)


class PageRangeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = int(options.get("start", 0))
        self.end = int(options.get("end", 1000))
        self.num_partitions = int(options.get("numpartitions", 8))
        self.source = options.get("source", "gsmarena")
        # when set, pages are FETCHED from {base_url}/{source}/p_{id}
        # instead of synthetically rendered — the production fetch path
        self.base_url = options.get("base_url")

    def partitions(self):
        n = max(1, self.num_partitions)
        total = max(0, self.end - self.start)
        step = -(-total // n) if total else 1
        return [
            PageRange(lo, min(lo + step, self.end))
            for lo in range(self.start, self.end, step)
        ]

    def read(self, partition: PageRange):
        for page_id in range(partition.start, partition.end):
            if self.base_url:
                yield _fetch(self.base_url, self.source, page_id)
            else:
                yield _render(self.source, page_id)


class PageRangeDataSource(DataSource):
    """``spark.read.format("page_range").option("start", 0).option("end", N)``"""

    @classmethod
    def name(cls) -> str:
        return "page_range"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PageRangeReader:
        return PageRangeReader({k.lower(): v for k, v in self.options.items()})


def register_page_range_source(spark) -> None:
    spark.dataSource.register(PageRangeDataSource)
