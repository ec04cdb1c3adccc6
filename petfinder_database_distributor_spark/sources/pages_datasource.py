"""G1+S2 as a REAL Spark table source: a Python Data Source (Spark 4
``spark.dataSource.register``) that enumerates the reference's work list —
page range × pet type (``server.py:350-375``) — and "fetches" each search
page (fixture-deterministic, like sources/fetch.py), partitioned by page
ranges so the scan parallelizes like any other source.

This is the table-source restatement of SURVEY.md §2.1 S1/S2: instead of
``urls.withColumn(html, fetch_udf(url))``, downstream plans just
``spark.read.format("pet_pages").option(...)`` and get (page, pet_type,
url, html) rows; swap the fixture body for real HTTP and nothing else
changes.

The classes are built inside a factory so cloudpickle serializes them BY
VALUE — executors' Python workers need not have this package importable.
"""

from __future__ import annotations

SCHEMA = "page int, pet_type string, url string, html string"


def make_pet_pages_datasource():
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class PageRange(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class PetPagesReader(DataSourceReader):
        def __init__(self, options):
            self.n_pages = int(options.get("n_pages", 100))
            self.n_partitions = int(options.get("n_partitions", 8))

        def partitions(self):
            per = max(1, -(-self.n_pages // self.n_partitions))
            return [
                PageRange(lo, min(lo + per, self.n_pages + 1))
                for lo in range(1, self.n_pages + 1, per)
            ]

        def read(self, part):
            # Yield ONE arrow RecordBatch per partition instead of per-row
            # tuples: the Python worker then ships a single Arrow buffer to
            # the JVM rather than pickling each row — the supported
            # fast path for Python Data Sources.
            import pyarrow as pa

            pages, types, urls, htmls = [], [], [], []
            for page in range(part.start, part.end):
                for ti, pet_type in enumerate(("dog", "cat")):
                    url = (
                        "https://www.petfinder.com/search/"
                        f"{pet_type}s-for-adoption/us/?page={page}"
                    )
                    # 12 fixed href slots (link_scraper.py:100-113); slot i
                    # empty when (page + i) % 5 == 0 — deterministic, so the
                    # oracle can restate the expected fan-out directly.
                    slots = []
                    for i in range(1, 13):
                        if (page + i) % 5 != 0:
                            key = (page * 2 + ti) * 12 + i
                            slots.append(f'<a href="/pet/{key}/details/"/>')
                        else:
                            slots.append('<a href=""/>')
                    pages.append(page)
                    types.append(pet_type)
                    urls.append(url)
                    htmls.append(f"<page>{''.join(slots)}</page>")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(pages, pa.int32()),
                    pa.array(types, pa.string()),
                    pa.array(urls, pa.string()),
                    pa.array(htmls, pa.string()),
                ],
                names=["page", "pet_type", "url", "html"],
            )

    class PetPagesDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "pet_pages"

        def schema(self) -> str:
            return SCHEMA

        def reader(self, schema):
            return PetPagesReader(self.options)

    return PetPagesDataSource


# Registration is idempotent per SparkSession but costs a py4j round-trip
# plus cloudpickle of the factory every call — memoize on the application
# id so repeated query invocations (bench loops, the driver's repeated
# collects) pay it once.
_REGISTERED: set[str] = set()


def register_pet_pages(spark) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _REGISTERED:
        return
    spark.dataSource.register(make_pet_pages_datasource())
    _REGISTERED.add(app_id)
