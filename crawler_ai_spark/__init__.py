"""crawler_ai_spark — a from-scratch PySpark-native crawl/extraction engine.

Re-expresses the query semantics of the reference repo
``jayceho3203/crawler-ai`` (an asyncio/Scrapy job-board scraper) as a
partition-parallel Spark engine over Common-Crawl-style page tables:

- ``sources``   : fixture/page-table generators, sitemap & embedded-JSON sources
- ``functions`` : vectorized (pandas/Arrow) parse + extraction UDFs and
                  built-in-expression builders (URL canonicalization, email /
                  phone / social extraction, job-field regexes, scoring)
- ``operators`` : frontier priority/budget windows, URL-seen dedup
                  (bloom + exact anti-join), job dedup, top-k
- ``plans``     : the multi-batch crawl loop (frontier expansion) with
                  checkpointed, resumable state and per-partition metrics
- ``streaming`` : optional Structured Streaming demos over the events table

Design notes (scale-first):
- every dataset is a DataFrame; no RDDs
- per-row Python is confined to four Arrow-batched pandas UDFs
  (parse_page, canonicalize, phone extraction, bloom probe)
- all other logic is built-in ``pyspark.sql.functions`` expressions so
  Catalyst can push filters/prune columns and codegen stays JVM-side
"""

__version__ = "0.1.0"
