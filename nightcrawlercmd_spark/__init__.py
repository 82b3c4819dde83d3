"""nightcrawlercmd_spark — a PySpark-native crawl engine.

A from-scratch rebuild of the capabilities of mpfund/NightCrawlerCmd
(reference surveyed in SURVEY.md) as an idiomatic Spark engine:

* ``sources/``    — deterministic synthetic corpus + parquet table IO
                    (Iceberg-shaped; see ``sources/tableio.py``).
* ``functions/``  — pure/vectorized functions: RFC-3986 URL
                    canonicalization, counter-based deterministic
                    hashing, pure-numpy image codecs (+PSNR, phash).
* ``operators/``  — frontier dequeue (window-ranked politeness),
                    bloom seen-set, mapInPandas fetch, link extract,
                    dedup / similarity / text-analysis operators.
* ``streaming/``  — the crawl round loop (driver-side micro-batch
                    iteration) + the sequential pure-Python oracle.
* ``plans/``      — report pipelines and the driver-oracle queries.
"""

__version__ = "0.1.0"
