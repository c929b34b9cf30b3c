"""harvester_spark — a PySpark-native fulltext index + BM25 query engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
surfedushare/harvester's extract → normalize → index → search pipeline,
re-expressed Spark-first:

- ``corpus``     deterministic synthetic Common-Crawl-style corpus generator
- ``extract``    vectorized (Arrow/pandas) HTML→text extraction
- ``analysis``   analyzer chain (tokenize per language) shared index/query side
- ``docid``      global dense docID assignment (monotonic + offset, no zipWithIndex)
- ``index``      SPIMI-style inverted index build, varbyte block codec, catalog
- ``search``     BM25 scoring kernel, block-max WAND/intersection top-k, API
- ``operators``  dedup / similarity / text-stats / relational operator library
- ``streaming``  incremental ingest (merge-on-srn, delta postings, tombstones)

Reference behaviours are cited per-function as ``/root/reference/<path>:<lines>``
so parity can be checked; no code is copied from the reference.
"""

__version__ = "0.1.0"
