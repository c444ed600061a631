"""newsfeeds_crawler_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the dataflow semantics of the reference actor-based crawler
(CLLKazan/newsfeeds-crawler, studied at /root/reference) as a batch-iterative
URL-frontier + fetch scheduler over Iceberg-layout Parquet tables of
(image, caption) pairs:

- ``functions``  — URL canonicalization, image codecs, text analysis,
  crawl predicates (all built-in-Spark-first; Python only via pandas/Arrow).
- ``tablestore`` — snapshot-pointer state tables (checkpoint/resume substrate).
- ``synth``      — deterministic corpus + seed synthesis (seed=42).
- ``oracle``     — pure-Python reference-semantics simulator (the spec).
- ``operators``  — seen-set dedup, politeness admission, watermark,
  merge-upsert, dedup family (minhash/simhash/...), similarity search.
- ``plans``      — the micro-epoch DataFrame plan + crawl driver loop.

Nothing here is a port: the reference tells us WHAT to compute (see
SURVEY.md); the HOW is DataFrame/Catalyst end-to-end.
"""

__version__ = "0.1.0"
