"""news_crawler_ray — a Ray-Data-native crawl/frontier engine.

A brand-new engine with the query and data-processing capabilities of
OverDlive/news_crawler (reference surveyed in SURVEY.md), re-expressed
Ray-Data-first: every per-record transform is a vectorized
``map_batches`` over Arrow batches, stateful stages (seen-set shards,
politeness buckets, fetch sessions) are actor pools, and the wide steps
(frontier dedup, distinct+sort, stable-index assignment) are
``groupby``/``sort`` shuffles with explicit partitioning keys.

Layout:
  fixtures/   deterministic synthetic page-store / frontier generators
  functions/  vectorized scalar-function library (URL canon, hashing,
              IOC regexes, text stats, dates)
  stages/     Dataset stage builders (canonicalize, dedup, politeness,
              fetch, parse, near-dup, similarity, multimodal, index)
  state/      membership structures (counting bloom, cuckoo filter)
              and checkpoint manifests
  sources/    page-store readers
  pipelines/  the wave-loop crawl driver + the pure-Python oracle
"""

__version__ = "0.1.0"
