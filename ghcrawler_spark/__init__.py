"""ghcrawler_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the query & data-processing capabilities of microsoft/ghcrawler
(reference at /root/reference, see SURVEY.md for the full operator inventory
with file:line citations) as idiomatic Spark DataFrame plans:

- a four-tier URL frontier (soon/normal/later + deadletter) with weighted,
  deterministic tier rotation (reference: providers/queuing/queueSet.js:46-65)
- per-host politeness top-k + token-bucket budgets
  (reference: providers/limiting/*, providers/fetcher/tokenFactory.js:41-93)
- a sharded Bloom-filter URL-seen set with exact anti-join confirmation
  (replacing the Redis request tracker,
  reference: providers/queuing/redisRequestTracker.js:17-53)
- batch crawl rounds with snapshot checkpointing and exact resume
  (reference at-least-once ack-last loop: lib/crawler.js:92-107,213-302)
- training-data pipeline operators: exact/MinHash-LSH/SimHash/Jaccard/cosine
  dedup, ANN similarity search, text quality analysis, multimodal plumbing.

Everything is DataFrame-first: built-in pyspark.sql.functions on the hot path,
Arrow-batched pandas UDFs only where Catalyst can't express the semantics
(image decode, Bloom shard probe).
"""

__version__ = "0.1.0"
