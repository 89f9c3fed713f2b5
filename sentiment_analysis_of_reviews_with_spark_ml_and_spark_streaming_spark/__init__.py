"""PySpark-native analytics engine with the query + data-processing
capabilities of the reference repo
(ridafathima106/Sentiment-Analysis-of-Reviews-with-Spark-ML-and-Spark-Streaming),
re-expressed Spark-first.

Design principles (SURVEY.md §7):
- DataFrame/SQL everywhere; Catalyst does pushdown/pruning/join planning.
- No row-at-a-time Python UDFs in hot paths: text cleaning is
  ``regexp_replace``/``when`` chains, sentiment is a broadcast-lexicon
  native expression, heavy custom ops are Arrow-batched pandas UDFs.
- Dim joins broadcast; AQE on; explicit schemas; parquet for internal
  stages.
- Scale-path variants (MinHash-LSH dedup, LSH ANN) alongside exact
  brute-force baselines used as correctness oracles.
"""

__version__ = "0.1.0"
