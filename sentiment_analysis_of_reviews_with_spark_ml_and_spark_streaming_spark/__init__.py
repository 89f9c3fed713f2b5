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

from .session import get_spark  # noqa: E402,F401
from .sources.io import (  # noqa: E402,F401
    load_events,
    load_table,
    load_tables,
    read_csv,
    write_csv,
    write_parquet,
)


def all_queries():
    """Named query registry (lazy import: pulls in ml/streaming deps)."""
    from .plans.queries import QUERIES

    return dict(QUERIES)


def all_oracle_sql():
    from .plans.queries import ORACLE

    return dict(ORACLE)
