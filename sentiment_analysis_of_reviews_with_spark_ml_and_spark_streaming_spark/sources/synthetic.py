"""Custom Python DataSource (Spark 4.0 API): synthetic document corpus.

The modern extension point for sources Spark has no connector for —
implemented in pure Python, registered per-session, planned and
executed like any native source (one task per ``InputPartition``).
This one generates a DETERMINISTIC synthetic corpus shaped like the
``documents`` table (doc_id, text, lang, source, n_chars), used by
stress tests to scale dedup/search fixtures WITHOUT shipping data:
content derives from md5(seed, id), so any worker regenerates any
partition independently — the property that makes a synthetic source
preferable to a parquet fixture at 100 TB test scale.

Scale behaviors demonstrated (and tested in
tests/test_python_datasource.py):

- **partition-parallel**: the id range splits into ``n_partitions``
  independent ranges; no driver-side generation, no shuffle.
- **filter pushdown** (Spark 4.1 ``pushFilters``): doc_id range
  predicates narrow the GENERATED range — the source never yields
  rows a ``doc_id < N`` query will drop. Non-range filters are
  returned to Spark for post-evaluation (the contract: returned
  filters are applied by Spark, absorbed ones must be exact).
- **planted duplication**: every 5th doc repeats the previous doc's
  text (when ``dup_fraction`` > 0), giving dedup stress tests a known
  exact-duplicate rate with zero coordination.

The streaming leg (``SyntheticDocsStreamReader``) emits
``docs_per_batch`` docs per micro-batch with checkpointable offsets
and exact replay — see its docstring.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

_VOCAB = (
    "spark join filter scan shuffle batch stream state window "
    "vector token corpus dedup index bucket merge sort hash range"
).split()
# tail vocabulary size: hashed word-ids beyond the 20 common heads.
# A realistic (zipf-ish) vocabulary matters: with ONLY 20 words every
# doc shares most shingles and MinHash banding degenerates into an
# all-pairs candidate explosion (measured: OOM at 200k docs) — the
# head/tail split keeps common-word structure for BPE/heavy-hitter
# realism while giving near-dup ops honest selectivity.
_TAIL_VOCAB = 5000

_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _doc_text(seed: int, content_id: int) -> str:
    h = hashlib.md5(f"{seed}:{content_id}".encode()).digest()
    n_words = 8 + h[0] % 25
    words = []
    for w in range(n_words):
        hw = hashlib.md5(f"{seed}:{content_id}:{w}".encode()).digest()
        if hw[2] < 96:  # ~37% head words (zipf-ish common mass)
            words.append(_VOCAB[hw[0] % len(_VOCAB)])
        else:
            words.append(
                f"w{int.from_bytes(hw[:2], 'big') % _TAIL_VOCAB}"
            )
    return " ".join(words)


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.dup_every = int(options.get("dup_every", 5))
        self.seed = int(options.get("seed", 7))
        # effective id range; narrowed by pushFilters
        self.lo = 0
        self.hi = self.n_docs

    def pushFilters(self, filters):
        for f in filters:
            col = getattr(f, "attribute", None)
            val = getattr(f, "value", None)
            if col == ("doc_id",) and isinstance(val, int):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, val)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, val + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, val)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, val + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, val)
                    self.hi = min(self.hi, val + 1)
                    continue
            yield f  # not absorbed — Spark re-applies it

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, min(self.n_partitions, hi - lo or 1))
        step = max(1, (hi - lo + n - 1) // n)
        return [
            _RangePartition(i, min(i + step, hi))
            for i in range(lo, hi, step)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition):
        for i in range(partition.lo, partition.hi):
            content_id = (
                i - 1
                if self.dup_every and i % self.dup_every == self.dup_every - 1
                else i
            )
            text = _doc_text(self.seed, content_id)
            lang = "en" if i % 10 else "de"
            source = f"synthetic/{i % 4}"
            yield (i, text, lang, source, len(text))


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming leg: ``docs_per_batch`` new docs per micro-batch with
    monotonically increasing doc_ids.

    Offsets are ``{"doc_id": next_id}`` dicts — Spark checkpoints them,
    and because content is a pure function of (seed, id),
    ``readBetweenOffsets`` replays any committed range EXACTLY on
    failure recovery: the source is deterministic-replayable, which is
    the property exactly-once sinks need from a source. Replay
    equivalence is asserted in
    tests/test_python_datasource.py::test_stream_source_replay_exact.
    """

    def __init__(self, options):
        self.docs_per_batch = int(options.get("docs_per_batch", 100))
        self.dup_every = int(options.get("dup_every", 5))
        self.seed = int(options.get("seed", 7))
        # 0 = unbounded. A bounded corpus makes the source DRAINABLE:
        # read() returns an empty batch at the cap, so
        # processAllAvailable()/availableNow terminate — without a cap
        # a self-generating source always has "more available" and
        # drain-style triggers never return.
        self.max_docs = int(options.get("max_docs", 0))

    def initialOffset(self) -> dict:
        return {"doc_id": 0}

    def _rows(self, lo: int, hi: int):
        for i in range(lo, hi):
            content_id = (
                i - 1
                if self.dup_every and i % self.dup_every == self.dup_every - 1
                else i
            )
            text = _doc_text(self.seed, content_id)
            yield (i, text, "en" if i % 10 else "de", f"synthetic/{i % 4}", len(text))

    def read(self, start: dict):
        lo = start["doc_id"]
        hi = lo + self.docs_per_batch
        if self.max_docs:
            hi = min(hi, self.max_docs)
        # materialized, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator (generators can't be)
        return iter(list(self._rows(lo, hi))), {"doc_id": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(start["doc_id"], end["doc_id"])))

    def commit(self, end: dict) -> None:
        pass  # stateless source: nothing to release


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` (batch) or
    ``spark.readStream.format("synthetic_docs")`` (stream) after
    ``spark.dataSource.register(SyntheticDocsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    # pushFilters is gated by a conf (default false in 4.1); a reader
    # that implements it FAILS planning with the conf off, so enabling
    # it here is part of registration, not tuning
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
