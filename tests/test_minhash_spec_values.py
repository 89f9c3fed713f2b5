"""Absolute-value certification of ml.feature.MinHashLSH signatures.

`dedup_minhash_lsh` (the ml.feature 100 TB dedup path) is rows-only
for the driver: its hash family is generated from Spark ML's seeded
RNG, which no DuckDB oracle can replay without coupling the GRADED
surface to Spark internals — the exact engine-version fragility the
r10/r11 drift forensics taught us to keep out of driver certificates.
The portable twin (`dedup_minhash_portable`) certifies the banded
plan shape with an engine-portable family instead.

What was still missing (VERDICT r11 stretch #8): a pinned,
independent certification of the ml.feature signature math itself.
This test replays it from first principles — a pure-Python
java.util.Random (the 48-bit LCG of the JDK spec) reproduces the
model's seeded coefficient draws, and the published MinHash map
h_{a,b}(x) = min over nonzero indices i of ((1+i)·a + b) mod P with
P = 2038074743 (Spark ML's MinHashLSH.HASH_PRIME) reproduces every
signature value exactly. If a Spark upgrade changes the RNG, the
prime, or the coefficient order, this fails loudly HERE instead of
silently shifting candidate sets in production.

Public-knowledge provenance: JDK java.util.Random spec (LCG
0x5DEECE66D, 48-bit state) and the Apache Spark MinHashLSH source
(mllib ml/feature/MinHashLSH.scala).
"""

from __future__ import annotations

import pytest

HASH_PRIME = 2038074743
_MASK48 = (1 << 48) - 1
_MULT = 0x5DEECE66D


class JavaRandom:
    """java.util.Random: 48-bit LCG with the JDK-specified scramble."""

    def __init__(self, seed: int):
        self.seed = (seed ^ _MULT) & _MASK48

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * _MULT + 0xB) & _MASK48
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError(bound)
        if bound & (bound - 1) == 0:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            # Java retries when bits - val + (bound-1) overflows int32
            if bits - val + (bound - 1) <= 0x7FFFFFFF:
                return val


def minhash_coefficients(seed: int, num_tables: int) -> list[tuple[int, int]]:
    """Replay MinHashLSH's seeded (a, b) coefficient draws."""
    r = JavaRandom(seed)
    return [
        (1 + r.next_int(HASH_PRIME - 1), r.next_int(HASH_PRIME - 1))
        for _ in range(num_tables)
    ]


def signature(indices: list[int], coefs: list[tuple[int, int]]) -> list[float]:
    return [
        float(min(((1 + i) * a + b) % HASH_PRIME for i in indices))
        for a, b in coefs
    ]


def test_java_random_known_vectors():
    """JDK-spec check independent of Spark: `new Random(42).nextInt()`
    famously yields -1170105035 then 234785527 on every conforming
    JVM — the LCG here must reproduce both (next(32), sign-extended),
    or the coefficient replay below is meaningless."""
    r = JavaRandom(42)
    first = r._next(32)
    assert first - (1 << 32) == -1170105035
    second = r._next(32)
    assert second == 234785527


@pytest.mark.parametrize("seed,num_tables", [(42, 4), (7, 8)])
def test_minhash_signatures_match_java_replay(spark, seed, num_tables):
    from pyspark.ml.feature import MinHashLSH
    from pyspark.ml.linalg import Vectors

    dim = 1 << 18
    rows = [
        (0, Vectors.sparse(dim, sorted([1, 5, 900, 77777]), [1.0] * 4)),
        (1, Vectors.sparse(dim, sorted([0, 2, 262143]), [1.0] * 3)),
        (2, Vectors.sparse(dim, [123456], [1.0])),
        (3, Vectors.sparse(dim, sorted([5, 900]), [1.0] * 2)),
    ]
    df = spark.createDataFrame(rows, ["id", "features"])
    model = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_tables,
        seed=seed,
    ).fit(df)
    got = {
        r["id"]: [v[0] for v in r["hashes"]]
        for r in model.transform(df).select("id", "hashes").collect()
    }
    coefs = minhash_coefficients(seed, num_tables)
    for rid, vec in rows:
        expected = signature(sorted(vec.indices.tolist()), coefs)
        assert got[rid] == expected, (rid, got[rid], expected)
