"""First-principles replay of the JDK RNG chains Spark ML seeds from.

Spark ML's LSH families draw their hash parameters from
``java.util.Random`` (the 48-bit LCG of the JDK spec):

- ``MinHashLSH`` draws ``numHashTables`` (a, b) integer pairs and
  hashes a sparse indicator vector to
  ``min over nonzero indices i of ((1 + i) * a + b) mod HASH_PRIME``
  (Apache Spark, mllib ml/feature/MinHashLSH.scala).
- ``BucketedRandomProjectionLSH`` draws normalized Gaussian unit
  vectors (JDK ``nextGaussian`` — Marsaglia polar over the same LCG)
  and hashes to ``floor(dot(x, v_t) / bucketLength)``
  (ml/feature/BucketedRandomProjectionLSH.scala).

Replaying those draws here lets a DuckDB oracle certify the ml.feature
hash chain value-by-value without the oracle ever touching the JVM —
the (a, b) pairs / unit-vector components become literals inside
generated SQL. ``tests/test_minhash_spec_values.py`` pins this module
against the actual ml.feature output (and the JDK's published
``new Random(42).nextInt()`` vectors), so an engine upgrade that
changes the RNG or the hash formula fails loudly there.

Public-knowledge provenance: the JDK java.util.Random specification
(LCG multiplier 0x5DEECE66D, 48-bit state, Marsaglia polar
nextGaussian) and the Apache Spark ML source cited above.
"""

from __future__ import annotations

import math

# Spark ML's MinHashLSH.HASH_PRIME (a prime > 2^30 per the source).
MINHASH_ML_PRIME = 2038074743

_MASK48 = (1 << 48) - 1
_MULT = 0x5DEECE66D


class JavaRandom:
    """java.util.Random: 48-bit LCG with the JDK-specified scramble."""

    def __init__(self, seed: int):
        self.seed = (seed ^ _MULT) & _MASK48
        self._next_gaussian: float | None = None

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

    def next_double(self) -> float:
        hi = self._next(26)
        lo = self._next(27)
        return ((hi << 27) + lo) / float(1 << 53)

    def next_gaussian(self) -> float:
        """Marsaglia polar method, exactly as the JDK specifies
        (caches the second variate like the JDK does)."""
        if self._next_gaussian is not None:
            g, self._next_gaussian = self._next_gaussian, None
            return g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        mult = math.sqrt(-2 * math.log(s) / s)
        self._next_gaussian = v2 * mult
        return v1 * mult


def minhash_ml_coefficients(
    seed: int, num_tables: int
) -> list[tuple[int, int]]:
    """Replay MinHashLSH's seeded (a, b) coefficient draws:
    a in [1, P-1], b in [0, P-2] via two next_int(P-1) calls per
    table, in table order."""
    r = JavaRandom(seed)
    return [
        (
            1 + r.next_int(MINHASH_ML_PRIME - 1),
            r.next_int(MINHASH_ML_PRIME - 1),
        )
        for _ in range(num_tables)
    ]


def brp_unit_vectors(
    seed: int, num_tables: int, dim: int
) -> list[list[float]]:
    """Replay BucketedRandomProjectionLSH's seeded random unit
    vectors: dim Gaussians per table, normalized to unit length."""
    r = JavaRandom(seed)
    out: list[list[float]] = []
    for _ in range(num_tables):
        v = [r.next_gaussian() for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v))
        out.append([x / norm for x in v])
    return out
