"""Mergeable Bloom filter (SURVEY.md §2.B.4 sketch family) — the
membership pre-filter a long-lived ingestion pipeline keeps so a
backfill can ask "which of these 10^9 candidate keys have we already
ingested" without joining against the full history.

Design:
- Deterministic everywhere: positions come from blake2b(key) split
  into two 64-bit halves with Kirsch-Mitzenmacher double hashing
  (pos_i = h1 + i·h2 mod m). No engine-private hash, no RNG — the
  same key sets the same bits on any machine, any day, any engine,
  which is what makes the MERGE contract exact: bloom(A) | bloom(B)
  is bit-identical to bloom(A ∪ B).
- Mergeable by bitwise OR — the same partial/rollup shape as the
  HLL/KLL/Theta helpers in sketches.py: each partition builds a
  fixed-size bitmap, the driver ORs a handful of bitmaps (one per
  Arrow batch), and the result serializes to m/8 bytes + a header.
- Spark integration is mapInPandas (bitmap per batch — worker memory
  is one bitmap, never the keys) and a broadcast-closure pandas UDF
  for membership filtering: pruning a 100 TB scan down to probable
  members costs a map-side filter, no shuffle, no join.

False positives are tunable (m bits, k hashes); false negatives are
impossible — the tests pin both.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterable

import numpy as np
import pandas as pd

_MAGIC = b"SBF1"


class BloomFilter:
    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        if m_bits % 8:
            raise ValueError("m_bits must be a multiple of 8")
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = (
            np.zeros(self.m // 8, dtype=np.uint8) if bits is None else bits
        )

    def _positions(self, key: str) -> np.ndarray:
        d = hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()
        h1, h2 = struct.unpack("<QQ", d)
        i = np.arange(self.k, dtype=np.uint64)
        return (h1 + i * h2) % np.uint64(self.m)

    def add(self, key: str) -> None:
        pos = self._positions(key)
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def contains(self, key: str) -> bool:
        pos = self._positions(key)
        return bool(np.all(self.bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)))

    @classmethod
    def from_items(cls, items: Iterable[str], m_bits: int = 1 << 20, k: int = 5) -> "BloomFilter":
        bf = cls(m_bits, k)
        for it in items:
            bf.add(it)
        return bf

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot merge Bloom filters with different (m, k)")
        return BloomFilter(self.m, self.k, self.bits | other.bits)

    def serialize(self) -> bytes:
        return _MAGIC + struct.pack("<QI", self.m, self.k) + self.bits.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "BloomFilter":
        if data[:4] != _MAGIC:
            raise ValueError("not a serialized BloomFilter")
        m, k = struct.unpack("<QI", data[4:16])
        bits = np.frombuffer(data[16:], dtype=np.uint8).copy()
        if len(bits) != m // 8:
            raise ValueError("truncated BloomFilter payload")
        return cls(m, k, bits)

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).mean())


def build_bloom(df, col: str, m_bits: int = 1 << 20, k: int = 5) -> BloomFilter:
    """Distributed build: ONE bitmap per PARTITION via mapInPandas
    (the iterator spans the partition; keys never leave the worker),
    OR-folded in the EXECUTORS with treeReduce — the driver receives
    a single m/8-byte bitmap however many partitions the corpus has
    (per-batch driver collects were O(#batches × m/8), round-5
    continuation fix). OR is associative-commutative, so the tree
    fold stays bit-identical to a local from_items build over the
    same key set."""
    m, kk = int(m_bits), int(k)

    def _bitmaps(batches):
        bf = BloomFilter(m, kk)
        seen = False
        for pdf in batches:
            seen = True
            for v in pdf[col]:
                if v is not None:
                    bf.add(str(v))
        if seen:
            yield pd.DataFrame({"bitmap": [bf.bits.tobytes()]})

    parts = df.select(col).mapInPandas(_bitmaps, schema="bitmap binary")
    bitmaps = parts.rdd.map(
        lambda r: np.frombuffer(bytes(r.bitmap), dtype=np.uint8)
    )
    out = BloomFilter(m, kk)
    # treeAggregate with a zero bitmap instead of isEmpty()+treeReduce:
    # isEmpty() executed the corpus-sized mapInPandas scan a second
    # time just to probe for the empty case; the aggregate's zeroValue
    # handles empty input for free, so the keys are hashed exactly once.
    zero = np.zeros(m // 8, dtype=np.uint8)
    out.bits = bitmaps.treeAggregate(
        zero, lambda a, b: a | b, lambda a, b: a | b, depth=2
    ).copy()
    return out


def filter_might_contain(df, col: str, bloom: BloomFilter, negate: bool = False):
    """Keep rows whose ``col`` is PROBABLY in the filter (or definitely
    not, with ``negate``) — a map-side prune with the serialized filter
    shipped once per executor in the UDF closure. ``negate=True`` is
    the ingestion-dedup shape: keep only keys never seen before (exact:
    Bloom has no false negatives, so no new key is ever dropped —
    a false positive only re-checks a key downstream)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    # deserialize ONCE here: the pickled closure ships the ready
    # BloomFilter (numpy bitmap) to each executor a single time —
    # deserializing inside the UDF body would re-copy the m/8-byte
    # bitmap on every Arrow batch for pure overhead
    bf = BloomFilter.deserialize(bloom.serialize())

    @pandas_udf("boolean")
    def _member(keys: pd.Series) -> pd.Series:
        return keys.map(lambda v: v is not None and bf.contains(str(v)))

    pred = _member(F.col(col))
    return df.where(~pred if negate else pred)
