"""Frequent-items (heavy hitters) and Count-Min sketches — the
bounded-state answer to "what are the top domains / URLs / n-grams in
100 TB" when exact groupBy cardinality is itself the problem
(SURVEY.md §2.B.4 approx family, next to HLL/KLL/theta/Bloom).

Two classic mergeable summaries, from scratch (deterministic, no
engine-private state, Spark == local parity testable):

- **Misra-Gries / frequent-items** (Misra & Gries 1982; the merge
  rule is Agarwal et al. 2012 "Mergeable Summaries": sum counts
  pointwise, subtract the (k+1)-th largest, keep positives). The
  summary UNDERCOUNTS: true(x) - est(x) <= err, where err is the sum
  of every subtraction the summary absorbed — tracked exactly, so
  each reported item carries a certain interval [est, est + err].
  Any item with true frequency > err is guaranteed present.
- **Count-Min** (Cormode & Muthukrishnan 2005): depth x width
  counter matrix, blake2b double-hashing row positions (the Bloom
  filter's hashing scheme — functions/bloom.py), pointwise-sum
  merge. OVERCOUNTS: est >= true always, est <= true + eps*N with
  probability 1 - delta (eps = e/width, delta = e^-depth).

Spark shape (the build_bloom pattern): one partial per Arrow batch
computed inside mapInPandas — per-batch exact value_counts collapsed
into the summary by the merge rule, fully vectorized — then a
driver-side fold over #batches small rows. Nothing corpus-sized ever
reaches the driver: MG partials are <= k rows each, CMS partials are
depth*width*8 bytes each."""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass

import numpy as np
import pandas as pd

__all__ = [
    "CountMinSketch",
    "FreqSummary",
    "build_cms",
    "frequent_items",
    "mg_merge",
    "misra_gries",
]


# ------------------------------------------------------------------ #
# Misra-Gries
# ------------------------------------------------------------------ #
@dataclass(frozen=True)
class FreqSummary:
    """k-bounded frequent-items summary: item -> estimate (an exact
    LOWER bound on the true count), plus the total absorbed
    subtraction ``err`` (so true <= est + err) and the processed
    stream length ``n``."""

    counts: dict[str, int]
    err: int
    n: int
    k: int

    def intervals(self) -> list[tuple[str, int, int]]:
        """(item, lo, hi) sorted by estimate desc then item — hi is a
        certain upper bound, lo a certain lower bound."""
        return sorted(
            ((i, c, c + self.err) for i, c in self.counts.items()),
            key=lambda t: (-t[1], t[0]),
        )

    def guaranteed(self, min_count: int) -> list[str]:
        """Items certainly above ``min_count`` (lo >= min_count)."""
        return sorted(i for i, c in self.counts.items() if c >= min_count)


def _prune(counts: dict[str, int], k: int) -> tuple[dict[str, int], int]:
    """Keep the top-k by the merge rule: subtract the (k+1)-th
    largest count from everything, keep strictly positive remainders.
    Returns (pruned, subtracted). Deterministic: selection is by
    value only — ties at the threshold all drop together."""
    if len(counts) <= k:
        return counts, 0
    vals = sorted(counts.values(), reverse=True)
    thresh = vals[k]
    return {i: c - thresh for i, c in counts.items() if c > thresh}, thresh


def misra_gries(items, k: int) -> FreqSummary:
    """Reference/driver build: exact counts of the (bounded) input
    collapsed once by the merge rule. For true streams, fold chunks
    with mg_merge — the result bounds are identical maths."""
    exact: dict[str, int] = {}
    n = 0
    for x in items:
        if x is None:
            continue
        s = str(x)
        exact[s] = exact.get(s, 0) + 1
        n += 1
    counts, sub = _prune(exact, k)
    return FreqSummary(counts, sub, n, k)


def mg_merge(summaries: list[FreqSummary], k: int | None = None) -> FreqSummary:
    """Merge any number of summaries: pointwise sum, one global
    prune. err adds (each input's absorbed subtraction still bounds
    its own undercount) plus the new subtraction. Order-insensitive:
    the sum is commutative and the prune happens once."""
    if not summaries:
        return FreqSummary({}, 0, 0, k or 0)
    kk = k or max(s.k for s in summaries)
    total: dict[str, int] = {}
    err = 0
    n = 0
    for s in summaries:
        err += s.err
        n += s.n
        for i, c in s.counts.items():
            total[i] = total.get(i, 0) + c
    counts, sub = _prune(total, kk)
    return FreqSummary(counts, err + sub, n, kk)


def frequent_items(df, col: str, k: int = 64) -> FreqSummary:
    """Distributed build: one <=k-row partial per Arrow batch
    (value_counts -> prune, vectorized), merged IN SPARK — the
    merge rule is 'pointwise sum, subtract the (k+1)-th largest':
    a groupBy(item).sum over the partial rows plus a deterministic
    top-(k+1) limit gives everything the rule needs, so the driver
    collects exactly k+1 rows + one totals row regardless of batch
    count (a raw partial collect would be O(#batches * k) — the
    100 TB version of this op cannot ship that to the driver). The
    guarantee survives both levels because the error accounting is
    exact — parity with a local misra_gries build is bounds-exact,
    not just approximate (tested)."""
    from pyspark.sql import functions as F

    kk = int(k)

    def _partials(batches):
        for pdf in batches:
            vc = pdf[col].dropna().astype(str).value_counts()
            counts, sub = _prune(dict(vc), kk)
            yield pd.DataFrame(
                {
                    "item": list(counts) + [None],
                    "est": list(counts.values()) + [0],
                    "err": [0] * len(counts) + [int(sub)],
                    "n": [0] * len(counts) + [int(vc.sum())],
                }
            )

    part = df.select(col).mapInPandas(
        _partials, schema="item string, est long, err long, n long"
    )
    # the partial frame is referenced twice (totals + summed); both
    # are tiny aggregations but each re-runs the corpus-sized
    # mapInPandas without a cache — persist the <=k-per-batch rows
    part = part.persist()
    try:
        tot = part.where(F.col("item").isNull()).agg(
            F.sum("err").alias("err"), F.sum("n").alias("n")
        ).first()
        top = (
            part.where(F.col("item").isNotNull())
            .groupBy("item")
            .agg(F.sum("est").alias("est"))
            .orderBy(F.col("est").desc(), F.col("item").asc())
            .limit(kk + 1)
            .collect()
        )
    finally:
        part.unpersist()
    thresh = int(top[kk].est) if len(top) > kk else 0
    counts = {
        r.item: int(r.est) - thresh for r in top[:kk] if int(r.est) > thresh
    }
    return FreqSummary(
        counts, int(tot.err or 0) + thresh, int(tot.n or 0), kk
    )


# ------------------------------------------------------------------ #
# Count-Min
# ------------------------------------------------------------------ #
_CMS_MAGIC = b"CMS1"


class CountMinSketch:
    """depth x width uint64 counters; row positions via blake2b
    double hashing (h1 + row*h2 mod width — the Bloom scheme, one
    16-byte digest per key)."""

    def __init__(self, depth: int = 5, width: int = 2048, counts=None):
        self.depth = int(depth)
        self.width = int(width)
        self.counts = (
            np.zeros((self.depth, self.width), dtype=np.uint64)
            if counts is None
            else counts
        )
        self.n = int(self.counts.sum() // max(self.depth, 1))

    def _cols(self, key: str) -> np.ndarray:
        d = hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()
        h1, h2 = struct.unpack("<QQ", d)
        i = np.arange(self.depth, dtype=np.uint64)
        return (h1 + i * h2) % np.uint64(self.width)

    def add(self, key: str, count: int = 1) -> None:
        self.counts[np.arange(self.depth), self._cols(key)] += np.uint64(count)
        self.n += int(count)

    def estimate(self, key: str) -> int:
        return int(self.counts[np.arange(self.depth), self._cols(key)].min())

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("cannot merge CMS with different shapes")
        return CountMinSketch(self.depth, self.width, self.counts + other.counts)

    def serialize(self) -> bytes:
        return (
            _CMS_MAGIC
            + struct.pack("<II", self.depth, self.width)
            + self.counts.tobytes()
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "CountMinSketch":
        if data[:4] != _CMS_MAGIC:
            raise ValueError("not a serialized CountMinSketch")
        d, w = struct.unpack("<II", data[4:12])
        counts = np.frombuffer(data[12:], dtype=np.uint64).reshape(d, w).copy()
        return cls(d, w, counts)


def build_cms(df, col: str, depth: int = 5, width: int = 2048) -> CountMinSketch:
    """Distributed build, bit-identical to a local build over the
    same multiset: ONE partial matrix per PARTITION (the mapInPandas
    iterator spans the whole partition — value_counts per Arrow
    batch, np.add.at per distinct key into a single accumulator),
    then a treeReduce fold of the matrices IN THE EXECUTORS — the
    driver receives exactly one depth*width*8-byte matrix however
    many partitions the corpus has (collecting per-partition
    partials would be O(#partitions * matrix) driver memory — not a
    100 TB shape). uint64 addition is associative-commutative, so
    the tree fold is order-independent and exact."""
    d, w = int(depth), int(width)

    def _partials(batches):
        cms = CountMinSketch(d, w)
        seen = False
        for pdf in batches:
            seen = True
            for key, cnt in pdf[col].dropna().astype(str).value_counts().items():
                cms.add(key, int(cnt))
        if seen:
            yield pd.DataFrame({"m": [cms.counts.tobytes()]})

    parts = df.select(col).mapInPandas(_partials, schema="m binary")
    mats = parts.rdd.map(
        lambda r: np.frombuffer(bytes(r.m), dtype=np.uint64).reshape(d, w)
    )
    out = CountMinSketch(d, w)
    # treeAggregate with a zero matrix instead of isEmpty()+treeReduce:
    # isEmpty() re-executed the corpus scan just to probe emptiness;
    # the zeroValue covers the empty case in a single scan.
    zero = np.zeros((d, w), dtype=np.uint64)
    out.counts = mats.treeAggregate(
        zero, lambda a, b: a + b, lambda a, b: a + b, depth=2
    ).copy()
    out.n = int(out.counts.sum() // max(d, 1))
    return out
