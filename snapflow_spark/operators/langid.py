"""Trained language identification — the CCNet/C4 pipeline's FIRST
text gate (fastText-style: multinomial logistic regression over hashed
character-n-gram frequencies, Joulin et al. 2016's bag-of-ngrams
recipe), built on the same distributed-LR machinery as the trained
quality classifier (operators/classifier.py).

Why trained, not heuristic: the engine has carried a stopword-marker
`lang_id_expr` (functions/text.py) since round 3 — fine for the five
fixture languages, useless for a real WARC→WET pipeline where no
`lang` column exists and 100+ languages appear. Character n-grams are
the standard signal (scripts and orthography separate most languages
in 2-3 chars); a linear model over hashed counts is cheap enough to
run corpus-wide and exactly what fastText's lid.176 does, minus the
embedding layer.

Plan shape (the classifier module's cost model, K-class):
- FEATURIZE ONCE: one corpus scan; per Arrow batch, each text is
  lowercased / whitespace-collapsed / space-padded, codepoints become
  a numpy uint64 array, and every n-gram hashes by a vectorized
  polynomial roll (shifted-slice Horner — no per-gram python, no
  hashlib in the row path) into `num_buckets`. Output is the same
  sparse (idx, val) L1-normalized frame classifier.featurize_docs
  emits, ~tens of bytes per doc.
- TRAIN: full-batch softmax regression; each iteration is one
  mapInPandas over the persisted feature frame producing a partial
  ((D+1)·K gradient | loss | n) vector per partition, treeAggregate-
  folded in executors — the driver holds O(D·K) floats (4096×K),
  never rows.
- PREDICT: one fused pass — featurize + X·W softmax inside the same
  Arrow batch, appending (lang_pred, lang_prob). A confidence
  threshold routes low-margin rows to 'und' (undetermined), the
  CLD/fastText convention, so downstream filters are plain WHEREs
  and a quarantine split is `WHERE lang_pred = 'und'`.

Determinism: featurization is bit-stable (integer counts, uint64
wraparound hashing — no rand, no dict order); predictions are argmax
over float64 dot products and stable under repartition (pinned by
test). Training folds partials in scheduling order, so weights agree
across runs to ~1e-12 relative — the classifier module's convention,
property-tested on holdout accuracy rather than value hashes.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snapflow_spark.operators.classifier import _flatten_sparse

__all__ = [
    "LangIdModel",
    "featurize_chars",
    "predict_lang",
    "train_lang_id",
]

_FNV = np.uint64(1099511628211)
_MIX = np.uint64(2654435761)
_MASK = (1 << 64) - 1


def _salt_seed(salt: str) -> np.uint64:
    h = hashlib.sha256(salt.encode("utf-8")).digest()
    return np.uint64(int.from_bytes(h[:8], "big"))


def _char_gram_buckets(
    text: str, ns: tuple[int, ...], num_buckets: int, seed: np.uint64
) -> np.ndarray:
    """All char-n-gram bucket ids of one normalized text, vectorized:
    Horner-fold the codepoint array over shifted slices (n multiplies
    per n, not per gram), mix with the salt seed, mod buckets.
    uint64 wraparound is deterministic everywhere numpy runs."""
    norm = " " + " ".join(text.lower().split()) + " "
    a = np.frombuffer(norm.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    parts = []
    with np.errstate(over="ignore"):
        for n in ns:
            if a.size < n:
                continue
            m = a.size - n + 1
            h = np.zeros(m, dtype=np.uint64)
            for j in range(n):
                h = h * _FNV + a[j : j + m]
            parts.append(((h ^ seed) * _MIX) % np.uint64(num_buckets))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts).astype(np.int64)


def featurize_chars(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    ngrams: tuple[int, ...] = (1, 2, 3),
    salt: str = "langid-v1",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """One corpus scan -> (id [, extra], idx array<int>, val
    array<double>): sparse hashed char-n-gram L1 frequencies — the
    character twin of classifier.featurize_docs (same sparse schema,
    so the gradient/scoring folds are shared). NULL/empty texts get
    empty features (they score the bias prior)."""
    extra = list(extra_cols or [])
    if {"idx", "val"} & {id_col, *extra}:
        raise ValueError(
            "featurize_chars writes 'idx'/'val' feature columns; rename "
            "the input columns that collide"
        )
    seed = _salt_seed(salt)
    ns = tuple(int(n) for n in ngrams)

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idxs, vals = [], []
            for t in pdf[text_col]:
                if not isinstance(t, str) or not t.strip():
                    idxs.append(np.empty(0, np.int32))
                    vals.append(np.empty(0, np.float64))
                    continue
                b = _char_gram_buckets(t, ns, num_buckets, seed)
                u, c = np.unique(b, return_counts=True)
                idxs.append(u.astype(np.int32))
                vals.append(c.astype(np.float64) / b.size)
            out = pdf[[id_col, *extra]].copy()
            out["idx"] = idxs
            out["val"] = vals
            yield out

    # text_col may already ride along in extra (predict_lang passes
    # every non-id column through) — never select it twice
    cols = [id_col, *extra] + ([text_col] if text_col not in extra else [])
    staged = docs.select(*cols)
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in staged.schema.fields
        if f.name != text_col or text_col in extra
    )
    return staged.mapInPandas(
        _feat, schema=f"{fields}, idx array<int>, val array<double>"
    )


class LangIdModel:
    """Labels + (D+1, K) weight matrix (last row = biases) +
    featurization config; round-trips as one small JSON artifact
    (O(num_buckets·K) floats — file-sized)."""

    def __init__(
        self,
        labels: list[str],
        weights: np.ndarray,
        num_buckets: int,
        ngrams: tuple[int, ...],
        salt: str,
    ):
        self.labels = list(labels)
        self.weights = np.asarray(weights, dtype=np.float64)
        if self.weights.shape != (num_buckets + 1, len(self.labels)):
            raise ValueError(
                f"weights must be ({num_buckets + 1}, {len(self.labels)}), "
                f"got {self.weights.shape}"
            )
        self.num_buckets = int(num_buckets)
        self.ngrams = tuple(int(n) for n in ngrams)
        self.salt = salt

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "labels": self.labels,
                    "num_buckets": self.num_buckets,
                    "ngrams": list(self.ngrams),
                    "salt": self.salt,
                    "weights": self.weights.tolist(),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "LangIdModel":
        with open(path) as f:
            d = json.load(f)
        return cls(
            d["labels"],
            np.array(d["weights"]),
            d["num_buckets"],
            tuple(d["ngrams"]),
            d["salt"],
        )


def _partial_grad_softmax(weights: np.ndarray, label_idx_col: str):
    """Per-partition (grad W | grad b | loss | n) fold for one softmax
    GD step — one float64 vector per partition via treeAggregate. K
    bincounts per batch (K is small); no per-row python."""
    w = weights[:-1]  # (d, k)
    b = weights[-1]  # (k,)
    d, k = w.shape

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(d * k + k + 2, dtype=np.float64)
        seen = False
        for pdf in batches:
            seen = True
            ys = pdf[label_idx_col].to_numpy(dtype=np.int64)
            flat_i, flat_v, row_ids, n = _flatten_sparse(pdf)
            z = np.tile(b, (n, 1))
            if flat_i.size:
                wv = w[flat_i] * flat_v[:, None]  # (nnz, k)
                for c in range(k):
                    z[:, c] += np.bincount(
                        row_ids, weights=wv[:, c], minlength=n
                    )
            z -= z.max(axis=1, keepdims=True)
            ez = np.exp(z)
            p = ez / ez.sum(axis=1, keepdims=True)
            err = p.copy()
            err[np.arange(n), ys] -= 1.0  # p - onehot(y)
            if flat_i.size:
                ew = err[row_ids]  # (nnz, k)
                for c in range(k):
                    acc[c * d : (c + 1) * d] += np.bincount(
                        flat_i, weights=ew[:, c] * flat_v, minlength=d
                    )
            acc[d * k : d * k + k] += err.sum(axis=0)
            pc = np.clip(p[np.arange(n), ys], 1e-12, None)
            acc[d * k + k] -= np.log(pc).sum()
            acc[d * k + k + 1] += n
        if seen:
            yield pd.DataFrame({"acc": [acc.tobytes()]})

    return fold


def train_lang_id(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    ngrams: tuple[int, ...] = (1, 2, 3),
    salt: str = "langid-v1",
    iters: int = 40,
    lr: float = 0.5,
    l2: float = 1e-5,
) -> LangIdModel:
    """Full-batch multinomial (softmax) logistic regression on a
    labeled corpus (``label_col`` = language code). Featurizes once,
    persists the sparse frame, then ``iters`` executor-folded gradient
    steps with an ADAGRAD per-coordinate step (plain GD needs a
    per-task learning rate because L1-normalized char frequencies make
    raw gradients tiny and K-class losses are much flatter than the
    binary quality filter's — measured: lr=2 underfits 6 languages at
    40 iters, lr=50 diverges; Adagrad converges across both regimes).
    The accumulator lives on the driver next to the weights — O(D·K)
    floats, the executor fold is unchanged. Class list = sorted
    distinct labels (deterministic)."""
    labels = sorted(
        r[0]
        for r in docs.select(label_col).where(
            F.col(label_col).isNotNull()
        ).distinct().collect()
    )
    if len(labels) < 2:
        raise ValueError(f"need >= 2 language labels, got {labels}")
    lmap = F.create_map(
        *[x for i, lab in enumerate(labels) for x in (F.lit(lab), F.lit(i))]
    )
    feats = featurize_chars(
        docs.where(F.col(label_col).isNotNull()).withColumn(
            "__y", lmap[F.col(label_col)]
        ),
        text_col=text_col,
        id_col=id_col,
        num_buckets=num_buckets,
        ngrams=ngrams,
        salt=salt,
        extra_cols=["__y"],
    ).select("__y", "idx", "val").persist()
    try:
        if feats.count() == 0:
            raise ValueError("cannot train on an empty corpus")
        d, k = int(num_buckets), len(labels)
        weights = np.zeros((d + 1, k), dtype=np.float64)
        g2 = np.zeros_like(weights)  # Adagrad accumulator
        zero = np.zeros(d * k + k + 2, dtype=np.float64)
        for _ in range(int(iters)):
            partials = feats.mapInPandas(
                _partial_grad_softmax(weights, "__y"), schema="acc binary"
            ).rdd.map(lambda r: np.frombuffer(bytes(r.acc), dtype=np.float64))
            total = partials.treeAggregate(
                zero, lambda a, b: a + b, lambda a, b: a + b, depth=2
            )
            n = max(total[d * k + k + 1], 1.0)
            grad_w = total[: d * k].reshape(k, d).T / n  # (d, k)
            grad_b = total[d * k : d * k + k] / n
            grad_w += l2 * weights[:-1]
            grad = np.vstack([grad_w, grad_b])
            g2 += grad * grad
            weights = weights - lr * grad / (np.sqrt(g2) + 1e-8)
        return LangIdModel(labels, weights, d, ngrams, salt)
    finally:
        feats.unpersist()


def predict_lang(
    df: DataFrame,
    model: LangIdModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "lang_pred",
    prob_col: str = "lang_prob",
    threshold: float | None = None,
    fallback: str = "und",
) -> DataFrame:
    """Append (``out_col``, ``prob_col``) = argmax language + its
    softmax probability, one fused featurize+score Arrow pass (the
    weights ride the closure once per executor). With ``threshold``,
    low-confidence rows get ``fallback`` ('und' — the CLD/fastText
    convention), so route-or-quarantine is a plain WHERE on the
    output: keep ``lang_pred != 'und'``, quarantine the rest."""
    for c in (out_col, prob_col):
        if c in df.columns:
            raise ValueError(f"predict_lang output column {c!r} already exists")
    w = model.weights[:-1].copy()
    b = model.weights[-1].copy()
    labels = np.array(model.labels)
    d, k = w.shape
    thr = float(threshold) if threshold is not None else None

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flat_i, flat_v, row_ids, n = _flatten_sparse(pdf)
            z = np.tile(b, (n, 1))
            if flat_i.size:
                wv = w[flat_i] * flat_v[:, None]
                for c in range(k):
                    z[:, c] += np.bincount(
                        row_ids, weights=wv[:, c], minlength=n
                    )
            z -= z.max(axis=1, keepdims=True)
            ez = np.exp(z)
            p = ez / ez.sum(axis=1, keepdims=True)
            best = p.argmax(axis=1)
            prob = p[np.arange(n), best]
            pred = labels[best].astype(object)
            if thr is not None:
                pred[prob < thr] = fallback
            out = pdf.drop(columns=["idx", "val"])
            out[out_col] = pred
            out[prob_col] = prob
            yield out

    passthrough = [c for c in df.columns if c != id_col]
    feats = featurize_chars(
        df,
        text_col=text_col,
        id_col=id_col,
        num_buckets=model.num_buckets,
        ngrams=model.ngrams,
        salt=model.salt,
        extra_cols=passthrough,
    )
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in feats.schema.fields
        if f.name not in ("idx", "val")
    )
    return feats.mapInPandas(
        _score, schema=f"{fields}, {out_col} string, {prob_col} double"
    )
