#!/usr/bin/env python3
"""Train the graft linear quality-classifier fixture (fastText-style
hashing-trick logistic regression, Joulin et al. 2016 shape: mean of
bucket weights over the doc's tokens + bias -> sigmoid).

Task: predict lang == 'en' from the hashed bag of lowercased whitespace
tokens. The label is incidental — the committed artifact is the scoring
SHAPE (bucketed sparse dot product as pure column expressions); the
trainer exists so the weights are honest, deterministic and re-runnable
rather than invented.

Deterministic: full-batch gradient descent, fixed init (zeros), fixed
learning rate and iteration count, float64 throughout; the feature
bucket is int(md5(token)[:8], 16) % DIM — the exact md5 formula
Sampling.hashBucket and the DuckDB oracles already share.

Output: src/main/scala/graft/functions/QualityModel.scala (weights as a
Scala fixture; LlmOracles interpolates the same constants into the
DuckDB oracle so both engines read one source of truth).

Usage: python3 tools/train_quality.py
"""
import hashlib
import math

import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = "src/main/scala/graft/functions/QualityModel.scala"
DIM = 64
ITERS = 5000
LR = 5.0


def bucket(tok):
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % DIM


def main():
    tbl = pq.read_table(SRC, columns=["text", "lang"])
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang").to_pylist()
    feats, labels = [], []
    for text, lang in zip(texts, langs):
        toks = text.strip().lower().split()
        x = [0.0] * DIM
        for t in toks:
            x[bucket(t)] += 1.0
        n = max(len(toks), 1)
        feats.append([v / n for v in x])
        labels.append(1.0 if lang == "en" else 0.0)

    w = [0.0] * DIM
    b = 0.0
    m = len(feats)
    for it in range(ITERS):
        gw = [0.0] * DIM
        gb = 0.0
        for x, y in zip(feats, labels):
            z = b + sum(wi * xi for wi, xi in zip(w, x))
            p = 1.0 / (1.0 + math.exp(-z))
            d = p - y
            gb += d
            for j in range(DIM):
                if x[j]:
                    gw[j] += d * x[j]
        b -= LR * gb / m
        for j in range(DIM):
            w[j] -= LR * gw[j] / m

    # report quality so the fixture's usefulness is inspectable
    correct = 0
    pairs = []
    for x, y in zip(feats, labels):
        p = 1.0 / (1.0 + math.exp(-(b + sum(wi * xi for wi, xi in zip(w, x)))))
        pairs.append((p, y))
        correct += int((p >= 0.5) == (y == 1.0))
    pos = sorted(p for p, y in pairs if y == 1.0)
    neg = sorted(p for p, y in pairs if y == 0.0)
    import bisect
    auc = sum(bisect.bisect_left(neg, p) + 0.5 * (bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p))
              for p in pos) / (len(pos) * len(neg))
    acc = correct / m
    print(f"train accuracy={acc:.4f} auc={auc:.4f} bias={b:.6f}")

    rows = ",\n    ".join(
        ", ".join(f"{w[i + j]!r}" for j in range(8)) for i in range(0, DIM, 8))
    with open(OUT, "w") as f:
        f.write(f'''package graft.functions

/** Hashing-trick linear quality-classifier fixture (fastText shape:
  * Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification"). Trained by tools/train_quality.py (deterministic
  * full-batch logistic regression, {ITERS} iters, lr {LR}) on the
  * sf0.01 documents table, label = (lang == 'en'); train accuracy
  * {acc:.4f}, AUC {auc:.4f}. Feature b of a doc = (count of tokens
  * hashing to bucket b) / n_tokens, bucket = md5-first-8-hex %% {DIM}
  * over lowercased whitespace tokens — the corpus-standard md5 formula
  * ([[graft.operators.Sampling.hashBucket]]), so the DuckDB oracle
  * reproduces it bit-for-bit. Regenerate with the tool; do not edit.
  */
object QualityModel {{
  val dim: Int = {DIM}
  val bias: Double = {b!r}
  val weights: Array[Double] = Array(
    {rows})
}}
''')
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
