#!/usr/bin/env python3
"""Train the graft BPE fixture (char-level, GPT-2-style pre-tokenizer).

Deterministic: pair counts over sf0.001 documents, ties broken by the
lexicographically smallest (left, right) pair; merges applied as one
left-to-right non-overlapping pass per rule (the exact apply semantics
of graft.functions.Bpe and the DuckDB oracle — for tables produced by
this trainer a single pass per rule is provably exhaustive, because a
merge output can never equal either component of its own rule and rule
components always predate the rule).

Output: src/main/scala/resources path merges.txt — one merge per line,
both symbols hex-encoded UTF-8 (symbols may contain spaces or newlines;
hex keeps the fixture line-oriented and diff-able).

Usage: python3 tools/train_bpe.py [num_merges] (default 200)
"""
import collections
import re
import sys

import pyarrow.parquet as pq

# re.ASCII: \s must mean the same ASCII class as in the Java regex and
# RE2 engines that apply this model (Unicode \s would classify NBSP
# etc. as whitespace here but nowhere else, training a divergent table
# on crawl text). Keep in sync with graft.expressions.BpeModel.PretokRegex.
PRETOK = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+", re.ASCII)
SRC = "/root/testdata/sf0.001/documents.parquet"
OUT = "src/main/resources/graft/bpe/merges.txt"


def merge_word(word, l, r):
    out = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and word[i] == l and word[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def main(n_merges):
    texts = pq.read_table(SRC, columns=["text"]).column("text").to_pylist()
    freqs = collections.Counter()
    for t in texts:
        for pt in PRETOK.findall(t):
            freqs[tuple(pt)] += 1
    vocab = dict(freqs)
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, f in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += f
        if not pairs:
            break
        # highest count; ties -> lexicographically smallest (l, r)
        (l, r), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r))
        vocab = {merge_word(w, l, r): f for w, f in vocab.items()}
    with open(OUT, "w") as f:
        for l, r in merges:
            f.write(l.encode("utf-8").hex() + " " + r.encode("utf-8").hex() + "\n")
    print(f"wrote {len(merges)} merges to {OUT}")
    sample = [l + "|" + r for l, r in merges[:10]]
    print("first merges:", sample)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
