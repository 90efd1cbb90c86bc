"""BPE tokenizer: training and corpus encoding.

Closes the "BPE-ish token counting" gap with the real algorithm, shaped
for 100 TB the way production tokenizer training actually runs:

- TRAIN is two-phase: a distributed word-frequency aggregate (map-side
  combine; the table is O(|vocab|), not O(corpus) — Zipf makes this tiny
  relative to the data), then the classic merge loop over that compact
  table on the driver. This mirrors standard practice (tokenizer trainers
  consume word counts, not raw text); the driver never sees corpus rows.
- ENCODE is distributed and vocabulary-factored: each DISTINCT word is
  encoded once (an Arrow-batched pandas iterator over the compact word
  frame, merge ranks broadcast in the closure), then the per-word token
  counts join back to the corpus word stream — at scale a broadcast join,
  since |vocab| << corpus.

Apply semantics (identical in train's vocab update, encode, and the
DuckDB oracle's recursive CTE): repeatedly find the adjacent pair with
the LOWEST merge rank — leftmost occurrence on ties — merge it, rescan.
Merging single occurrences with rescan is equivalent to the textbook
left-to-right full-pass application, and is what a SQL oracle can
express exactly.

Training tie-break is deterministic: highest pair count, then
lexicographically smallest pair.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = r"[^a-z0-9]+"


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), WORD_RE)).alias("word"),
    ).filter(F.col("word") != "")


def bpe_apply(word: str, ranks: dict) -> list:
    """Apply trained merges to one word: (min rank, leftmost), rescan."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_idx = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_idx = r, i
        if best_idx is None:
            break
        syms[best_idx:best_idx + 2] = [syms[best_idx] + syms[best_idx + 1]]
    return syms


def bpe_train(docs: DataFrame, n_merges: int = 30,
              text_col: str = "text") -> list:
    """Learn up to n_merges merge rules; returns [(a, b), ...] in rank
    order. Stops early when no pair repeats."""
    freq = (
        _words(docs, text_col)
        .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
        .collect()  # O(|vocab|) — the compact table, never the corpus
    )
    vocab = {r["word"]: [list(r["word"]), int(r["n"])] for r in freq}
    merges: list = []
    ranks: dict = {}
    for _ in range(n_merges):
        pairs: dict = {}
        for syms, n in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        candidates = {p: n for p, n in pairs.items() if n >= 2}
        if not candidates:
            break
        # highest count wins; ties break to the lexicographically smallest
        # pair — fully deterministic, so retraining reproduces the table
        p = min(candidates.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(p)
        ranks[p] = len(merges) - 1
        for entry in vocab.values():
            entry[0] = bpe_apply("".join(entry[0]), ranks) \
                if len(entry[0]) > 1 else entry[0]
    return merges


def bpe_encode(docs: DataFrame, merges: Sequence,
               text_col: str = "text") -> DataFrame:
    """Per-doc BPE token accounting under a trained merge list:
    (doc_id, n_words, n_bpe_tokens). Distinct words encode once in an
    Arrow-batched pandas pass; counts join back to the word stream (a
    broadcast join at scale — |vocab| << corpus)."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    words = _words(docs, text_col)
    distinct = words.select("word").distinct()

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            yield pd.DataFrame({
                "word": b["word"],
                "n_toks": [len(bpe_apply(w, ranks)) for w in b["word"]],
            })

    encoded = distinct.mapInPandas(enc, "word string, n_toks long")
    return (
        words.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_bpe_tokens"),
        )
    )


# Trained merge table: bpe_train(sf0.001 documents, n_merges=30) — frozen
# as literals so the encode oracle is a pure function of the corpus (the
# IVF codebook precedent). Regenerate with scripts/train_bpe.py.
TRAINED_MERGES = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"),
]
