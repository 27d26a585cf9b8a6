"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The one LLM-pipeline stage the engine still lacked: learning the
tokenizer itself from the corpus. The classic algorithm is a greedy
loop — count adjacent symbol pairs, merge the most frequent, repeat —
and the naive distributed reading re-scans the corpus every round. The
standard fix (and the one every fast BPE trainer uses): aggregate the
corpus ONCE into a (word, count) table, then run the merge loop on
that table — vocabulary-sized (~10^7-10^8 distinct words at 100 TB),
not corpus-sized. Each round is then:

1. one map-side-combinable aggregation over the word table (explode
   adjacent symbol pairs weighted by word count, groupBy pair, SUM);
2. ONE row collected to the driver (orderBy count desc, pair asc,
   limit 1 — deterministic tie-break, so the learned merge list is a
   pure function of the corpus);
3. one Arrow-batched projection applying the merge to the symbol
   arrays (only words CONTAINING the pair change — the predicate
   prunes the rewrite to the affected rows).

Per-round lineage is cut with localCheckpoint (the connected_components
discipline) so round N doesn't replay rounds 1..N-1. Driver traffic is
one row per merge; corpus bytes shuffle exactly once (the initial word
count).

Encoding applies the ranked merge list GPT-2-style (lowest-rank pair
first) inside a pandas UDF with a per-batch word memo — a pure map-side
projection, zero shuffle.

Word model: whitespace pre-tokenization, each word's symbols are its
characters with an end-of-word marker ``</w>`` appended (the original
Sennrich formulation) so merges never cross word boundaries and the
token stream round-trips word boundaries exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["word_counts", "train_bpe", "encode_bpe", "bpe_vocab"]

EOW = "</w>"


def word_counts(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """The single corpus pass: ``[word, count]`` over whitespace-split
    tokens. Map-side combinable; the exchange carries distinct words,
    never the corpus."""
    return (
        df.select(
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _apply_merge_udf(a: str, b: str):
    merged = a + b

    @F.pandas_udf("array<string>")
    def apply_merge(syms: pd.Series) -> pd.Series:
        def one(s):
            out = []
            i, n = 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.apply(lambda s: one(list(s)))

    return apply_merge


def train_bpe(
    corpus: DataFrame,
    *,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    words: Optional[DataFrame] = None,
) -> list:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ranked
    merge list ``[(a, b), ...]`` (rank = list position).

    ``words`` (optional) supplies a precomputed :func:`word_counts`
    table (reuse across vocabulary sizes). Stops early when no pair
    reaches ``min_pair_count`` (merging singletons memorizes the
    corpus tail — the conventional floor is 2).

    Determinism: the winning pair each round is max count, ties broken
    by (a, b) lexicographic — partition-layout independent.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if words is None:
        words = word_counts(corpus, text_col=text_col)
    syms = words.select(
        F.concat(
            F.split(F.col("word"), ""),  # characters
            F.array(F.lit(EOW)),
        ).alias("syms"),
        F.col("count").cast("long").alias("count"),
    ).localCheckpoint()

    merges: list = []
    try:
        for _ in range(int(n_merges)):
            pairs = (
                syms.select(
                    F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias(
                        "_i", "a"
                    ),
                    F.col("syms"),
                    F.col("count"),
                )
                .select(
                    F.col("a"),
                    F.col("syms")[F.col("_i") + 1].alias("b"),
                    F.col("count"),
                )
                .groupBy("a", "b")
                .agg(F.sum("count").alias("pc"))
            )
            top = pairs.orderBy(F.desc("pc"), F.asc("a"), F.asc("b")).limit(1).collect()
            if not top or top[0]["pc"] < min_pair_count:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            has_pair = F.array_contains("syms", a) & F.array_contains("syms", b)
            nxt = syms.withColumn(
                "syms",
                F.when(has_pair, _apply_merge_udf(a, b)(F.col("syms"))).otherwise(
                    F.col("syms")
                ),
            ).localCheckpoint()
            syms = nxt
    finally:
        pass
    return merges


def bpe_vocab(merges: Sequence) -> dict:
    """Merge list -> ``{token: id}``: ids 0..255 reserved for raw bytes
    of unseen text (stable without a corpus pass), then ``</w>``, then
    one token per merge in rank order. Deterministic."""
    vocab = {chr(i): i for i in range(256)}
    vocab[EOW] = 256
    nxt = 257
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = nxt
            nxt += 1
    return vocab


def encode_bpe(
    df: DataFrame,
    merges: Sequence,
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list: input columns +
    ``out_col`` (array<string> of BPE tokens, ``</w>``-terminated words).

    GPT-2 application order: repeatedly merge the LOWEST-RANK adjacent
    pair present in the word — exactly the training greedy order, so
    encoding a training document reproduces the training segmentation.
    Pure map-side (broadcast rank dict + per-batch word memo); zero
    shuffle."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        r = bc.value
        memo: dict = {}

        def enc_word(w):
            got = memo.get(w)
            if got is not None:
                return got
            s = list(w) + [EOW]
            while len(s) > 1:
                best, bi = None, -1
                for i in range(len(s) - 1):
                    rk = r.get((s[i], s[i + 1]))
                    if rk is not None and (best is None or rk < best):
                        best, bi = rk, i
                if best is None:
                    break
                s[bi : bi + 2] = [s[bi] + s[bi + 1]]
            memo[w] = s
            return s

        def enc_doc(t):
            out = []
            if t:
                for w in t.split():
                    out.extend(enc_word(w))
            return out

        return texts.apply(enc_doc)

    return df.withColumn(out_col, encode(F.col(text_col)))
