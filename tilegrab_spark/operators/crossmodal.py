"""Cross-modal near-duplicate detection over image+caption pairs.

The engine's primary input (BASELINE.json input_hint) is a table of
``(image_id, bytes, w, h, fmt, caption, phash)`` rows — every row carries
BOTH a visual signature (``phash:int64``, kernels/png.py::phash64 at
ingest) and a text payload (``caption``). A training-data dedup pass over
such a corpus needs pairs *per modality* and the cross-modal verdict:

- two re-encodes / slight crops of one scene → phash hamming small,
  captions possibly rewritten (``visual`` match);
- one scene scraped twice with the same alt-text but different crops /
  aggressive recompression → caption jaccard high, phash far
  (``caption`` match);
- a literal double-scrape → both (``both``).

``cross_modal_pairs`` composes the two EXACT blocked pair generators the
engine already has — the pigeonhole hamming join (dedup.py::
hamming_near_dup_pairs — completeness is a theorem) and the
inverted-index n-gram jaccard join (dedup.py::ngram_jaccard_pairs) — and
merges their outputs with one full-outer join on the (id_a, id_b) pair
key. Scale shape: both generators are bucketed joins (no cross product
anywhere); the combine joins two PAIR lists, which are tiny relative to
the corpus (near-dup output, not input, cardinality), so the outer join
is a cheap shuffle on pair keys. At 10^12 rows every stage is the same
blocked shape that the per-modality operators already proved out.

The reference has no analogue (it fetches tiles; it never dedups) — this
is part of the training-data operator suite from the driver brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.operators.dedup import (
    hamming_near_dup_pairs,
    ngram_jaccard_pairs,
)

__all__ = ["cross_modal_pairs", "cross_modal_image_pairs"]

_MODES = ("any", "both", "visual", "caption")


def cross_modal_pairs(
    df: DataFrame,
    *,
    id_col: str = "image_id",
    hash_col: str = "phash",
    text_col: str = "caption",
    max_hamming: int = 4,
    k: int = 3,
    jaccard_threshold: float = 0.5,
    mode: str = "any",
) -> DataFrame:
    """Near-dup pairs by visual hash, caption similarity, or both.

    Returns ``(id_a, id_b, hamming, jaccard, modality)`` where ``hamming``
    is null for caption-only pairs, ``jaccard`` null for visual-only
    pairs, and ``modality`` is ``'both' | 'visual' | 'caption'``.

    ``mode``: ``'any'`` (default) keeps every pair; ``'both'`` keeps only
    pairs confirmed by BOTH modalities (high-precision dedup); ``'visual'``
    / ``'caption'`` keep pairs matched by that modality (regardless of the
    other — use the ``modality`` column for exclusivity).
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")

    visual = hamming_near_dup_pairs(
        df.select(id_col, hash_col),
        hash_col=hash_col,
        id_col=id_col,
        max_hamming=max_hamming,
    )
    caption = ngram_jaccard_pairs(
        df.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        k=k,
        threshold=jaccard_threshold,
    )
    if mode == "both":
        # inner join: only pairs present in both pair lists survive —
        # cheapest form, no null handling
        out = visual.join(caption, on=["id_a", "id_b"], how="inner").withColumn(
            "modality", F.lit("both")
        )
    else:
        out = visual.join(caption, on=["id_a", "id_b"], how="full_outer").withColumn(
            "modality",
            F.when(F.col("hamming").isNotNull() & F.col("jaccard").isNotNull(), "both")
            .when(F.col("hamming").isNotNull(), "visual")
            .otherwise("caption"),
        )
        if mode == "visual":
            out = out.filter(F.col("hamming").isNotNull())
        elif mode == "caption":
            out = out.filter(F.col("jaccard").isNotNull())
    return out.select("id_a", "id_b", "hamming", "jaccard", "modality")


def cross_modal_image_pairs(images_df: DataFrame, **kw) -> DataFrame:
    """``cross_modal_pairs`` with the input_hint image-table defaults
    (``image_id`` / ``phash`` / ``caption``)."""
    return cross_modal_pairs(images_df, **kw)
