"""Video fingerprinting + temporal-alignment matching — the video
sibling of operators/audiosim.py, over the engine's own MJPEG-AVI and
JPEG decode (kernels/avi.py, kernels/jpeg.py).

Near-dup video detection keys on per-frame PERCEPTUAL hashes (the
phash64 already used for image dedup) plus temporal alignment: a
re-encoded or embedded copy matches frame-for-frame at one consistent
offset, random collisions don't. Same two-stage shape as audio:

1. ``video_fingerprints`` — ONE ``mapInPandas`` over the video table
   (bytes never shuffle): parse the AVI container, decode each frame's
   JPEG, phash64 it → rows ``[id, decode_ok, phash, t]`` (t = frame
   index). Malformed containers or frames surface as
   ``decode_ok=false`` rows, never exceptions.
2. ``video_match_pairs`` — phash equality is too brittle across
   re-encodes, so candidates come from the pigeonhole band join the
   image dedup suite uses (split the 64-bit hash into 4×16-bit bands;
   hamming ≤ ``max_hamming`` < 4 bands guarantees ≥ 1 exact band — the
   same exhaustiveness argument proven in tests/test_dedup.py): ONE
   equi-join on (band, value), exact hamming refine via
   ``bit_count(a XOR b)`` in Catalyst, multi-band hits deduped, then
   the offset-histogram vote from audiosim — count frame pairs
   agreeing on ``t_b − t_a``, keep the best offset per pair with
   ``votes ≥ min_votes``. Never all-pairs; every aggregate
   map-side-combinable.

Determinism: container parse, JPEG decode, phash and the vote are pure
functions of the payload; aggregations are order-free. Oracle:
tests/test_videosim.py embeds an engine-encoded frame sequence at a
known frame offset inside a longer synthetic video — at a DIFFERENT
JPEG quality than the original — and asserts the recovered pair +
offset; disjoint videos must produce zero pairs.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["video_fingerprints", "video_match_pairs", "phash_band_col"]

_BANDS = 4  # 4 x 16-bit bands: exhaustive for hamming <= 3 per the
            # pigeonhole bound; max_hamming above 3 trades recall


def phash_band_col(phash_col: str = "phash"):
    """The pigeonhole band explode shared by the one-shot matcher and
    the incremental store (streaming/fingerprint_stream.py) — both MUST
    split the hash identically or the incremental candidate gate
    silently desynchronizes from the matcher. One struct per 16-bit
    band: ``[band, bval]``."""
    return F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col(phash_col), 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("bval"),
            )
            for i in range(_BANDS)
        ])
    )


def video_fingerprints(
    df: DataFrame,
    *,
    id_col: str = "video_id",
    video_col: str = "payload",
) -> DataFrame:
    """Per-frame perceptual hashes → ``[<id_col>, decode_ok, phash, t]``
    (one row per decodable frame; one ``decode_ok=false`` NULL row for
    malformed containers; frames that fail JPEG decode are skipped and
    the container row survives through its other frames)."""
    import pandas as pd

    from tilegrab_spark.kernels.avi import read_avi_mjpeg
    from tilegrab_spark.kernels.jpeg import decode_jpeg
    from tilegrab_spark.kernels.png import phash64

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, oks, hs, ts = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[video_col]):
                try:
                    meta = read_avi_mjpeg(bytes(payload))
                except ValueError:
                    ids.append(rid); oks.append(False)
                    hs.append(None); ts.append(None)
                    continue
                any_frame = False
                for t, jpg in enumerate(meta["frames"]):
                    try:
                        arr = decode_jpeg(jpg)
                    except ValueError:
                        continue
                    ids.append(rid); oks.append(True)
                    hs.append(phash64(arr)); ts.append(t)
                    any_frame = True
                if not any_frame:
                    ids.append(rid); oks.append(True)
                    hs.append(None); ts.append(None)
            yield pd.DataFrame(
                {id_col: ids, "decode_ok": oks,
                 "phash": pd.array(hs, dtype="Int64"),
                 "t": pd.array(ts, dtype="Int64")}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, video_col).mapInPandas(
        run, f"{id_col} {id_type}, decode_ok boolean, phash long, t long"
    )


def video_match_pairs(
    fps: DataFrame,
    *,
    id_col: str = "video_id",
    min_votes: int = 3,
    max_hamming: int = 3,
) -> DataFrame:
    """Video near-dup/containment pairs from a fingerprint table:
    ``[id_a, id_b, offset_frames, votes]`` (id_a < id_b; ``votes`` =
    frame pairs within ``max_hamming`` agreeing on the same offset;
    ``offset_frames`` = t_b − t_a). ``max_hamming`` ≤ 3 keeps the
    4-band blocking exhaustive (pigeonhole); larger values are allowed
    but trade recall for the same join cost."""
    if min_votes < 1:
        raise ValueError(f"min_votes must be >= 1, got {min_votes}")
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    ok = fps.filter(F.col("decode_ok") & F.col("phash").isNotNull()).select(
        F.col(id_col).alias("_id"), "phash", "t"
    )
    banded = ok.select(
        "_id", "phash", "t", phash_band_col().alias("_b")
    ).select("_id", "phash", "t", F.col("_b.band").alias("band"), F.col("_b.bval").alias("bval"))
    a = banded.select(
        F.col("_id").alias("id_a"), F.col("phash").alias("_pa"),
        F.col("t").alias("_ta"), "band", "bval",
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("phash").alias("_pb"),
        F.col("t").alias("_tb"), "band", "bval",
    )
    hits = (
        a.join(b, ["band", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.bit_count(F.col("_pa").bitwiseXOR(F.col("_pb"))) <= F.lit(int(max_hamming))
        )
        # a close frame pair can share several bands — count it once
        .select("id_a", "id_b", "_ta", "_tb")
        .distinct()
    )
    votes = hits.groupBy(
        "id_a", "id_b", (F.col("_tb") - F.col("_ta")).alias("offset_frames")
    ).agg(F.count(F.lit(1)).alias("votes"))
    best = Window.partitionBy("id_a", "id_b").orderBy(
        F.desc("votes"), F.asc("offset_frames")
    )
    return (
        votes.withColumn("_rn", F.row_number().over(best))
        .filter((F.col("_rn") == 1) & (F.col("votes") >= min_votes))
        .select("id_a", "id_b", "offset_frames", "votes")
    )
