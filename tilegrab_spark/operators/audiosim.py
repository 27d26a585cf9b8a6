"""Audio fingerprinting + constellation matching — near-duplicate /
containment detection for audio payloads (the Shazam landmark scheme,
public literature: Wang 2003), built on the engine's own WAV decode
(kernels/wav.py — PCM, µ-law/A-law, IMA/MS ADPCM).

Why a training-data engine needs it: audio corpora carry the same
near-dup structure as text and images — re-encoded copies, clips
embedded in longer recordings, channel-swapped duplicates — and none of
the text/image signatures (minhash, phash) apply to waveforms. The
landmark scheme is the standard robust audio signature: it survives
re-encoding, amplitude changes and added noise because it keys on
time-frequency PEAKS (local spectrogram maxima), not sample values.

Two stages, both scale-shaped like the engine's other pair generators:

1. ``audio_fingerprints`` — one ``mapInPandas`` over the audio table
   (bytes never shuffle, never visit the driver): decode → mono →
   Hann-windowed rFFT frames → per-frame top-``n_peaks`` spectral peaks
   (log-magnitude, low-bin DC region excluded) → constellation hashes:
   each anchor peak pairs with up to ``fanout`` later peaks inside a
   target zone, the (f_anchor, f_target, Δframe) triple packs into one
   int64. Output rows ``[id, hash, t]`` (t = anchor frame index) — a
   compact signature table to persist alongside minhash/phash tables.
   Undecodable payloads surface as ``decode_ok = false`` rows with an
   empty signature (the honest-default contract of multimodal.py).
2. ``audio_match_pairs`` — candidate pairs from ONE equi-join on the
   hash (never all-pairs), then the offset-histogram vote: matching
   hashes from a true copy agree on ``t_b - t_a`` (the embedding
   offset), random collisions don't. One groupBy per (pair, offset)
   plus a per-pair max — all map-side-combinable. Returns pairs with
   ``votes ≥ min_votes`` and the recovered offset in frames/seconds.

Determinism: FFT, peak picking (ties broken toward lower bin) and
hashing are pure functions of the payload; the join + counts are
order-free aggregations. Oracle: tests/test_audiosim.py embeds engine-
encoded clips at known offsets inside longer noise recordings (also
µ-law re-encoded) and asserts the recovered pair + offset; disjoint
clips must produce zero pairs.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

__all__ = ["audio_fingerprints", "audio_match_pairs"]

# constellation geometry (frames are hop-sized steps)
_ZONE_MIN_DT = 1     # target zone starts the frame after the anchor
_ZONE_MAX_DT = 64    # ...and spans ~64 frames (~3 s at default hop/sr)

# frames per numpy block in the peak finder: bounds memory at
# ~_PEAK_CHUNK_FRAMES x frame_len x 32 B (framed copy + complex
# spectrum) regardless of recording length — an hour of 44.1 kHz audio
# frames to ~150k rows, which materialized at once is a multi-GB
# matrix. Chunking is output-invariant (tests shrink this to prove it).
_PEAK_CHUNK_FRAMES = 4096


def audio_fingerprints(
    df: DataFrame,
    *,
    id_col: str = "audio_id",
    audio_col: str = "payload",
    frame_len: int = 2048,
    hop: int = 1024,
    n_peaks: int = 5,
    fanout: int = 3,
) -> DataFrame:
    """Landmark fingerprints per audio row → ``[<id_col>, decode_ok,
    hash, t]`` (one row per landmark; exactly one ``decode_ok=false``
    row with NULL hash/t for undecodable payloads). ``frame_len``/
    ``hop`` are in samples; ``n_peaks`` per frame and ``fanout``
    targets per anchor bound the signature size at
    ``n_peaks × fanout`` hashes per frame."""
    import numpy as np
    import pandas as pd

    if frame_len < 64 or frame_len > 16384 or frame_len & (frame_len - 1):
        # upper bound 16384: rfft bins must fit the hash's 14-bit
        # band fields (16384/2+1 = 8193 < 2^14); larger frames would
        # silently alias distinct landmarks
        raise ValueError(
            f"frame_len must be a power of two in [64, 16384], got {frame_len}"
        )
    if not 0 < hop <= frame_len:
        raise ValueError(f"hop must be in (0, frame_len], got {hop}")
    if n_peaks < 1 or fanout < 1:
        raise ValueError("n_peaks and fanout must be >= 1")

    from tilegrab_spark.kernels.wav import decode_wav

    window = None  # built per worker, sized frame_len
    # captured BY VALUE at plan-build time so tests can shrink it on the
    # driver and have workers honor it (a module-global lookup would
    # re-resolve to the default inside each worker process)
    chunk_frames = int(_PEAK_CHUNK_FRAMES)

    def peaks_of(x: "np.ndarray") -> "np.ndarray":
        """(frame, bin) peak list: per frame, the n_peaks highest
        log-magnitude bins above the DC region, ties to lower bin.
        Processed in bounded chunks of frames (identical output)."""
        nonlocal window
        import numpy as np

        if window is None:
            window = np.hanning(frame_len)
        n = (len(x) - frame_len) // hop + 1
        if n < 1:
            return np.empty((0, 2), dtype=np.int64)
        parts = []
        for f0 in range(0, n, chunk_frames):
            nf = min(chunk_frames, n - f0)
            idx = (f0 + np.arange(nf))[:, None] * hop + np.arange(frame_len)[None, :]
            spec = np.abs(np.fft.rfft(x[idx] * window, axis=1))
            spec[:, :4] = 0.0  # DC / sub-audio bins never anchor
            # stable argsort on negated magnitudes → ties to lower bin
            top = np.argsort(-spec, axis=1, kind="stable")[:, :n_peaks]
            frames = np.repeat(f0 + np.arange(nf), n_peaks)
            bins = top.ravel()
            keep = spec[frames - f0, bins] > 0.0
            parts.append(np.stack([frames[keep], bins[keep]], axis=1))
        return np.concatenate(parts, axis=0)

    def hashes_of(pk: "np.ndarray") -> "np.ndarray":
        """(hash, t) int64 pairs: anchor × up to `fanout` targets in
        the zone. hash = f1<<28 | f2<<14 | dt (bins < 2^14, dt < 2^14)."""
        import numpy as np

        if len(pk) == 0:
            return np.empty((0, 2), dtype=np.int64)
        order = np.lexsort((pk[:, 1], pk[:, 0]))
        pk = pk[order]
        t = pk[:, 0]
        out = []
        starts = np.searchsorted(t, t + _ZONE_MIN_DT, side="left")
        ends = np.searchsorted(t, t + _ZONE_MAX_DT, side="right")
        for i in range(len(pk)):
            j0, j1 = starts[i], min(ends[i], starts[i] + fanout)
            for j in range(j0, j1):
                dt = t[j] - t[i]
                h = (int(pk[i, 1]) << 28) | (int(pk[j, 1]) << 14) | int(dt)
                out.append((h, int(t[i])))
        return np.array(out, dtype=np.int64).reshape(-1, 2)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, oks, hs, ts = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[audio_col]):
                try:
                    x, _sr = decode_wav(bytes(payload))
                except ValueError:  # malformed stream → surfaced, not raised
                    ids.append(rid); oks.append(False)
                    hs.append(None); ts.append(None)
                    continue
                hp = hashes_of(peaks_of(x))
                if len(hp) == 0:  # decodable but too short/silent: keep the id
                    ids.append(rid); oks.append(True)
                    hs.append(None); ts.append(None)
                    continue
                ids.extend([rid] * len(hp))
                oks.extend([True] * len(hp))
                hs.extend(hp[:, 0].tolist())
                ts.extend(hp[:, 1].tolist())
            yield pd.DataFrame(
                {id_col: ids, "decode_ok": oks, "hash": pd.array(hs, dtype="Int64"),
                 "t": pd.array(ts, dtype="Int64")}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, audio_col).mapInPandas(
        run, f"{id_col} {id_type}, decode_ok boolean, hash long, t long"
    )


def audio_match_pairs(
    fps: DataFrame,
    *,
    id_col: str = "audio_id",
    min_votes: int = 5,
) -> DataFrame:
    """Audio near-dup/containment pairs from a fingerprint table
    (self-join form): ``[id_a, id_b, offset_frames, votes]`` with
    ``id_a < id_b`` and ``votes`` = landmarks agreeing on the same
    time offset (the constellation vote — ≥ ``min_votes`` means the
    recordings share ``votes`` aligned landmarks, far beyond chance).
    ``offset_frames`` = t_b − t_a at the agreeing offset (where the
    a-clip starts inside b, in hop units, negative if b starts inside
    a). One hash equi-join + two map-side-combinable aggregations."""
    if min_votes < 1:
        raise ValueError(f"min_votes must be >= 1, got {min_votes}")
    ok = fps.filter(F.col("decode_ok")).select(
        F.col(id_col).alias("_id"), "hash", "t"
    )
    a = ok.select(F.col("_id").alias("id_a"), "hash", F.col("t").alias("_ta"))
    b = ok.select(F.col("_id").alias("id_b"), "hash", F.col("t").alias("_tb"))
    votes = (
        a.join(b, "hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", (F.col("_tb") - F.col("_ta")).alias("offset_frames"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    from pyspark.sql import Window

    best = Window.partitionBy("id_a", "id_b").orderBy(
        F.desc("votes"), F.asc("offset_frames")
    )
    return (
        votes.withColumn("_rn", F.row_number().over(best))
        .filter((F.col("_rn") == 1) & (F.col("votes") >= min_votes))
        .select("id_a", "id_b", "offset_frames", "votes")
    )
