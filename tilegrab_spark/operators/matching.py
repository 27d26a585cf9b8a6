"""HMM map matching (Newson & Krumm 2009) — noisy GPS tracks onto a
polyline network.

``snap_points_to_lines`` attaches each fix to its NEAREST line
independently; on parallel/crossing roads that flip-flops between
lines wherever the noise exceeds the separation.  Map matching solves
the joint problem: the most probable SEQUENCE of roads given every fix
at once — the canonical trajectory operator of every fleet/mobility
pipeline (OSRM/Valhalla's `match`; Newson & Krumm, "Hidden Markov Map
Matching Through Noise and Sparseness", ACM GIS 2009).

Model (the paper's, with the standard router-free simplification):

- states at step t  = candidate (line, segment, t) snaps within
  ``radius_m`` of fix t — ONE candidate per line (that line's closest
  point), at most ``max_candidates`` lines, nearest first;
- emission  log p  = -0.5 * (d / sigma)^2            (Gaussian GPS noise)
- transition log p = -|route - great_circle| / beta   (exponential), with
  ``route`` approximated by the planar distance between consecutive
  candidate snap points (the no-router form: exact when consecutive
  fixes land on the same or connected lines at sub-radius spacing;
  a full router would need the network graph, out of scope here and
  in most lakehouse implementations);
- Viterbi per track, deterministic tie-breaks (first-best, candidates
  ordered by (d^2, line, seg)).

Fixes with NO candidate within radius break the chain (emitted as
``matched=false``; the DP restarts after the gap — the paper's HMM
"break" treatment for sparse/offroad stretches).

Plan shape at 100 TB: candidate generation is the snap.py blocked
equi-join (pure Catalyst, zero Python); per-(fix, line) reduction and
the top-k gate are two candidate-sized shuffles; the Viterbi is ONE
``applyInPandas`` over the track key — per-track sequential DP, the
only Python stage, state O(T x K) per track.  No stage ever touches
all-pairs; everything between scan and grouped map is whole-stage
codegen.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from tilegrab_spark.kernels.geo import WGS84_RADIUS
from tilegrab_spark.operators.snap import candidate_segments

__all__ = ["match_tracks"]

_OUT_SCHEMA = (
    "{track} string, {seq} long, {lon} double, {lat} double, "
    "matched boolean, {line} string, seg_idx int, seg_t double, "
    "snap_lon double, snap_lat double, dist_m double"
)


def match_tracks(
    fixes: DataFrame,
    lines: DataFrame,
    *,
    radius_m: float,
    sigma_m: float | None = None,
    beta_m: float | None = None,
    max_candidates: int = 8,
    track_col: str = "track_id",
    seq_col: str = "seq",
    lon_col: str = "lon",
    lat_col: str = "lat",
    line_id: str = "line_id",
    coords_col: str = "coords",
    max_chunks_per_segment: int = 65536,
) -> DataFrame:
    """Match each track's fixes to the jointly most probable line
    sequence.  ``fixes``: (track_col, seq_col, lon, lat) — seq orders
    the track.  ``lines``: (line_id, coords array<array<double>>).

    Defaults: ``sigma_m = radius_m / 4`` (GPS noise), ``beta_m =
    radius_m / 2`` (transition tolerance) — override with measured
    values when available (N&K estimate sigma from the fix residuals).

    Output: one row per input fix — ``matched`` false when no line is
    within radius (NULL match columns), else the Viterbi-chosen line
    with the same snap columns ``snap_points_to_lines`` emits.
    """
    sigma = float(sigma_m if sigma_m is not None else radius_m / 4.0)
    beta = float(beta_m if beta_m is not None else radius_m / 2.0)
    if sigma <= 0 or beta <= 0:
        raise ValueError("sigma_m and beta_m must be positive")
    if max_candidates < 1:
        raise ValueError("max_candidates must be >= 1")

    # seq ids are only unique within a track, and the blocking join is
    # single-key: probe with a synthetic "seq track" id, split it back
    cand = _rekeyed_candidates(
        fixes, lines, radius_m, track_col, seq_col, lon_col, lat_col,
        line_id, coords_col, max_chunks_per_segment,
    )

    # one candidate per (fix, line): that line's closest point
    per_line = cand.groupBy(track_col, seq_col, line_id).agg(
        F.min(F.struct("_d2", "seg_idx", "_t", "_sx", "_sy")).alias("_b")
    )
    # keep the max_candidates nearest lines per fix, nearest first
    w = Window.partitionBy(track_col, seq_col).orderBy(
        F.col("_b._d2").asc(), F.col(line_id).asc()
    )
    topk = (
        per_line.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_candidates)
        .select(
            track_col, seq_col, line_id,
            F.col("_b.seg_idx").alias("seg_idx"),
            F.col("_b._t").alias("seg_t"),
            F.col("_b._sx").alias("_sx"),
            F.col("_b._sy").alias("_sy"),
            F.col("_b._d2").alias("_d2"),
            F.col("_rk"),
        )
    )

    # every fix joins its candidate list (possibly empty -> left join)
    fix_keyed = fixes.select(
        F.col(track_col).cast("string").alias(track_col),
        F.col(seq_col).cast("long").alias(seq_col),
        F.col(lon_col).cast("double").alias(lon_col),
        F.col(lat_col).cast("double").alias(lat_col),
        (F.lit(WGS84_RADIUS) * F.radians(F.col(lon_col))).alias("_px"),
        (F.lit(WGS84_RADIUS) * F.log(
            F.tan(F.lit(math.pi / 4.0) + F.radians(F.col(lat_col)) / 2.0)
        )).alias("_py"),
    )
    joined = fix_keyed.join(topk, [track_col, seq_col], "left")

    schema = _OUT_SCHEMA.format(
        track=track_col, seq=seq_col, lon=lon_col, lat=lat_col, line=line_id
    )
    two_sigma2 = 2.0 * sigma * sigma

    def viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([seq_col, "_rk"], na_position="last")
        track = pdf[track_col].iloc[0]
        out_rows = []
        fix_groups = []
        for sq, g in pdf.groupby(seq_col, sort=True):
            has = g["_rk"].notna().to_numpy()
            fix_groups.append((sq, g[has] if has.any() else None,
                               float(g[lon_col].iloc[0]),
                               float(g[lat_col].iloc[0]),
                               float(g["_px"].iloc[0]),
                               float(g["_py"].iloc[0])))

        def flush(chain):
            """Viterbi over one unbroken chain of candidate fixes."""
            if not chain:
                return
            T = len(chain)
            xs = [c[1]["_sx"].to_numpy(float) for c in chain]
            ys = [c[1]["_sy"].to_numpy(float) for c in chain]
            em = [-(c[1]["_d2"].to_numpy(float)) / two_sigma2 for c in chain]
            score = em[0]
            back: list[np.ndarray] = []
            for t in range(1, T):
                gc = math.hypot(chain[t][4] - chain[t - 1][4],
                                chain[t][5] - chain[t - 1][5])
                dx = xs[t][None, :] - xs[t - 1][:, None]
                dy = ys[t][None, :] - ys[t - 1][:, None]
                trans = -np.abs(np.hypot(dx, dy) - gc) / beta
                tot = score[:, None] + trans
                bp = np.argmax(tot, axis=0)  # first max = nearest-first
                back.append(bp)
                score = tot[bp, np.arange(len(xs[t]))] + em[t]
            best = int(np.argmax(score))
            picks = [0] * T
            picks[T - 1] = best
            for t in range(T - 2, -1, -1):
                picks[t] = int(back[t][picks[t + 1]])
            for t, (sq, g, lon, lat, _px, _py) in enumerate(chain):
                row = g.iloc[picks[t]]
                out_rows.append((
                    track, int(sq), lon, lat, True,
                    row[line_id], int(row["seg_idx"]), float(row["seg_t"]),
                    math.degrees(float(row["_sx"]) / WGS84_RADIUS),
                    math.degrees(2.0 * math.atan(
                        math.exp(float(row["_sy"]) / WGS84_RADIUS))
                        - math.pi / 2.0),
                    math.sqrt(float(row["_d2"])),
                ))

        chain = []
        for sq, g, lon, lat, px, py in fix_groups:
            if g is None:  # gap: no candidate in radius -> break chain
                flush(chain)
                chain = []
                out_rows.append((track, int(sq), lon, lat, False,
                                 None, None, None, None, None, None))
            else:
                chain.append((sq, g, lon, lat, px, py))
        flush(chain)
        return pd.DataFrame(out_rows, columns=[
            track_col, seq_col, lon_col, lat_col, "matched", line_id,
            "seg_idx", "seg_t", "snap_lon", "snap_lat", "dist_m",
        ])

    return joined.groupBy(track_col).applyInPandas(viterbi, schema=schema)


def _rekeyed_candidates(
    fixes, lines, radius_m, track_col, seq_col, lon_col, lat_col,
    line_id, coords_col, max_chunks,
):
    """candidate_segments keyed by (track, seq): the probe point id is
    a synthetic "<seq> <track>" string (seq FIRST, so a limit-2 split
    keeps track ids containing spaces intact), split back after the
    join so the blocking join itself stays single-key."""
    keyed = fixes.select(
        F.concat_ws(
            " ", F.col(seq_col).cast("string"),
            F.col(track_col).cast("string"),
        ).alias("_tgk"),
        F.col(lon_col), F.col(lat_col),
    )
    _, cand = candidate_segments(
        keyed, lines, radius_m=radius_m, point_id="_tgk",
        lon_col=lon_col, lat_col=lat_col, line_id=line_id,
        coords_col=coords_col, max_chunks_per_segment=max_chunks,
    )
    split = F.split(F.col("_pid"), " ", 2)
    return cand.select(
        split.getItem(1).alias(track_col),
        split.getItem(0).cast("long").alias(seq_col),
        line_id, "seg_idx", "_t", "_sx", "_sy", "_d2",
    )
