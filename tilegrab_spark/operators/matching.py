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
- transition log p = -|route - great_circle| / beta   (exponential).
  ``route`` is the planar snap-to-snap distance by default
  (``route="planar"`` — exact when consecutive fixes land on the same
  or directly connected lines), or the paper's true NETWORK distance
  with ``route="network"`` (round 5): Dijkstra over the track's LOCAL
  candidate-line graph, built inside the per-track kernel from
  kind-tagged geometry rows — no extra Spark stage, no global SSSP,
  and disconnected-road shortcuts (parallel carriageways, unnoded
  crossings) are penalized out of the path;
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

import heapq
import json
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from tilegrab_spark.kernels.geo import WGS84_RADIUS
from tilegrab_spark.operators.snap import candidate_segments

__all__ = ["match_tracks"]


class _LocalRouter:
    """Shortest-path distances over ONE track's candidate-line graph
    (kernel-local; built from the group's kind-tagged geometry rows).
    Vertices = polyline vertices merged at shared coordinates (1 mm
    rounding in Mercator meters — noded networks share them exactly);
    edge weights = planar segment lengths, matching the snap distances
    the candidates carry. Snap points enter as offsets along their
    segment; same-segment pairs take the direct along-segment
    distance."""

    def __init__(self, coords_json_by_line: dict):
        self._nodes: dict = {}
        self._adj: list = []
        self._lines: dict = {}
        for lid, cj in coords_json_by_line.items():
            if cj is None:
                continue
            pts = json.loads(cj)
            xy = [
                (
                    WGS84_RADIUS * math.radians(float(p[0])),
                    WGS84_RADIUS
                    * math.log(math.tan(math.pi / 4.0 + math.radians(float(p[1])) / 2.0)),
                )
                for p in pts
            ]
            ids = [self._node(x, y) for x, y in xy]
            lens = [
                math.hypot(xy[i + 1][0] - xy[i][0], xy[i + 1][1] - xy[i][1])
                for i in range(len(xy) - 1)
            ]
            for i, seg_len in enumerate(lens):
                if seg_len > 0.0:
                    a, b = ids[i], ids[i + 1]
                    self._adj[a].append((b, seg_len))
                    self._adj[b].append((a, seg_len))
            self._lines[lid] = (ids, lens)

    def _node(self, x: float, y: float) -> int:
        k = (round(x, 3), round(y, 3))
        i = self._nodes.get(k)
        if i is None:
            i = self._nodes[k] = len(self._adj)
            self._adj.append([])
        return i

    def _endpoints(self, lid, seg: int, t: float):
        ids, lens = self._lines[lid]
        seg_len = lens[seg]
        return ids[seg], ids[seg + 1], t * seg_len, (1.0 - t) * seg_len

    def _dijkstra(self, init: dict) -> dict:
        dist = dict(init)
        pq = [(d, n) for n, d in init.items()]
        heapq.heapify(pq)
        while pq:
            d, n = heapq.heappop(pq)
            if d > dist.get(n, math.inf):
                continue
            for m, w in self._adj[n]:
                nd = d + w
                if nd < dist.get(m, math.inf):
                    dist[m] = nd
                    heapq.heappush(pq, (nd, m))
        return dist

    def pairwise(self, g_from: pd.DataFrame, g_to: pd.DataFrame, line_col: str):
        """(len(g_from), len(g_to)) network distances between the two
        candidate sets, row order preserved; inf when no path."""
        src = list(
            zip(g_from[line_col], g_from["seg_idx"].astype(int), g_from["seg_t"].astype(float))
        )
        dst = list(
            zip(g_to[line_col], g_to["seg_idx"].astype(int), g_to["seg_t"].astype(float))
        )
        out = np.full((len(src), len(dst)), np.inf)
        for i, (lid, seg, t) in enumerate(src):
            if lid not in self._lines:
                continue
            a, b, da, db = self._endpoints(lid, seg, t)
            dist = self._dijkstra({a: da, b: db} if a != b else {a: min(da, db)})
            for j, (lid2, seg2, t2) in enumerate(dst):
                if lid2 not in self._lines:
                    continue
                a2, b2, da2, db2 = self._endpoints(lid2, seg2, t2)
                best = min(
                    dist.get(a2, math.inf) + da2, dist.get(b2, math.inf) + db2
                )
                if lid2 == lid and seg2 == seg:
                    best = min(best, abs(t - t2) * self._lines[lid][1][seg])
                out[i, j] = best
        return out

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
    route: str = "planar",
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

    ``route`` selects the transition-distance model (round 5 closes the
    module's documented no-router simplification):

    - ``"planar"`` (default, the prior behaviour): straight-line
      distance between consecutive candidate snap points — exact when
      consecutive fixes land on the same or directly connected lines;
    - ``"network"``: the paper's ACTUAL route distance, computed over
      the LOCAL line graph of each track's candidate lines (vertices =
      polyline vertices merged at shared coordinates, weights = planar
      segment lengths; snap points enter as offsets along their
      segment; one Dijkstra per source candidate per transition,
      all inside the per-track grouped kernel — no new Spark stage, no
      global SSSP). Candidate pairs with NO path through the local
      network (disconnected roads) are heavily penalized, which is
      exactly what kills the wrong-shortcut between parallel
      disconnected carriageways that planar distance cannot see.

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
    if route not in ("planar", "network"):
        raise ValueError(f"route must be 'planar' or 'network', got {route!r}")

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
    joined = fix_keyed.join(topk, [track_col, seq_col], "left").withColumn(
        "_coords_json", F.lit(None).cast("string")
    )
    if route == "network":
        # ship each track's candidate-line GEOMETRY into its group as
        # kind-tagged rows (the polygonize union pattern): seq NULL
        # marks a geometry row; the kernel builds the local graph from
        # them. One row per (track, candidate line) — candidate-sized,
        # never the whole network.
        geo_rows = (
            topk.select(track_col, line_id)
            .distinct()
            .join(
                lines.select(
                    F.col(line_id), F.to_json(F.col(coords_col)).alias("_coords_json")
                ),
                line_id,
            )
            .select(
                F.col(track_col),
                F.lit(None).cast("long").alias(seq_col),
                F.lit(None).cast("double").alias(lon_col),
                F.lit(None).cast("double").alias(lat_col),
                F.lit(None).cast("double").alias("_px"),
                F.lit(None).cast("double").alias("_py"),
                F.col(line_id),
                F.lit(None).cast("int").alias("seg_idx"),
                F.lit(None).cast("double").alias("seg_t"),
                F.lit(None).cast("double").alias("_sx"),
                F.lit(None).cast("double").alias("_sy"),
                F.lit(None).cast("double").alias("_d2"),
                F.lit(None).cast("int").alias("_rk"),
                F.col("_coords_json"),
            )
        )
        joined = joined.unionByName(geo_rows.select(*joined.columns))

    schema = _OUT_SCHEMA.format(
        track=track_col, seq=seq_col, lon=lon_col, lat=lat_col, line=line_id
    )
    two_sigma2 = 2.0 * sigma * sigma
    use_network = route == "network"

    # The Viterbi is CPU-bound Python, not bytes-bound (the mosaic
    # lesson, mosaic.py:270): a track's candidate rows are a few KB, so
    # AQE's byte-sized partition coalescing collapses the grouped map
    # to one-few Python workers (measured: flat 2-core == 8-core wall
    # on the matching bench). Pin the stage's parallelism with an
    # explicit repartition on the group key — groupBy reuses the
    # compatible hash partitioning (no extra shuffle) and AQE leaves
    # user repartitions alone.
    nparts = fixes.sparkSession.sparkContext.defaultParallelism * 2
    joined = joined.repartition(nparts, track_col)

    def viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        track = pdf[track_col].iloc[0]
        router = None
        if use_network:
            geom = pdf[pdf[seq_col].isna()]
            pdf = pdf[pdf[seq_col].notna()]
            if pdf.empty:
                return pd.DataFrame(columns=[
                    track_col, seq_col, lon_col, lat_col, "matched", line_id,
                    "seg_idx", "seg_t", "snap_lon", "snap_lat", "dist_m",
                ])
            router = _LocalRouter(
                dict(zip(geom[line_id], geom["_coords_json"]))
            )
        pdf = pdf.sort_values([seq_col, "_rk"], na_position="last")
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
                if router is not None:
                    route_d = router.pairwise(chain[t - 1][1], chain[t][1], line_id)
                    # unreachable (disconnected roads): a huge finite
                    # penalty, not -inf — the DP stays total and any
                    # reachable alternative wins outright
                    trans = np.where(
                        np.isfinite(route_d),
                        -np.abs(route_d - gc) / beta,
                        -1e15,
                    )
                else:
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
