"""Benchmark harness — prints ONE JSON line on stdout.

Headline metrics follow BASELINE.json: join rows/sec (J1 cell-key join,
salted, vs a skewed image table) and tiles merged/sec (A2/W1 mosaic
stitch), plus the relational + training-data query suite on the driver's
sf tables. Input image table is generated once (deterministic, FIXTURES
§2 pixels) and cached under /tmp keyed by its spec.

Measurement policy: STEADY-STATE. Each short query runs once untimed
(compiles whole-stage codegen, spins up Python workers, warms the page
cache) and the timed figure is the best of the next two runs. On a real
10^12-row cluster job those one-time per-plan costs (janino compile is
~1-2s per plan shape regardless of core count) amortize to zero; timing
them would measure the JIT, not the engine. ``mosaic_stitch`` is
cold-timed (30-95s of real work; compile share is noise) and
``tile_select`` is cold-timed because its result is persisted for the
downstream stages (a second run would read the cache and measure
nothing). BENCH_STEADY=0 reverts to cold single-run timing everywhere.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_SCALE (image-table edge in tiles, default 192 -> 36,864 cells),
     BENCH_STEADY (default 1 -> warmup + best-of-2 for short queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

# BLAS threading under Spark oversubscribes (every task would spawn
# n_cores BLAS threads — a "2-core" run secretly isn't); pin to 1 so
# core counts mean what they say. Set BEFORE pyspark launches the JVM
# (python workers inherit the JVM's environment).
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import pandas as pd


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_images(spark, path: str, edge: int, zoom: int, nsrcs: int = 2):
    """Image table: edge x edge cells at `zoom`, srcs {0..nsrcs-1}, plus a
    2000-dup hot cell (dense-urban skew) — generated distributed, cached.
    ``nsrcs`` scales the join-stage work per tile (multiple revisions per
    cell, the realistic shape of a 10^12-row image table) without touching
    the stitch stage (which selects src 0 only)."""
    import glob

    if glob.glob(f"{path}/_SUCCESS"):
        return
    from pyspark.sql import functions as F

    from tilegrab_spark.sources.images import cell_id_col, IMAGE_SCHEMA, _gen_batch

    x0, y0 = 23000, 15000
    n = edge * edge
    spec = (
        spark.range(n * nsrcs)
        .withColumn("src", (F.col("id") % nsrcs).cast("int"))
        .withColumn("cell", (F.col("id") / nsrcs).cast("long"))
        .withColumn("x", F.lit(x0) + (F.col("cell") / edge).cast("long"))
        .withColumn("y", F.lit(y0) + F.pmod(F.col("cell"), F.lit(edge)).cast("long"))
        .withColumn("z", F.lit(zoom))
        .select("z", "x", "y", "src")
    )
    hot = (
        spark.range(2000)
        .withColumn("z", F.lit(zoom))
        .withColumn("x", F.lit(x0 + 5))
        .withColumn("y", F.lit(y0 + 5))
        .withColumn("src", (F.col("id") + 100).cast("int"))
        .select("z", "x", "y", "src")
    )
    cells = spec.unionByName(hot)
    from tilegrab_spark.sources.images import write_synthetic_image_table

    t0 = time.time()
    write_synthetic_image_table(spark, path, cells, n_buckets=32)
    log(f"generated image table {path} in {time.time()-t0:.1f}s")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    edge = int(os.environ.get("BENCH_SCALE", "192"))
    nsrcs = int(os.environ.get("BENCH_SRCS", "2"))
    zoom = 15
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1

    from pyspark.sql import functions as F

    from tilegrab_spark import get_spark

    spark = get_spark(
        app_name="tilegrab-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # BENCH_STAGES: "all" (default) runs everything; "headline" stops
    # after the geometry scaling stages (bench_scaling.py); "llm" runs
    # ONLY the two iterative LLM stages (LLM scaling runs skip the
    # image-table generation entirely)
    stages = os.environ.get("BENCH_STAGES", "all")

    img_path = f"/tmp/tilegrab_bench/images_e{edge}_z{zoom}" + (
        f"_s{nsrcs}" if nsrcs != 2 else ""
    )
    if stages not in ("llm", "cc", "r4geo", "s2", "graphsim", "mediasim", "matching"):
        ensure_images(spark, img_path, edge, zoom, nsrcs)

    # warmup: spin up JVM codegen + Python workers so the first timed
    # stage doesn't pay session fixed costs
    @F.pandas_udf("long")
    def _warm(v: pd.Series) -> pd.Series:
        return v
    spark.range(1_000_000).select(F.sum(F.col("id"))).collect()
    spark.range(10_000).select(F.sum(_warm(F.col("id")))).collect()

    from tilegrab_spark.functions.cells import tile_bounds_cols
    from tilegrab_spark.kernels import geo
    from tilegrab_spark.operators.image_join import join_images
    from tilegrab_spark.operators.knn import knn_join
    from tilegrab_spark.operators.mosaic import mosaic
    from tilegrab_spark.operators.tiles import enumerate_tiles, refine_by_shape
    from tilegrab_spark.sources.geometries import geometry_from_rings
    from tilegrab_spark.sources.images import read_image_table

    # geometry covering ~60% of the bench tile grid (diamond) in 4326
    x0, y0 = 23000, 15000
    mnl0, mnt0, _, _ = geo.tile_bounds(x0, y0 + edge, zoom)
    _, _, mxl0, mxt0 = geo.tile_bounds(x0 + edge, y0, zoom)
    cx, cy = (mnl0 + mxl0) / 2, (mnt0 + mxt0) / 2
    ring = [
        (mnl0, cy), (cx, mxt0), (mxl0, cy), (cx, mnt0), (mnl0, cy),
    ]
    geom = geometry_from_rings("bench", [ring])

    steady = os.environ.get("BENCH_STEADY", "1") != "0"
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn, *, cold: bool = False, repeats: int = 1):
        if steady and not cold:
            fn()  # untimed: codegen compile, Python workers, page cache
            runs = 2
        else:
            # long cold stages: best-of-`repeats` tames the box's ±10-15%
            # run-to-run swing (turbo/thermal) without an untimed warmup
            runs = repeats if steady else 1
        best, c = None, None
        for _ in range(runs):
            t0 = time.time()
            c = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        counts[name] = c
        log(f"{name}: {best:.2f}s ({c} rows)")
        return c

    images = (
        read_image_table(spark, img_path)
        if stages not in ("llm", "cc", "r4geo", "s2", "graphsim", "mediasim", "matching")
        else None
    )
    if stages in ("llm", "cc"):
        n_docs = _llm_stages(spark, sf_dir, timed, stages)
        _emit(timings, counts, None, sf, cpus, n_docs=n_docs)
        spark.stop()
        return
    if stages == "r4geo":
        _r4geo_stages(spark, sf_dir, timed, (mnl0, mnt0, mxl0, mxt0))
        _emit(timings, counts, None, sf, cpus)
        spark.stop()
        return

    # BENCH_STAGES=s2: pure-Catalyst spherical-addressing throughput
    # (gated). No input files — BENCH_S2_N hash-spread global points;
    # s2_encode runs the full trig+face+quadratic-ST+Hilbert-fold
    # pipeline at level 18, hilbert_encode the bare 18-level fold. The
    # modular-sum aggregate consumes the key so the projection can't
    # prune away; W scales linearly with N (the N-vs-4N comparison
    # measures codegen throughput, not task-launch fixed cost).
    if stages == "s2":
        from tilegrab_spark.functions.interop import hilbert_key_col
        from tilegrab_spark.functions.s2cells import s2_cell_col

        n_pts = int(os.environ.get("BENCH_S2_N", "20000000"))
        pts = spark.range(n_pts).select(
            (F.pmod(F.xxhash64("id"), F.lit(360000)) / 1000.0 - 180.0).alias("lon"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(180000)) / 1000.0 - 90.0).alias("lat"),
            F.pmod(F.col("id"), F.lit(1 << 18)).alias("tx"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1 << 18)).alias("ty"),
        )

        def s2_encode():
            pts.select(
                s2_cell_col(F.col("lon"), F.col("lat"), 18).alias("c")
            ).agg(F.sum(F.pmod(F.col("c"), F.lit(997)))).collect()
            return n_pts

        def hilbert_encode():
            pts.select(
                hilbert_key_col(F.col("tx"), F.col("ty"), 18).alias("k")
            ).agg(F.sum(F.pmod(F.col("k"), F.lit(997)))).collect()
            return n_pts

        timed("s2_encode", s2_encode, cold=True, repeats=2)
        timed("hilbert_encode", hilbert_encode, cold=True, repeats=2)
        _emit(timings, counts, None, sf, cpus)
        spark.stop()
        return

    # BENCH_STAGES=graphsim: the two round-4 graph/trajectory additions
    # (gated). No input files — both tables are hash-derived.
    # track_hausdorff: BENCH_SIM_GROUPS convoys of 8 jittered copies of
    # a 64-fix route, centers spread globally so only within-convoy
    # pairs are candidates; refine work ∝ groups × 28 pairs × 64²
    # great-circle evals in the default Arrow (numpy-matrix) refine
    # (W ∝ BENCH_SIM_GROUPS). pagerank:
    # BENCH_PR_EDGES hash edges over BENCH_PR_NODES nodes, 5 rounds —
    # per-round W ∝ edges (join + partial sum), so total W ∝ edges×5.
    if stages == "graphsim":
        from tilegrab_spark.operators.graph import pagerank
        from tilegrab_spark.operators.tracksim import track_similarity_join

        groups = int(os.environ.get("BENCH_SIM_GROUPS", "600"))
        fixes = (
            spark.range(groups * 8 * 64)
            .select(
                (F.col("id") / 512).cast("long").alias("_g"),
                (F.col("id") / 64).cast("long").alias("_t"),
                F.pmod(F.col("id"), F.lit(64)).alias("_i"),
            )
            .select(
                F.col("_t").cast("string").alias("track_id"),
                (F.col("_i") * 30.0).alias("ts"),
                (
                    F.pmod(F.xxhash64("_g"), F.lit(330000)) / 1000.0
                    - 165.0
                    + 0.001 * F.col("_i")
                    + 1e-4 * F.pmod(F.col("_t"), F.lit(8))
                ).alias("lon"),
                (
                    F.pmod(F.xxhash64("_g", F.lit(1)), F.lit(110000)) / 1000.0
                    - 55.0
                    + 0.0006 * F.col("_i")
                ).alias("lat"),
            )
        )
        fixes.persist().count()

        def track_hausdorff():
            return track_similarity_join(fixes, 120.0).count()

        n_nodes = int(os.environ.get("BENCH_PR_NODES", "200000"))
        n_edges = int(os.environ.get("BENCH_PR_EDGES", "2000000"))
        edges = spark.range(n_edges).select(
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("dst"),
        )
        edges.persist().count()

        def pagerank_5():
            pagerank(edges, n_iter=5).agg(F.sum("rank")).collect()
            return n_edges * 5

        timed("track_hausdorff", track_hausdorff, cold=True, repeats=2)
        timed("pagerank_5", pagerank_5, cold=True, repeats=2)
        _emit(timings, counts, None, sf, cpus)
        spark.stop()
        return

    # BENCH_STAGES=matching: HMM map matching over a hash-synthesized
    # NODED street grid (gated). BENCH_MATCH_TRACKS tracks of 32 fixes
    # each walk a horizontal street with ±20 m lat noise; the grid has
    # shared vertices at every intersection so route="network" gets a
    # genuinely connected local graph. W ∝ tracks × fixes × candidates
    # (planar) plus the per-transition local Dijkstras (network).
    if stages == "matching":
        from tilegrab_spark.operators.matching import match_tracks

        G = int(os.environ.get("BENCH_MATCH_GRID", "24"))
        T = int(os.environ.get("BENCH_MATCH_TRACKS", "200"))
        s_deg = 0.002  # ~222 m street spacing
        lines_rows = []
        for j in range(G + 1):
            lines_rows.append(
                (f"h{j}", [[i * s_deg, j * s_deg] for i in range(G + 1)])
            )
            lines_rows.append(
                (f"v{j}", [[j * s_deg, i * s_deg] for i in range(G + 1)])
            )
        lines = spark.createDataFrame(
            lines_rows, "line_id string, coords array<array<double>>"
        )
        lines.persist().count()
        fixes = (
            spark.range(T * 32)
            .select(
                (F.col("id") / 32).cast("long").alias("_t"),
                F.pmod(F.col("id"), F.lit(32)).alias("_i"),
            )
            .select(
                F.col("_t").cast("string").alias("track_id"),
                F.col("_i").cast("long").alias("seq"),
                (
                    (F.pmod(F.xxhash64("_t", F.lit(1)), F.lit(max(1, G - 8))))
                    * s_deg
                    + F.col("_i") * (s_deg / 4.0)
                ).alias("lon"),
                (
                    F.pmod(F.xxhash64("_t"), F.lit(G + 1)) * s_deg
                    + (F.pmod(F.xxhash64("_t", "_i"), F.lit(361)) - 180)
                    * F.lit(1e-6)
                ).alias("lat"),
            )
        )
        fixes.persist().count()

        def match(mode):
            return match_tracks(
                fixes, lines, radius_m=60.0, route=mode
            ).filter(F.col("matched")).count()

        timed("match_planar", lambda: match("planar"), cold=True, repeats=2)
        timed("match_network", lambda: match("network"), cold=True, repeats=2)
        _emit(timings, counts, None, sf, cpus)
        spark.stop()
        return

    # BENCH_STAGES=mediasim: audio/video fingerprint + match throughput
    # (gated). Payloads synthesized in-session (engine WAV/AVI
    # encoders); work scales with BENCH_MEDIA_N items per modality.
    # Each item is a clip embedded in a longer recording, so the match
    # stage has real pairs to vote on, not an empty join.
    if stages == "mediasim":
        import numpy as np

        from tilegrab_spark.kernels.avi import encode_avi_mjpeg
        from tilegrab_spark.kernels.jpeg import encode_jpeg
        from tilegrab_spark.kernels.wav import encode_wav
        from tilegrab_spark.operators.audiosim import (
            audio_fingerprints, audio_match_pairs,
        )
        from tilegrab_spark.operators.videosim import (
            video_fingerprints, video_match_pairs,
        )

        n_items = int(os.environ.get("BENCH_MEDIA_N", "64"))
        SRm = 8000

        def aclip(seed):
            rng = np.random.default_rng(seed)
            tt = np.arange(3 * SRm) / SRm
            x = sum(
                float(rng.uniform(0.4, 1.0))
                * np.sin(2 * np.pi * float(rng.uniform(200, 3200)) * tt)
                for _ in range(6)
            )
            return x / np.max(np.abs(x)) * 12000.0

        arows = []
        for i in range(n_items):
            c = aclip(i)
            arows.append((f"c{i}", bytearray(encode_wav(c, SRm))))
            lng = np.random.default_rng(10_000 + i).normal(0, 300, 8 * SRm)
            lng[2 * SRm : 2 * SRm + len(c)] += c
            arows.append((f"l{i}", bytearray(encode_wav(lng, SRm))))
        adf = spark.createDataFrame(arows, "audio_id string, payload binary")
        adf = adf.repartition(cpus).persist()
        adf.count()

        def vframe(seed):
            rng = np.random.default_rng(seed)
            b = rng.integers(30, 225, (8, 8), dtype=np.uint8)
            g = np.kron(b, np.ones((12, 12), dtype=np.uint8))
            return np.stack([g, g, g], axis=2)

        vrows = []
        for i in range(n_items):
            seeds = list(range(i * 100, i * 100 + 8))
            clip = [encode_jpeg(vframe(s), 90) for s in seeds]
            lng = (
                [encode_jpeg(vframe(s), 60) for s in range(i * 100 + 50, i * 100 + 54)]
                + [encode_jpeg(vframe(s), 60) for s in seeds]
                + [encode_jpeg(vframe(s), 60) for s in range(i * 100 + 60, i * 100 + 64)]
            )
            vrows.append((f"vc{i}", bytearray(encode_avi_mjpeg(clip, 10.0, 96, 96))))
            vrows.append((f"vl{i}", bytearray(encode_avi_mjpeg(lng, 10.0, 96, 96))))
        vdf = spark.createDataFrame(vrows, "video_id string, payload binary")
        vdf = vdf.repartition(cpus).persist()
        vdf.count()

        def audio_pipeline():
            return audio_match_pairs(
                audio_fingerprints(adf), min_votes=5
            ).count()

        def video_pipeline():
            return video_match_pairs(
                video_fingerprints(vdf), min_votes=4
            ).count()

        timed("audio_fp_match", audio_pipeline, cold=True, repeats=2)
        timed("video_fp_match", video_pipeline, cold=True, repeats=2)
        _emit(timings, counts, None, sf, cpus)
        spark.stop()
        return

    # BENCH_STAGES=polygonize: the raster→vector machinery alone (gated
    # off the headline suite). Smooth 3-class raw-fmt tiles so the time
    # measures labeling/border-resolve/CC/ring-assembly, not PNG decode;
    # regions span many tiles, exercising the merge CC. BENCH_R4POLY_G
    # scales the grid edge (work ∝ G², cross-tile merges ∝ G²·perimeter).
    if stages == "polygonize":
        import numpy as np

        from tilegrab_spark.operators.dedup import release_signature_caches
        from tilegrab_spark.operators.polygonize import polygonize

        g = int(os.environ.get("BENCH_R4POLY_G", "12"))
        tpx = 256

        def gen(batches):
            for pdf in batches:
                out = []
                for r in pdf.itertuples(index=False):
                    tx, ty = int(r.tx), int(r.ty)
                    gx = np.arange(tx * tpx, (tx + 1) * tpx, dtype=np.float64)
                    gy = np.arange(ty * tpx, (ty + 1) * tpx, dtype=np.float64)
                    field = np.sin(gx[None, :] / 353.0) + np.sin(gy[:, None] / 457.0)
                    lab = np.clip(np.floor(field * 0.9 + 1.5), 0, 2).astype(np.uint8)
                    rgb = np.repeat(lab[:, :, None], 3, axis=2)
                    out.append((12, tx, ty, rgb.tobytes(), tpx, tpx, "raw"))
                yield pd.DataFrame(
                    out, columns=["z", "x", "y", "bytes", "w", "h", "fmt"]
                )

        grid = spark.range(g * g).select(
            (F.col("id") % g).alias("tx"), (F.col("id") / g).cast("long").alias("ty")
        )
        cat_tiles = grid.mapInPandas(
            gen, schema="z int, x long, y long, bytes binary, w int, h int, fmt string"
        )

        def q_polygonize():
            n = polygonize(cat_tiles, zoom=12).count()
            release_signature_caches()
            return n

        timed("polygonize_rings", q_polygonize, cold=True, repeats=2)
        _emit(timings, counts, None, sf, cpus)
        spark.stop()
        return

    # BENCH_STAGES=hydrology: D8 flow accumulation + watersheds (gated
    # off the headline suite). Smooth synthetic terrain with a global
    # eastward gradient so drainage chains cross the whole G-tile grid
    # — flow_accumulation's routing rounds scale with the longest
    # tile-hop path (≈G) and watersheds' pointer doubling with log G;
    # BENCH_R4HYDRO_G scales the grid edge (raster work ∝ G²).
    if stages == "hydrology":
        import numpy as np

        from tilegrab_spark.operators.hydrology import (
            flow_accumulation,
            watersheds,
        )

        g = int(os.environ.get("BENCH_R4HYDRO_G", "8"))
        tpx = 256

        def gen(batches):
            for pdf in batches:
                out = []
                for r in pdf.itertuples(index=False):
                    tx, ty = int(r.tx), int(r.ty)
                    gx = np.arange(tx * tpx, (tx + 1) * tpx, dtype=np.float64)
                    gy = np.arange(ty * tpx, (ty + 1) * tpx, dtype=np.float64)
                    ramp = 220.0 - 160.0 * gx[None, :] / (g * tpx)
                    ridge = 25.0 * np.sin(gy[:, None] / 217.0) * np.sin(gx[None, :] / 331.0)
                    lab = np.clip(ramp + ridge, 0, 255).astype(np.uint8)
                    rgb = np.repeat(lab[:, :, None], 3, axis=2)
                    out.append((12, tx, ty, rgb.tobytes(), tpx, tpx, "raw"))
                yield pd.DataFrame(
                    out, columns=["z", "x", "y", "bytes", "w", "h", "fmt"]
                )

        grid = spark.range(g * g).select(
            (F.col("id") % g).alias("tx"), (F.col("id") / g).cast("long").alias("ty")
        )
        terrain = grid.mapInPandas(
            gen, schema="z int, x long, y long, bytes binary, w int, h int, fmt string"
        )
        timed(
            "flow_accumulation",
            lambda: flow_accumulation(terrain, zoom=12, max_rounds=4 * g).count(),
            cold=True,
            repeats=2,
        )
        timed(
            "watersheds",
            lambda: watersheds(terrain, zoom=12, max_rounds=64).count(),
            cold=True,
            repeats=2,
        )
        _emit(timings, counts, None, sf, cpus)
        spark.stop()
        return

    # BENCH_STAGES=interp: kriging + pairwise line-of-sight (gated).
    # Samples and sight-line pairs are hash-derived (deterministic, no
    # data files); BENCH_R4INTERP_N scales the sample count (both the
    # variogram pair sweep and the paint fan-in), BENCH_R4INTERP_PAIRS
    # the LOS batch. Terrain reuses the wavefront generator grid.
    if stages == "interp":
        import numpy as np

        from tilegrab_spark.operators.kriging import (
            empirical_variogram,
            fit_variogram,
            krige_tiles,
        )
        from tilegrab_spark.operators.sightline import line_of_sight

        # W-dominated sizing (the f+W/c lesson from the CC/hydrology
        # scaling records): ~435 touched tiles at zoom 9 so the paint
        # stage has real parallel work, not 3 s of fixed job overhead
        n_pts = int(os.environ.get("BENCH_R4INTERP_N", "250000"))
        n_pairs = int(os.environ.get("BENCH_R4INTERP_PAIRS", "6144"))
        u = lambda salt, mod: F.pmod(F.xxhash64(F.col("id") + F.lit(salt)), F.lit(mod)) / F.lit(float(mod))
        pts = spark.range(n_pts).select(
            (u(1, 1_000_003) * 18.0).alias("lon"),
            (F.lit(30.0) + u(2, 1_000_033) * 12.0).alias("lat"),
            (F.lit(50.0) + F.sin(u(3, 999_983) * 40.0) * 30.0).alias("val"),
        )
        emp = None

        def vario():
            nonlocal emp
            rows = empirical_variogram(
                pts, zoom=9, value_col="val", n_lags=12, max_lag_px=96.0
            ).collect()
            emp = rows
            return len(rows)

        timed("variogram_sweep", vario, cold=True, repeats=2)
        vg = fit_variogram(emp, model="exponential")
        timed(
            "krige_tiles",
            lambda: krige_tiles(
                pts, zoom=9, value_col="val", variogram=vg,
                vmin=0.0, vmax=100.0, radius_px=48.0, max_samples=48,
            ).count(),
            cold=True,
            repeats=2,
        )

        g = int(os.environ.get("BENCH_R4HYDRO_G", "8"))
        tpx = 256

        def gen(batches):
            for pdf in batches:
                out = []
                for r in pdf.itertuples(index=False):
                    tx, ty = int(r.tx), int(r.ty)
                    gx = np.arange(tx * tpx, (tx + 1) * tpx, dtype=np.float64)
                    gy = np.arange(ty * tpx, (ty + 1) * tpx, dtype=np.float64)
                    lab = np.clip(
                        120.0
                        + 60.0 * np.sin(gy[:, None] / 197.0)
                        + 60.0 * np.sin(gx[None, :] / 283.0),
                        0, 255,
                    ).astype(np.uint8)
                    rgb = np.repeat(lab[:, :, None], 3, axis=2)
                    out.append((12, tx, ty, rgb.tobytes(), tpx, tpx, "raw"))
                yield pd.DataFrame(
                    out, columns=["z", "x", "y", "bytes", "w", "h", "fmt"]
                )

        grid = spark.range(g * g).select(
            (F.col("id") % g).alias("tx"), (F.col("id") / g).cast("long").alias("ty")
        )
        terrain = grid.mapInPandas(
            gen, schema="z int, x long, y long, bytes binary, w int, h int, fmt string"
        ).localCheckpoint()
        lim = g * tpx
        pairs = spark.range(n_pairs).select(
            F.col("id").alias("pair_id"),
            F.pmod(F.xxhash64(F.col("id") + F.lit(11)), F.lit(lim)).alias("gx_a"),
            F.pmod(F.xxhash64(F.col("id") + F.lit(12)), F.lit(lim)).alias("gy_a"),
            F.pmod(F.xxhash64(F.col("id") + F.lit(13)), F.lit(lim)).alias("gx_b"),
            F.pmod(F.xxhash64(F.col("id") + F.lit(14)), F.lit(lim)).alias("gy_b"),
        )
        timed(
            "line_of_sight",
            lambda: line_of_sight(
                terrain, pairs, zoom=12, tile_px=tpx, observer_height=15.0,
                max_steps=8 * lim,
            ).count(),
            cold=True,
            repeats=2,
        )
        _emit(timings, counts, None, sf, cpus)
        spark.stop()
        return

    # BENCH_STAGES=wavefront: viewshed + cost_distance (gated). Same
    # terrain generator as the hydrology stage; viewshed observer at
    # the grid center (rounds = Manhattan ring count ~ G), one
    # cost-distance source in the NW corner (wavefront crosses the
    # whole grid). BENCH_R4HYDRO_G scales both.
    if stages == "wavefront":
        import numpy as np

        from tilegrab_spark.operators.costdistance import cost_distance
        from tilegrab_spark.operators.viewshed import viewshed

        g = int(os.environ.get("BENCH_R4HYDRO_G", "8"))
        tpx = 256

        def gen(batches):
            for pdf in batches:
                out = []
                for r in pdf.itertuples(index=False):
                    tx, ty = int(r.tx), int(r.ty)
                    gx = np.arange(tx * tpx, (tx + 1) * tpx, dtype=np.float64)
                    gy = np.arange(ty * tpx, (ty + 1) * tpx, dtype=np.float64)
                    ramp = 220.0 - 160.0 * gx[None, :] / (g * tpx)
                    ridge = 25.0 * np.sin(gy[:, None] / 217.0) * np.sin(gx[None, :] / 331.0)
                    lab = np.clip(ramp + ridge, 0, 255).astype(np.uint8)
                    rgb = np.repeat(lab[:, :, None], 3, axis=2)
                    out.append((12, tx, ty, rgb.tobytes(), tpx, tpx, "raw"))
                yield pd.DataFrame(
                    out, columns=["z", "x", "y", "bytes", "w", "h", "fmt"]
                )

        grid = spark.range(g * g).select(
            (F.col("id") % g).alias("tx"), (F.col("id") / g).cast("long").alias("ty")
        )
        terrain = grid.mapInPandas(
            gen, schema="z int, x long, y long, bytes binary, w int, h int, fmt string"
        )
        obs = (g * tpx // 2, g * tpx // 2)
        timed(
            "viewshed",
            lambda: viewshed(terrain, zoom=12, observer=obs, height=50.0).count(),
            cold=True,
            repeats=2,
        )
        srcs = spark.createDataFrame([(8, 8)], "gx long, gy long")
        timed(
            "cost_distance",
            lambda: cost_distance(
                terrain, srcs, zoom=12, max_rounds=8 * g
            ).count(),
            cold=True,
            repeats=2,
        )
        _emit(timings, counts, None, sf, cpus)
        spark.stop()
        return

    # 1. tile selection: enumerate full grid + PIP refine (J2) — cold
    # (the result is persisted for downstream stages; a re-run would
    # read that cache and measure nothing)
    tiles = enumerate_tiles(spark, geom, zoom)
    # project to the join keys before persisting: downstream stages
    # (J1 join, mosaic) need only (geom_id, z, x, y) — broadcasting the
    # PIP bounds columns would fatten the build side for nothing
    shape_tiles = refine_by_shape(tiles, geom).select("geom_id", "z", "x", "y").persist()
    timed("tile_select", lambda: shape_tiles.count(), cold=True)

    # BENCH_STAGES=timeseries: the epoch-stack operators only (gated
    # off the headline suite — their cost is tile_diff-class decode
    # work plus a PNG re-encode, and the headline totals stay
    # comparable across BENCH_r* rounds). Stack = both bench epochs of
    # the selection, keyed by cell.
    if stages == "timeseries":
        from tilegrab_spark.operators.timeseries import epoch_composite, raster_trend
        from tilegrab_spark.sources.images import cell_id_col

        def epoch_stack():
            return (
                join_images(shape_tiles, images.drop("cell_id"))
                .withColumn("cell_id", cell_id_col("z", "x", "y"))
                .withColumn(
                    "epoch",
                    F.when(F.col("image_id").endswith("_1"), 1.0).otherwise(0.0),
                )
            )

        def q_composite():
            c = epoch_composite(epoch_stack(), stat="median")
            return c.filter(F.col("status") == "ok").count()

        timed("epoch_composite", q_composite, cold=True, repeats=2)

        def q_trend():
            t = raster_trend(epoch_stack(), threshold=0.5)
            return t.filter(F.col("status") == "ok").count()

        timed("raster_trend", q_trend, cold=True, repeats=2)
        _emit(timings, counts, None, sf, cpus)
        spark.stop()
        return

    # 2. J1 join (broadcast tile set vs skewed image table) — count payload
    def q_join():
        j = join_images(shape_tiles, images.drop("cell_id"))
        return j.select(F.count("*"), F.sum(F.length("bytes"))).collect()[0][0]

    timed("cell_join", q_join)

    # 3. A2/W1 mosaic stitch in 4x4-tile groups over src=0
    def q_mosaic():
        j = join_images(
            shape_tiles, images.filter(F.col("image_id").endswith("_0")).drop("cell_id")
        )
        m = mosaic(j, group_w=4, group_h=4, full_groups_only=False, anchor=(x0, y0))
        return m.select(F.sum("n_tiles")).collect()[0][0]

    merged = timed("mosaic_stitch", q_mosaic, cold=True, repeats=2)

    # 3b. temporal change detection: epoch src=0 vs src=1 over the same
    # selection — one full-outer cell join + 2x full decode + diff stats
    # (operators/change.py); every matched tile differs, so no pixel work
    # is skippable
    def q_diff():
        from tilegrab_spark.operators.change import tile_diff
        from tilegrab_spark.sources.images import cell_id_col

        def epoch(suffix):
            j = join_images(
                shape_tiles,
                images.filter(F.col("image_id").endswith(suffix)).drop("cell_id"),
            )
            return j.withColumn("cell_id", cell_id_col("z", "x", "y"))

        d = tile_diff(epoch("_0"), epoch("_1"))
        return d.filter(F.col("status") == "changed").count()

    timed("tile_diff", q_diff, cold=True, repeats=2)

    # 3b-2. the REALISTIC monitoring shape: consecutive crawls are
    # mostly bit-identical — the byte-equality fast path answers those
    # JVM-side (no decode, no Python). Same join, same kernel plan;
    # only the payload content differs from 3b.
    def q_diff_same():
        from tilegrab_spark.operators.change import tile_diff
        from tilegrab_spark.sources.images import cell_id_col

        j = join_images(
            shape_tiles,
            images.filter(F.col("image_id").endswith("_0")).drop("cell_id"),
        ).withColumn("cell_id", cell_id_col("z", "x", "y"))
        d = tile_diff(j, j)
        return d.filter(F.col("status") == "unchanged").count()

    timed("tile_diff_unchanged", q_diff_same, cold=True, repeats=2)

    # 3c. focal halo exchange over one epoch: decode + edge-strip
    # emission + grouped assembly + integral-image box stats
    # (operators/focal.py); every tile does full pixel work
    def q_focal():
        from tilegrab_spark.operators.focal import focal_box_stats

        ep = images.filter(F.col("image_id").endswith("_0"))
        return focal_box_stats(ep, radius=1).filter(
            F.col("status") == "ok"
        ).count()

    timed("focal_box", q_focal, cold=True, repeats=2)

    # 4. kNN cell-ring expansion: 64 queries over the image grid
    def q_knn():
        qs = []
        for i in range(64):
            qx, qy = x0 + (i * 37) % edge, y0 + (i * 53) % edge
            b = geo.tile_bounds(qx, qy, zoom)
            qs.append((f"q{i}", float(b[0] + 0.3 * (b[2] - b[0])), float(b[1] + 0.7 * (b[3] - b[1]))))
        qdf = spark.createDataFrame(qs, "query_id string, lon double, lat double")
        cells = images.select("z", "x", "y", "image_id")
        return knn_join(qdf, cells, zoom, k=8).count()

    timed("knn_cell_ring", q_knn)

    # 4b. round-4 geospatial additions (snap/overlay/dsir) — also
    # runnable standalone via BENCH_STAGES=r4geo for scaling runs;
    # gated off the headline suite so bench_scaling.py is unchanged
    if stages == "all":
        _r4geo_stages(spark, sf_dir, timed, (mnl0, mnt0, mxl0, mxt0), dsir=False)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # word_jaccard_pairs / hll_distinct_sketch keep their historical
    # bench names (comparable across BENCH_r* rounds) though the
    # contract registry now folds them into union-tagged rows
    qs = dict(
        qs,
        word_jaccard_pairs=entrymod._word_jaccard,
        hll_distinct_sketch=entrymod._hll_sketch,
        # rotated out of the 50-row contract registry in round 5 but kept
        # under its historical bench name (comparable across BENCH_r*)
        q1_pricing_summary=entrymod._q1_pricing,
    )
    for name in () if stages != "all" else (
        "q1_pricing_summary",
        "equi_join_j1",
        "window_row_number",
        "tile_encode_p1",
        "dedup_exact",
        "word_jaccard_pairs",
        "ann_topk",
        "text_signals",
        "asof_join_events",
        "range_join_bands",
        "hll_distinct_sketch",
        "cms_frequencies",
    ):
        timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # 5b. DSIR importance weighting over the full documents table
    if stages == "all":
        _r4geo_stages(
            spark, sf_dir, timed, (mnl0, mnt0, mxl0, mxt0),
            snap=False, overlay=False,
        )

    # 6. LLM-pipeline stages at FULL document-table scale (the round-2
    # vectorized kernels; aggregates force the UDF columns so Catalyst
    # can't prune the work a bare count() would skip)
    n_docs = _llm_stages(spark, sf_dir, timed, stages) if stages == "all" else None

    _emit(timings, counts, merged, sf, cpus, n_docs=n_docs)
    spark.stop()


def _r4geo_stages(
    spark, sf_dir, timed, bbox, *, snap=True, overlay=True, dsir=True
):
    """Round-4 additions at synthetic-lake scale — all deterministic
    functions of the bench bbox (no RNG, no files). Scaling runs use
    BENCH_STAGES=r4geo to run exactly these three."""
    from pyspark.sql import functions as F

    from tilegrab_spark.kernels import geo

    # BENCH_R4GEO_MULT scales the synthetic lakes (points x mult,
    # polygon grid x sqrt(mult), documents x mult) so scaling runs
    # measure work W instead of fixed task-launch costs f — the same
    # knob discipline as BENCH_DOCS_MULT for the LLM stages
    mult = int(os.environ.get("BENCH_R4GEO_MULT", "1"))

    mnl0, mnt0, mxl0, mxt0 = bbox
    _, my0 = geo.lonlat_to_mercator(mnl0, mnt0)
    _, my1 = geo.lonlat_to_mercator(mxl0, mxt0)
    lane_m = (float(my1) - float(my0)) / 64.0

    def q_snap():
        from tilegrab_spark.operators.snap import snap_points_to_lines

        pts = spark.range(120_000 * mult).select(
            F.col("id").alias("point_id"),
            (F.lit(mnl0) + (F.col("id") % 977).cast("double") / 977.0
             * F.lit(mxl0 - mnl0)).alias("lon"),
            (F.lit(mnt0) + (F.col("id") % 983).cast("double") / 983.0
             * F.lit(mxt0 - mnt0)).alias("lat"),
        )
        lines = spark.range(64).select(
            F.col("id").alias("line_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(24)),
                lambda i: F.array(
                    F.lit(mnl0) + i.cast("double") / 24.0 * F.lit(mxl0 - mnl0),
                    F.lit(mnt0) + (F.col("id").cast("double") + 0.5) / 64.0
                    * F.lit(mxt0 - mnt0),
                ),
            ).alias("coords"),
        )
        return snap_points_to_lines(
            pts, lines, radius_m=lane_m / 2.0, how="inner"
        ).count()

    def q_overlay():
        from tilegrab_spark.operators.overlay import spatial_join_polygons

        grid_n = 32 * max(1, int(round(float(mult) ** 0.5)))
        sx = (mxl0 - mnl0) / grid_n
        sy = (mxt0 - mnt0) / grid_n

        def layer(offset: float):
            i = (F.col("id") % grid_n).cast("double")
            j = (F.col("id") / grid_n).cast("int").cast("double")
            x0c = F.lit(mnl0) + (i + F.lit(offset)) * F.lit(sx)
            y0c = F.lit(mnt0) + (j + F.lit(offset)) * F.lit(sy)
            x1c = x0c + F.lit(sx * 0.9)
            y1c = y0c + F.lit(sy * 0.9)
            return spark.range(grid_n * grid_n).select(
                F.col("id").cast("string").alias("geom_id"),
                F.array(
                    F.array(
                        F.array(x0c, y0c), F.array(x1c, y0c),
                        F.array(x1c, y1c), F.array(x0c, y1c),
                        F.array(x0c, y0c),
                    )
                ).alias("rings"),
            )

        # blocking zoom tracks the grid density so cells hold a constant
        # handful of polygons at every mult (the zoom-is-the-knob rule)
        import math as _math

        z = 9 + max(0, int(round(_math.log2(grid_n / 32))))
        return spatial_join_polygons(
            layer(0.0), layer(0.45), zoom=z, max_cover_cells=65536
        ).count()

    def q_dsir():
        from tilegrab_spark.operators.dsir import dsir_log_weights

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if mult > 1:
            # the sf parquet is a single split: repartition the BASE
            # table (cheap — pre-explode) so the xmult blow-up and the
            # gram hashing it feeds parallelize; at real scale the
            # thousands of input splits provide this for free
            docs = docs.repartition(spark.sparkContext.defaultParallelism)
            docs = docs.withColumn(
                "_r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            ).withColumn(
                "doc_id",
                F.col("doc_id")
                + F.col("_r").cast("long") * F.lit(10_000_000).cast("long"),
            ).drop("_r")
        target = docs.filter(F.col("lang") == "en").limit(200)
        w = dsir_log_weights(docs, target, n_buckets=1 << 14)
        # aggregate the weight VALUES — an isNotNull filter would let
        # Catalyst prune the whole weight computation (coalesce is
        # provably non-null)
        row = w.agg(
            F.sum(F.abs(F.col("dsir_logw"))).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        ).collect()[0]
        assert row["_s"] > 0
        return int(row["_n"])

    if snap:
        timed("snap_points", q_snap)
    if overlay:
        timed("overlay_join", q_overlay)
    if dsir:
        timed("dsir_weights", q_dsir)


def _llm_stages(spark, sf_dir, timed, stages):
    """LLM-pipeline stages at FULL document-table scale (the round-2
    vectorized kernels; aggregates force the UDF columns so Catalyst
    can't prune the work a bare count() would skip). BENCH_STAGES=llm
    runs only the two iterative stages whose 2->8 scaling BASELINE.md
    §5a records (minhash LSH, connected components)."""
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.components import connected_components
    from tilegrab_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
    from tilegrab_spark.operators.text import with_fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mult = int(os.environ.get("BENCH_DOCS_MULT", "1"))
    if mult > 1:
        # replicate the corpus with disjoint id ranges: identical texts
        # across replicas are REAL duplicate clusters for the LSH stage
        # (the realistic shape — web crawls are ~30-50% near-dup) and
        # scale the per-core work so fixed per-job costs amortize
        docs = (
            docs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
            .withColumn(
                "doc_id",
                F.col("doc_id") + F.col("_r").cast("long") * F.lit(10_000_000).cast("long"),
            )
            .drop("_r")
        )

    if stages == "cc":
        # CC-only W-dominated run (VERDICT r3 #6): BENCH_CC_DEGREE k-
        # neighbor chain edges per doc (>=10^6 edges at MULT=64, k=4) so
        # the scalable per-round work W/c dominates the per-round fixed
        # task-launch cost f that flattens the sandbox-scale profile.
        degree = int(os.environ.get("BENCH_CC_DEGREE", "4"))
        def q_cc_scale():
            d = docs.select("doc_id", "lang")
            a, b = d.alias("a"), d.alias("b")
            edges = None
            for k in range(1, degree + 1):
                e = a.join(
                    b,
                    (F.col("b.doc_id") == F.col("a.doc_id") + k)
                    & (F.col("a.lang") == F.col("b.lang")),
                ).select(F.col("a.doc_id").alias("id_a"),
                         F.col("b.doc_id").alias("id_b"))
                edges = e if edges is None else edges.unionByName(e)
            return connected_components(edges).count()

        timed("connected_components_scale", q_cc_scale)
        return docs.count()

    if stages == "all":
        def q_fingerprint():
            return with_fingerprint(docs).select(
                F.count("*"), F.max(F.element_at("fingerprint", 1))
            ).collect()[0][0]

        timed("doc_fingerprint_full", q_fingerprint)

    def q_lsh():
        return minhash_lsh_pairs(docs, threshold=0.5).count()

    timed("minhash_lsh_full", q_lsh)

    if stages == "all":
        def q_simhash():
            return simhash_pairs(docs, max_hamming=3).count()

        timed("simhash_pairs_full", q_simhash)

        def q_decon():
            from tilegrab_spark.operators.decontaminate import contamination_hits

            ev = docs.filter(F.col("doc_id") % 97 == 0).select(
                F.col("doc_id").alias("eval_id"), "text"
            )
            return contamination_hits(docs, ev).count()

        timed("decontaminate_full", q_decon)

        def q_spans():
            from tilegrab_spark.operators.spans import duplicate_spans

            # k=20 over the synthetic ~60-token docs so real spans exist
            return duplicate_spans(docs, k=20, min_docs=2).count()

        timed("duplicate_spans_full", q_spans)

        def q_hh():
            from tilegrab_spark.operators.heavyhitters import heavy_hitters

            return heavy_hitters(docs, "lang", min_frac=0.05).count()

        timed("heavy_hitters_full", q_hh)

        def q_clf():
            import numpy as np

            from tilegrab_spark.operators.classifier import score_documents

            rng = np.random.default_rng(0)
            w = rng.standard_normal(1 << 16)
            return score_documents(docs, w).select(
                F.count("*"), F.sum("score")
            ).collect()[0][0]

        timed("clf_score_full", q_clf)

        def q_bloom():
            from tilegrab_spark.operators.bloom import bloom_anti_join, bloom_build

            sketch = bloom_build(
                docs.filter(F.col("doc_id") % 2 == 0), "doc_id",
                m_bits=1 << 16, k_hashes=5,
            )
            return bloom_anti_join(
                docs, sketch, "doc_id", m_bits=1 << 16, k_hashes=5
            ).count()

        timed("bloom_filter_full", q_bloom)

        def q_bm25():
            from tilegrab_spark.operators.retrieval import bm25_search

            qs = docs.sparkSession.createDataFrame(
                [(i, t) for i, t in enumerate(
                    ["data quality pipeline", "tile mosaic engine",
                     "language model training", "spatial join index"]
                )],
                "query_id int, text string",
            )
            return bm25_search(
                docs.select("doc_id", "text"), qs, k=20
            ).count()

        timed("bm25_search_full", q_bm25)

        def q_funnel():
            from tilegrab_spark.operators.funnel import funnel_counts

            ev = docs.sparkSession.read.parquet(f"{sf_dir}/events.parquet")
            return funnel_counts(ev, ["view", "click", "purchase"]).count()

        timed("funnel_steps_full", q_funnel)

    def q_cc():
        d = docs.select("doc_id", "lang")
        a, b = d.alias("a"), d.alias("b")
        edges = a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id") + 1)
            & (F.col("a.lang") == F.col("b.lang")),
        ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        return connected_components(edges).count()

    timed("connected_components", q_cc)
    return docs.count()


# Frozen round-comparability set (VERDICT r4 #6): the round-1 headline
# stages still measured under the same name and stage content. Suite
# totals stopped being round-comparable when rounds added stages
# (23→33); `headline_total` sums EXACTLY these stages every round, so
# BENCH_rN vs BENCH_r{N-1} is one number again. Do not add to this
# list — new stages belong in the full total only.
R1_HEADLINE_STAGES = (
    "tile_select",
    "cell_join",
    "mosaic_stitch",
    "knn_cell_ring",
    "q1_pricing_summary",
    "equi_join_j1",
    "window_row_number",
    "tile_encode_p1",
    "dedup_exact",
    "word_jaccard_pairs",
)


def _emit(timings, counts, merged, sf, cpus, n_docs=None):
    total = round(sum(timings.values()), 3)
    headline = [s for s in R1_HEADLINE_STAGES if s in timings]
    result = {
        "metric": "tiles merged/sec + join rows/sec (suite total secs)",
        "value": total,
        "unit": "sec",
        "headline_total": round(sum(timings[s] for s in headline), 3),
        "headline_stages": headline,
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "rows": counts,
        "throughput": {},
    }
    if "cell_join" in timings:
        result["throughput"]["join_rows_per_sec"] = round(
            counts["cell_join"] / timings["cell_join"], 1
        )
        result["throughput"]["tiles_merged_per_sec"] = round(
            (merged or 0) / timings["mosaic_stitch"], 1
        )
    if n_docs and "minhash_lsh_full" in timings:
        result["throughput"]["lsh_docs_per_sec"] = round(
            n_docs / timings["minhash_lsh_full"], 1
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
