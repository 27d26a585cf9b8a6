"""Regenerate the PLAN blocks in PLANS.md from the current code (keeps
the prose header above the first ``---`` intact). Run from the repo
root: ``python tools/capture_plans.py``. Uses the cached e192 bench
table (generated on demand if absent)."""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def _incremental_plan(spark):
    import tempfile

    from pyspark.sql import functions as F

    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.streaming.incremental_dedup import incremental_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    import shutil

    tmp = tempfile.mkdtemp(prefix="tg_plan_sig_")
    try:
        incremental_lsh_pairs(b0, f"{tmp}/sigs", b0, batch_id=0).count()
        pairs = incremental_lsh_pairs(
            b1, f"{tmp}/sigs", docs, batch_id=1, commit=False
        )
        p = plan_of(pairs)
    finally:
        release_signature_caches()
        shutil.rmtree(tmp, ignore_errors=True)
    return p


def _tile_diff_plan(spark, images, tiles):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.change import tile_diff

    epoch_a = images.filter(F.col("x") % 2 == 0)
    epoch_b = images.filter(F.col("x") % 2 == 1)
    return plan_of(tile_diff(epoch_a, epoch_b))


def _shard_pack_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.packing import pack_shards

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    return plan_of(
        pack_shards(
            docs.select("doc_id", F.col("n_chars").cast("long").alias("n_bytes")),
            size_col="n_bytes",
            order_col="doc_id",
            shard_bytes=1 << 20,
        )
    )


def _dissolve_plan(spark, tiles):
    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.operators.dissolve import adjacency_edges

    try:
        return plan_of(adjacency_edges(tiles))
    finally:
        release_signature_caches()


def _asof_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.asof import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts", "value"
    )
    return plan_of(
        asof_join(buys, clicks, on="user_id", ts_col="ts",
                  right_cols=["click_id", "value"])
    )


def _range_join_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.rangejoin import range_join

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        F.floor("l_extendedprice").alias("price_d"), "l_quantity"
    )
    bands = spark.range(0, 140).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 800).cast("double").alias("lo"),
        (F.col("id") * 800 + 1200).cast("double").alias("hi"),
    )
    return plan_of(
        range_join(li, bands, point_col="price_d", lo_col="lo", hi_col="hi",
                   bucket_width=1000)
    )


def _sketch_plan(spark):
    from tilegrab_spark.operators.sketches import hll_distinct

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    return plan_of(
        hll_distinct(orders, key_col="o_custkey",
                     group_cols=["o_orderpriority"], p=12)
    )


def _focal_plan(spark, images):
    from tilegrab_spark.operators.focal import focal_box_stats

    return plan_of(focal_box_stats(images, radius=1))


def _decon_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.decontaminate import contamination_hits

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    return plan_of(contamination_hits(docs, ev, n=8))


def _heavy_plan(spark):
    from tilegrab_spark.operators.heavyhitters import heavy_hitters

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    return plan_of(heavy_hitters(docs, "lang", min_frac=0.05))


def _ivfpq_plan(spark):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tilegrab_spark.operators.quantization import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    tmp = tempfile.mkdtemp(prefix="tg_plan_ivfpq_")
    try:
        build_ivfpq_index(emb, tmp, n_centroids=8, m=4)
        queries = emb.filter(F.col("vec_id") % 101 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return plan_of(
            search_ivfpq_index(spark, tmp, queries, k=5, n_probe=2, rerank=20)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _cover_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.cover import compact_cover, uncompact_cover

    tiles = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    compact_1lvl = compact_cover(tiles, 5, min_zoom=4, checkpoint=False)
    cov = spark.createDataFrame([(2, 1, 2)], "z int, x long, y long")
    return (
        plan_of(uncompact_cover(cov, 6))
        + "\n\n-- one compact level (checkpoint=False, lazy form) --\n"
        + plan_of(compact_1lvl)
    )


def _span_plan(spark):
    from tilegrab_spark.operators.spans import duplicate_spans

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    return plan_of(duplicate_spans(docs, k=8))


def _clf_plan(spark):
    import numpy as np

    from tilegrab_spark.operators.classifier import score_documents

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    return plan_of(score_documents(docs, np.zeros(1 << 12)))


def _bloom_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.bloom import bloom_build, bloom_probe

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sketch = bloom_build(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id",
        m_bits=1 << 14, k_hashes=5,
    )
    return plan_of(
        bloom_probe(docs, sketch, "doc_id", m_bits=1 << 14, k_hashes=5)
    )


def _spatialstats_plan(spark, tiles):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.operators.spatialstats import morans_i

    valued = tiles.select("z", "x", "y", (F.col("x") + F.col("y")).cast("double").alias("val"))
    try:
        return plan_of(morans_i(valued, "val"))
    finally:
        release_signature_caches()


def _contour_plan(spark, images):
    from tilegrab_spark.operators.contour import extract_contours

    return plan_of(extract_contours(images, levels=[100.0]))


def _render_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.render import render_density_tiles

    pts = spark.range(100000).select(
        (F.col("id") % 3600 / 10.0 - 180.0).alias("lon"),
        (F.col("id") % 1600 / 10.0 - 80.0).alias("lat"),
    )
    return plan_of(render_density_tiles(pts, zoom=8))


def _idw_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.render import interpolate_idw_tiles

    pts = spark.range(20000).select(
        (F.col("id") % 700 / 20.0).alias("lon"),
        (F.col("id") % 431 / 10.0).alias("lat"),
        (F.col("id") % 97).cast("double").alias("val"),
    )
    return plan_of(
        interpolate_idw_tiles(pts, zoom=7, value_col="val", vmin=0.0, vmax=96.0)
    )


def _dbscan_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.cluster import grid_dbscan
    from tilegrab_spark.operators.dedup import release_signature_caches

    pts = (
        spark.range(2000)
        .select(
            F.col("id").alias("point_id"),
            (F.col("id") % 200 / 100.0 + 10.0).alias("lon"),
            (F.col("id") % 137 / 100.0 + 45.0).alias("lat"),
        )
    )
    try:
        return plan_of(grid_dbscan(pts, eps_m=5000.0, min_pts=4))
    finally:
        release_signature_caches()


def _overlay_join_plan(spark):
    from tilegrab_spark.operators.overlay import spatial_join_polygons

    def sq(cx, cy, h):
        return [[cx - h, cy - h], [cx + h, cy - h], [cx + h, cy + h],
                [cx - h, cy + h], [cx - h, cy - h]]

    left = spark.createDataFrame(
        [(f"L{i}", [sq(10.0 + i * 0.01, 45.0, 0.02)]) for i in range(8)],
        "geom_id string, rings array<array<array<double>>>",
    )
    right = spark.createDataFrame(
        [(f"R{i}", [sq(10.0 + i * 0.015, 45.0, 0.01)]) for i in range(8)],
        "geom_id string, rings array<array<array<double>>>",
    )
    return plan_of(spatial_join_polygons(left, right, zoom=12))


def _hull_plan(spark):
    from tilegrab_spark.operators.hull import convex_hull

    pts = spark.createDataFrame(
        [(f"t{i % 4}", float(i % 97) * 0.01, float(i % 89) * 0.01) for i in range(500)],
        "track string, lon double, lat double",
    )
    return plan_of(convex_hull(pts, group_col="track"))


def _bpe_round_plan(spark):
    """One BPE merge round's pair count over the word table (the frame
    the per-round limit(1) collect runs on)."""
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.bpe import EOW, word_counts

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    syms = word_counts(docs).select(
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias("syms"),
        F.col("count").cast("long").alias("count"),
    )
    pairs = (
        syms.select(
            F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias("_i", "a"),
            F.col("syms"),
            F.col("count"),
        )
        .select(F.col("a"), F.col("syms")[F.col("_i") + 1].alias("b"), F.col("count"))
        .groupBy("a", "b")
        .agg(F.sum("count").alias("pc"))
        .orderBy(F.desc("pc"), F.asc("a"), F.asc("b"))
        .limit(1)
    )
    return plan_of(pairs)


def _hex_hotspot_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.hexbin import hex_hotspots

    pts = spark.range(5000).select(
        (F.lit(8.5) + (F.col("id") % 97).cast("double") / 970.0).alias("lon"),
        (F.lit(47.2) + (F.col("id") % 89).cast("double") / 890.0).alias("lat"),
    )
    return plan_of(hex_hotspots(pts, size_m=250.0))


def _pmtiles_sort_plan(spark):
    """The distributed stage of the PMTiles sink: vectorized Hilbert
    tile ids + per-tile dedup + the one range exchange that produces
    the clustered layout the format requires (the driver then only
    streams already-ordered rows)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from tilegrab_spark.kernels.pmtiles import tileids_np

    def _tid_fn(z, x, y):
        return pd.Series(tileids_np(z.to_numpy(), x.to_numpy(), y.to_numpy()))

    _tid = pandas_udf(_tid_fn, "long")
    tiles = spark.range(512).select(
        F.lit(12).alias("z"),
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
        F.col("id").cast("string").cast("binary").alias("bytes"),
    )
    rows = (
        tiles.where(F.col("bytes").isNotNull())
        .withColumn("tile_id", _tid("z", "x", "y"))
        .groupBy("tile_id", "z", "x", "y")
        .agg(F.max("bytes").alias("bytes"))
        .orderBy("tile_id")
    )
    return plan_of(rows)


def _pyramid_refresh_plan(spark, images):
    """Incremental pyramid refresh: the dirty-ancestor derivation plus
    one level's rebuild with children pruned to dirty parents."""
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.pyramid import build_parent_level, dirty_ancestors

    changed = images.filter(F.col("x") % 7 == 0).select("x", "y")
    dirty = dirty_ancestors(changed, z_base=15, z_min=12)
    d = dirty.filter(F.col("zoom") == 14).select(
        F.col("x").alias("_px"), F.col("y").alias("_py")
    )
    kids = images.filter(F.col("z") == 15).join(
        F.broadcast(d),
        (F.shiftright(F.col("x"), 1) == F.col("_px"))
        & (F.shiftright(F.col("y"), 1) == F.col("_py")),
        "left_semi",
    )
    return (
        plan_of(dirty)
        + "\n-- level rebuild (dirty-pruned children) --\n"
        + plan_of(build_parent_level(kids, 15))
    )




def _distancejoin_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.distancejoin import within_distance_pairs

    df = spark.range(2000).select(
        F.col("id"),
        ((F.col("id") * 7 % 3600) / 10.0 - 180.0).alias("lon"),
        ((F.col("id") * 13 % 1600) / 10.0 - 80.0).alias("lat"),
    )
    return plan_of(within_distance_pairs(df, 2000.0))


def _bm25_plan(spark):
    from tilegrab_spark.operators.retrieval import bm25_search

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    qs = spark.createDataFrame(
        [(0, "tile mosaic geospatial"), (1, "training data quality")],
        "query_id int, text string",
    )
    return plan_of(bm25_search(docs, qs, k=10))


def _sssp_round_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.graph import _relax_round

    e = spark.range(5000).select(
        (F.col("id") % 997).alias("_s"),
        ((F.col("id") * 31) % 997).alias("_d"),
        (F.col("id") % 7 + 1).cast("double").alias("_w"),
    )
    dist = spark.createDataFrame([(0, 0.0, 0)], "node long, dist double, source long")
    return plan_of(_relax_round(dist, e, dist))


def _adaptive_cover_plan(spark):
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.cover import adaptive_cover

    pts = spark.range(100000).select(
        ((F.col("id") * 7 % 3600) / 10.0 - 180.0).alias("lon"),
        ((F.col("id") * 13 % 1600) / 10.0 - 80.0).alias("lat"),
    )
    return plan_of(adaptive_cover(pts, threshold=64, max_zoom=12))


def _augment_plan(spark, images):
    from tilegrab_spark.operators.augment import augment_images

    return plan_of(augment_images(images.select("image_id", "bytes", "x", "y", "fmt")
                                  .withColumnRenamed("x", "w")
                                  .withColumnRenamed("y", "h")))




def _funnel_plan(spark):
    from tilegrab_spark.operators.funnel import funnel_progress

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    return plan_of(funnel_progress(ev, ["view", "click", "purchase"]))


def _incr_index_plan(spark):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tilegrab_spark.streaming.incremental_index import TextIndexStore

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    tmp = tempfile.mkdtemp(prefix="tg_plan_txtidx_")
    try:
        st = TextIndexStore(spark, tmp, n_buckets=16)
        st.ingest_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
        st.ingest_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
        q = spark.createDataFrame(
            [(0, "tile mosaic geospatial")], "query_id int, text string"
        )
        return plan_of(st.search(q, k=10))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    from pyspark.sql import functions as F

    import bench
    from tilegrab_spark import get_spark
    from tilegrab_spark.operators.dedup import (
        hamming_near_dup_pairs,
        minhash_lsh_pairs,
    )
    from tilegrab_spark.operators.image_join import join_images
    from tilegrab_spark.operators.mosaic import mosaic
    from tilegrab_spark.operators.tiles import enumerate_tiles, refine_by_shape
    from tilegrab_spark.sources.geometries import geometry_from_geojson
    from tilegrab_spark.sources.images import read_image_table

    spark = get_spark(master="local[4]", shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    img_path = "/tmp/tilegrab_bench/images_e192_z15"
    bench.ensure_images(spark, img_path, 192, 15)

    geom = geometry_from_geojson("/root/reference/tests/data/T.geojson", "T")
    images = read_image_table(spark, img_path)
    tiles = refine_by_shape(enumerate_tiles(spark, geom, 15), geom)

    plans = [
        (
            "PLAN 1: image scan with key projection + zoom partition filter",
            plan_of(images.filter(F.col("zoom") == 15).select("image_id", "x", "y")),
        ),
        (
            "PLAN 2: tile enumeration + PIP refine (narrow, no shuffle)",
            plan_of(tiles.select("x", "y")),
        ),
        (
            "PLAN 3: broadcast tile join (no shuffle of image table)",
            plan_of(
                join_images(tiles.select("z", "x", "y"), images.drop("cell_id")).select(
                    "image_id", "x", "y", "caption"
                )
            ),
        ),
        (
            "PLAN 4: mosaic stitch (single pinned-partition shuffle, Arrow grouped map)",
            plan_of(
                mosaic(
                    join_images(
                        tiles.select("geom_id", "z", "x", "y"), images.drop("cell_id")
                    ),
                    group_w=4,
                    group_h=4,
                    full_groups_only=False,
                    anchor=(23719, 16260),
                )
            ),
        ),
        (
            "PLAN 5: hamming near-dup blocked self-join (SimHash/phash dedup)",
            plan_of(
                hamming_near_dup_pairs(
                    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
                        "doc_id", F.col("n_chars").cast("long").alias("h64")
                    ),
                    hash_col="h64",
                    id_col="doc_id",
                    max_hamming=1,
                )
            ),
        ),
        (
            "PLAN 6: minhash-LSH banded self-join (x-bands explode ships only "
            "(_id, band, band_hash) scalars; shingle sets join back on the "
            "candidate pairs — r2 shuffle-slim)",
            plan_of(
                minhash_lsh_pairs(
                    spark.read.parquet("/root/testdata/sf0.01/documents.parquet"),
                    threshold=0.5,
                )
            ),
        ),
        (
            "PLAN 7: incremental LSH (new batch vs persisted signature table — "
            "new side banded from the cached batch signatures, old side a "
            "parquet scan of precomputed signatures; corpus semi-joined down "
            "to candidate ids for the exact-Jaccard verify)",
            _incremental_plan(spark),
        ),
        (
            "PLAN 8: tile change detection (epoch A vs B — ONE full-outer "
            "sort-merge join on the packed cell key, then the Arrow diff "
            "kernel; pixels move once, stats leave as scalars)",
            _tile_diff_plan(spark, images, tiles),
        ),
        (
            "PLAN 9: shard packing (deterministic distributed prefix sum — "
            "bucket id is a LITERAL comparison chain over the order key, "
            "computed from driver-derived range boundaries; per-bucket "
            "window + tiny per-bucket totals broadcast-joined back; no "
            "global single-task window, no repartitionByRange)",
            _shard_pack_plan(spark),
        ),
        (
            "PLAN 10: tile dissolve adjacency (forward-neighbor self-equi-"
            "join on packed cell keys — blocked join, no cross product; "
            "feeds the iterative CC rounds)",
            _dissolve_plan(spark, tiles),
        ),
        (
            "PLAN 11: as-of join (union-window rewrite — NO join node: "
            "tagged union + one keyed window's last(payload, ignorenulls); "
            "one shuffle on the key, each row touched once)",
            _asof_plan(spark),
        ),
        (
            "PLAN 12: range join (inequality join as a bucket EQUI-join — "
            "intervals explode to covered buckets, points hash-join them; "
            "no BroadcastNestedLoop/cartesian, AQE-compatible)",
            _range_join_plan(spark),
        ),
        (
            "PLAN 13: HLL distinct sketch (pure Catalyst: partial MAX(rho) "
            "combines map-side before the (group, bucket) exchange; the "
            "second exchange carries one row per group)",
            _sketch_plan(spark),
        ),
        (
            "PLAN 14: focal halo exchange (interior box stats computed "
            "MAP-SIDE and shipped as scalars; the one exchange carries "
            "only perimeter data — 1-channel own-frame bands + r-deep "
            "neighbor strips — into the batched border assembly; "
            "reduce-side work scales with tile perimeter, not area)",
            _focal_plan(spark, images),
        ),
        (
            "PLAN 15: benchmark decontamination (eval grams BROADCAST — the "
            "corpus-side gram explode is never shuffled; both exchanges are "
            "the countDistinct two-phase over HIT rows only — output-sized, "
            "never corpus-sized)",
            _decon_plan(spark),
        ),
        (
            "PLAN 16: exact heavy hitters (per-partition Misra-Gries "
            "MapInPandas summaries -> candidate distinct; the corpus-side "
            "verify is a BROADCAST LEFT-SEMI (zero corpus shuffle) + "
            "map-side partial count on candidate keys only)",
            _heavy_plan(spark),
        ),
        (
            "PLAN 17: IVF-PQ search (probed-list union as parquet "
            "PartitionFilters on the code table; ADC MapInPandas emits "
            "per-partition top-k candidates — the only exchange is the "
            "candidate-sized window input)",
            _ivfpq_plan(spark),
        ),
        (
            "PLAN 18: span dedup (duplicated-span detection — the rolling-"
            "gram explode ships (id, pos, hash) scalars only; duplicated "
            "grams found by one map-side-combinable groupBy and BROADCAST "
            "back onto the hit stream; islands form inside one per-doc "
            "window — corpus text itself never shuffles)",
            _span_plan(spark),
        ),
        (
            "PLAN 19: classifier scoring (token explode -> hashed index -> "
            "BROADCAST weight-table join -> groupBy(doc) with map-side "
            "partial sums: the one exchange is document-sized, never "
            "token-sized; no Python anywhere)",
            _clf_plan(spark),
        ),
        (
            "PLAN 20: bloom probe (the fixed-size register table "
            "BROADCASTs; probe keys explode to k (word, mask) scalars and "
            "collapse back map-side — the one exchange is probe-sized; "
            "the big side never shuffles)",
            _bloom_plan(spark),
        ),
        (
            "PLAN 21: terrain halo exchange (same shape as PLAN 14: "
            "interior Horn gradients leave the map side as scalars; the "
            "one exchange carries only 2-deep own bands + 1-deep neighbor "
            "strips into the batched border assembly)",
            plan_of(__import__(
                "tilegrab_spark.operators.terrain", fromlist=["terrain_stats"]
            ).terrain_stats(images)),
        ),
        (
            "PLAN 22: multi-resolution cover (uncompact: pure-Catalyst "
            "double-sequence explode, ZERO exchanges — and one compact "
            "level: count + emit-join co-partitioned on the parent key; "
            "the default checkpoint=True materializes each level so the "
            "d-level sweep is d jobs over a >=4x-shrinking frontier, "
            "never a re-derived prefix chain)",
            _cover_plan(spark),
        ),
        (
            "PLAN 23: global Moran's I (weights = tile adjacency: the same "
            "forward-probe LEFT-SEMI self-joins as dissolve; value/edge/"
            "degree moments reduce to ONE-ROW frames map-side-combined, "
            "then BROADCAST cross-joined — every post-join frame is "
            "scalar-sized, no N x N weight matrix anywhere)",
            _spatialstats_plan(spark, tiles),
        ),
        (
            "PLAN 24: grid DBSCAN (candidate pairs = ONE equi-join of the "
            "9-cell probe explode against the cell-keyed points — scalar "
            "(id, mx, my) columns only, never all-pairs; neighbor counts / "
            "core filter / border assignment are map-side-combinable "
            "groupBys; CC rounds run on the core edge list)",
            _dbscan_plan(spark),
        ),
        (
            "PLAN 25: density tile rendering (pure-Catalyst pixel binning "
            "with a MAP-SIDE partial_sum — the one exchange carries "
            "(x, y, px, py, weight) rows bounded by touched pixels, never "
            "input points; the Arrow grouped map paints one tile per "
            "group and emits IMAGE_SCHEMA rows)",
            _render_plan(spark),
        ),
        (
            "PLAN 26: contour extraction (interior marching squares runs "
            "inside the MapInPandas map stage; the one exchange groups "
            "segment payloads + perimeter float strips — own last "
            "row/col, neighbor row-0/col-0/corner — never tile pixels; "
            "same halo shape as PLANs 14/21)",
            _contour_plan(spark, images),
        ),
        (
            "PLAN 27: IDW surface interpolation (each sample explodes to "
            "the <=4 tiles its radius disc touches — two bounded sequence "
            "explodes, no 9-cell fan-out beyond the disc; the one exchange "
            "carries (fx, fy, value) scalars into the per-tile grouped "
            "map that evaluates the 1/d^p field vectorized)",
            _idw_plan(spark),
        ),
        (
            "PLAN 28: polygon spatial join (candidates = ONE equi-join on "
            "the bbox tile-cover cells; the greatest(tx0)/greatest(ty0) "
            "min-corner filter emits each pair EXACTLY ONCE with no "
            "distinct/dedup exchange; the Arrow refine runs on candidate "
            "rows only — check: two explodes, one join, zero aggregate "
            "nodes)",
            _overlay_join_plan(spark),
        ),
        (
            "PLAN 29: convex hull aggregate (partial hulls in MapInPandas "
            "BEFORE any exchange — the one hash exchange carries hull "
            "VERTICES, O(h) per partition-group, never the points; "
            "FlatMapGroupsInPandas finalizes per group)",
            _hull_plan(spark),
        ),
        (
            "PLAN 30: BPE merge round (pair count over the vocabulary-"
            "sized word table: partial_sum BEFORE the exchange — map-side "
            "combine — and TakeOrderedAndProject caps the driver collect "
            "at ONE row; corpus bytes shuffled only by the word_counts "
            "aggregation upstream)",
            _bpe_round_plan(spark),
        ),
        (
            "PLAN 31: hex hot spots (lattice assignment is pure-Catalyst "
            "cube rounding inside WholeStageCodegen — NO Python before "
            "the binning exchange, which carries OCCUPIED hexes, never "
            "points; the 6-neighbor lag is one packed-key equi-join of "
            "the hex table against its own explode; the global moments "
            "reduce to a one-row frame that BROADCASTs into the Gi* "
            "projection — check: zero Arrow nodes, no point-sized "
            "exchange after the first)",
            _hex_hotspot_plan(spark),
        ),
        (
            "PLAN 32: PMTiles sink, distributed stage (vectorized Arrow "
            "tile ids; per-tile dedup is a map-side-combinable max; the "
            "ONE range exchange performs the clustered-layout sort on "
            "executors — the driver never sorts, it only streams "
            "already-ordered rows into the incremental writer)",
            _pmtiles_sort_plan(spark),
        ),
        (
            "PLAN 33: incremental pyramid refresh (dirty-ancestor set is "
            "one explode + distinct — the only exchange is sized by the "
            "OUTPUT dirty set; the level rebuild prunes children with a "
            "BROADCAST left-semi join BEFORE the rollup exchange and the "
            "Arrow stitch, so per-level work is proportional to change "
            "volume, never pyramid size)",
            _pyramid_refresh_plan(spark, images),
        ),
        (
            "PLAN 34: within-distance join (per-row latitude-adaptive disk "
            "explode on the LEFT side only — two bounded sequence explodes, "
            "sec(lat)-scaled radius computed per row inside codegen; ONE "
            "equi-join on the cell key (BHJ at this capture size, SMJ once "
            "both sides exceed the broadcast threshold); Catalyst folds the "
            "haversine refine INTO the join condition — check: no cartesian, "
            "no Python, candidate volume sized by disk fan-out, never "
            "|L|x|R|)",
            _distancejoin_plan(spark),
        ),
        (
            "PLAN 35: BM25 search (both TINY frames — query terms and the "
            "term-df table — BroadcastExchange into the corpus-sized "
            "postings probe; partial_sum BEFORE the (query, doc) exchange "
            "= map-side combine; the window top-k runs on the "
            "candidates-sized table — check: exactly one hash exchange "
            "after the postings build, zero cartesian)",
            _bm25_plan(spark),
        ),
        (
            "PLAN 36: SSSP relaxation round (frontier joins edges on src; "
            "partial min(struct(dist, source)) BEFORE the node exchange — "
            "one candidate per node leaves the map side; improvement "
            "filter is a left join against the running distance table — "
            "check: exchanges sized by frontier out-edges and candidate "
            "nodes, never |E|)",
            _sssp_round_plan(spark),
        ),
        (
            "PLAN 37: adaptive quadtree cover (ONE corpus-sized exchange "
            "— the max-zoom cell count; the 13-level rollup is an explode "
            "over the already-aggregated cell table with partial_sum "
            "map-side; leaf selection is a self-join on the parent key — "
            "check: the explode sits AFTER the first aggregate, so level "
            "fan-out multiplies cells, never points)",
            _adaptive_cover_plan(spark),
        ),
        (
            "PLAN 38: funnel progress (ONE exchange for the whole funnel: "
            "the step-type filter prunes the scan, partial collect_list "
            "runs map-side, and every sequential gate is a filter/get "
            "higher-order expression inside the post-agg projection — "
            "check: single hash exchange on user, zero joins, zero "
            "Python)",
            _funnel_plan(spark),
        ),
        (
            "PLAN 39: incremental-index BM25 search (the postings scan "
            "lists ONLY the files whose tb stats intersect the query "
            "terms' buckets — count the parquet paths in the scan node "
            "vs the table's total; scoring replans exactly as PLAN 35: "
            "broadcast query terms + df, partial-sum before the "
            "candidate exchange, window top-k)",
            _incr_index_plan(spark),
        ),
    ]

    md_path = REPO / "PLANS.md"
    text = md_path.read_text()
    header = text.split("\n---\n")[0]
    body = "\n\n```\n" + "\n```\n\n```\n".join(
        f"==================== {title} ====================\n{p}" for title, p in plans
    ) + "\n```\n"
    md_path.write_text(header + "\n---\n" + body)
    print(f"wrote {md_path} with {len(plans)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
