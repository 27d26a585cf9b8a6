"""End-to-end image-caption training-export pipeline — the north-star
composition over the input_hint table shape: quality gate (variance-of-
Laplacian + entropy) → phash near-dup transitive dedup → aspect-ratio
bucket batching → shard packing, every stage the engine's own operator,
with row bookkeeping and determinism asserted."""

import numpy as np

from tilegrab_spark.operators.components import dedup_by_components
from tilegrab_spark.operators.dedup import (
    phash_near_dup_pairs,
    release_signature_caches,
)
from tilegrab_spark.operators.multimodal import image_quality_signals
from tilegrab_spark.operators.packing import aspect_bucket_batches, pack_shards
from tilegrab_spark.sources.images import read_image_table, write_synthetic_image_table

Z = 15
BUCKETS = [(256, 256), (320, 192), (192, 320)]


def _corpus(spark, tmp_path):
    path = str(tmp_path / "imgs")
    cells_a = [(Z, 23000 + i, 16000 + (i % 7), i % 3) for i in range(40)]
    cells_b = [(Z, 23100 + i, 16100 + (i % 5), i % 2) for i in range(20)]
    write_synthetic_image_table(spark, path, cells_a, tile_w=256, tile_h=256)
    write_synthetic_image_table(
        spark, path, cells_b, tile_w=320, tile_h=192, mode="append"
    )
    return read_image_table(spark, path)


def _run(spark, images, batch_size=8):
    q = image_quality_signals(images.select("image_id", "bytes", "w", "h", "fmt"))
    keep_ids = q.filter(
        (q["decode_ok"]) & (q["entropy_bits"] > 0.5) & (q["sharpness"] > 0.0)
    ).select("image_id")
    kept = images.join(keep_ids, on="image_id", how="leftsemi")
    pairs = phash_near_dup_pairs(kept, max_hamming=4)
    unique = dedup_by_components(kept, pairs, id_col="image_id")
    batched = aspect_bucket_batches(
        unique.select("image_id", "w", "h", "caption"),
        BUCKETS,
        batch_size=batch_size,
        order_col="image_id",
    )
    sized = batched.withColumn("nbytes", (batched["w"] * batched["h"] * 3).cast("long"))
    packed = pack_shards(
        sized, size_col="nbytes", order_col="image_id", shard_bytes=2 * 1024 * 1024
    )
    rows = packed.collect()
    release_signature_caches()
    return rows


def test_image_export_pipeline_bookkeeping_and_determinism(spark, tmp_path):
    images = _corpus(spark, tmp_path)
    n_total = images.count()
    rows = _run(spark, images)
    assert 0 < len(rows) <= n_total
    # every surviving image has exactly one batch slot and one shard slot
    ids = [r["image_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    # captions survived the pipeline intact (per-row invariant)
    assert all(r["caption"] for r in rows)
    # aspect bucketing: 256x256 images to the square bucket, 320x192 wide
    for r in rows:
        if r["w"] == 256:
            assert r["bucket_id"] == 0
        elif r["w"] == 320:
            assert r["bucket_id"] == 1
    # batches: within bucket, ids ordered by rank; full flags consistent
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket_id"], []).append(r)
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert [r["image_id"] for r in rs] == sorted(r["image_id"] for r in rs)
    # shards: offsets strictly increase in id order, shard = offset DIV size
    rows_sorted = sorted(rows, key=lambda r: r["image_id"])
    offs = [r["start_offset"] for r in rows_sorted]
    assert offs == sorted(offs)
    for r in rows:
        assert r["shard_id"] == r["start_offset"] // (2 * 1024 * 1024)
    # determinism: a second run is byte-identical
    rows2 = _run(spark, images)
    key = lambda r: r["image_id"]
    assert sorted(map(tuple, rows), key=lambda t: t[0]) == sorted(
        map(tuple, rows2), key=lambda t: t[0]
    )
