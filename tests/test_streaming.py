"""Streaming ingest: parquet drops land in the partitioned image table
exactly once across restarts (checkpointed availableNow). Incremental
mosaics: per-batch partial stitch + batch-ordered overlay compaction."""

import numpy as np
import pandas as pd

from tilegrab_spark.kernels import png
from tilegrab_spark.sources.images import read_image_table, write_synthetic_image_table
from tilegrab_spark.streaming.ingest import stream_image_ingest
from tilegrab_spark.streaming.mosaic_stream import compact_mosaics, stream_mosaic


def test_stream_ingest_exactly_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # drop 1: two tiles
    write_synthetic_image_table(
        spark, landing, [(16, 1, 1, 0), (16, 1, 2, 0)], n_buckets=2, mode="overwrite"
    )
    q = stream_image_ingest(spark, landing, table, ckpt, n_buckets=2)
    q.awaitTermination(120)
    assert read_image_table(spark, table).count() == 2

    # drop 2: one more tile, new files; rerun catches up only the delta
    write_synthetic_image_table(
        spark, landing, [(16, 2, 2, 0)], n_buckets=2, mode="append"
    )
    q2 = stream_image_ingest(spark, landing, table, ckpt, n_buckets=2)
    q2.awaitTermination(120)
    df = read_image_table(spark, table)
    assert df.count() == 3
    assert df.select("image_id").distinct().count() == 3

    # rerun with no new data: nothing duplicated
    q3 = stream_image_ingest(spark, landing, table, ckpt, n_buckets=2)
    q3.awaitTermination(120)
    assert read_image_table(spark, table).count() == 3


def test_stream_mosaic_incremental_overlay(spark, tmp_path):
    """Each micro-batch stitches ONLY its own rows into partial mosaics;
    compaction overlays partials in batch order (later batch wins where
    it has pixels). Oracle: numpy canvas built the same way."""
    from tilegrab_spark.sources.images import IMAGE_SCHEMA, _gen_batch

    z, x0, y0 = 15, 23000, 15000
    landing = str(tmp_path / "landing")
    partials = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    tiles_df = spark.createDataFrame(
        [("g", z, x0 + i, y0 + j) for i in range(2) for j in range(2)],
        "geom_id string, z int, x long, y long",
    )

    def land(cells):
        pdf = _gen_batch(
            pd.DataFrame([{"z": z, "x": x, "y": y, "src": s, "bucket": 0} for x, y, s in cells]),
            256, 256,
        )
        spark.createDataFrame(pdf, IMAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def run():
        q = stream_mosaic(
            spark, landing, tiles_df, partials, ckpt,
            group_w=2, group_h=2, anchor=(x0, y0),
        )
        q.awaitTermination(180)

    # batch 1: two tiles
    land([(x0, y0, 0), (x0 + 1, y0, 0)])
    run()
    # batch 2: re-render of (x0,y0) from src 1 (wins) + a NEW tile
    land([(x0, y0, 1), (x0, y0 + 1, 0)])
    run()

    rows = compact_mosaics(spark, partials).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.w, r.h) == (512, 512)
    assert r.n_tiles == 4  # total pastes across batches

    want = np.zeros((512, 512, 3), np.uint8)
    for (x, y, s) in [(x0 + 1, y0, 0), (x0, y0 + 1, 0), (x0, y0, 1)]:
        px, py = (x - x0) * 256, (y - y0) * 256
        want[py : py + 256, px : px + 256] = png.synth_tile_pixels(x, y, z, s)
    got = png.decode_png(bytes(r.bytes))
    assert (got == want).all()

    # restart with no new data: no new batch directories, same canvas
    run()
    rows2 = compact_mosaics(spark, partials).collect()
    assert len(rows2) == 1
    assert (png.decode_png(bytes(rows2[0].bytes)) == want).all()


def test_text_operators_compose_with_streams(spark, tmp_path):
    """The stateless text operators (cleaning, PII scrub, quality,
    tokens) are plain column transforms, so they apply unchanged to a
    readStream DataFrame — one pipeline definition serves batch and
    streaming ingestion."""
    from pyspark.sql import functions as F

    from tilegrab_spark.operators.text import (
        with_clean_text,
        with_pii_scrubbed,
        with_quality_score,
        with_token_counts,
    )

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (0, "mail me at alice@example.com   please"),
            (1, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    assert stream.isStreaming
    out = with_token_counts(
        with_quality_score(with_pii_scrubbed(with_clean_text(stream)))
    )
    q = (
        out.writeStream.format("memory")
        .queryName("scrubbed_docs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.sql("SELECT * FROM scrubbed_docs").collect()}
    assert rows[0].n_emails == 1 and "<EMAIL>" in rows[0].scrubbed
    assert rows[0].clean_text == "mail me at alice@example.com please"
    assert rows[1].ws_tokens == 10 and rows[1].quality == 1.0
