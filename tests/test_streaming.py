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


# ---------------------------------------------------------------------------
# Incremental / streaming near-dup detection (streaming/incremental_dedup.py)
# ---------------------------------------------------------------------------

_WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
          "kilo lima mike november oscar papa quebec romeo sierra tango").split()


def _doc(i, mutate=None):
    """20-word deterministic doc; mutate=n swaps word n for a variant."""
    ws = list(_WORDS)
    ws = ws[i % 5:] + ws[:i % 5]  # rotate so unrelated docs differ a lot
    if mutate is not None:
        ws[mutate] = f"zz{mutate}"
    return " ".join(ws)


def _dedup_batches():
    """Three batches with planted near-dups within AND across batches."""
    b1 = [(1, _doc(0)), (2, _doc(1)), (3, _doc(0, mutate=2))]        # 1~3
    b2 = [(4, _doc(0, mutate=5)), (5, _doc(2)), (6, _doc(1, mutate=1))]  # 4~1,4~3, 6~2
    b3 = [(7, _doc(2, mutate=9)), (8, _doc(3)), (9, _doc(0, mutate=7))]  # 7~5, 9~1...
    return b1, b2, b3


def test_incremental_lsh_matches_batch_recompute(spark, tmp_path):
    """VERDICT r2 #5 'done' criterion: batch N+1 emits exactly the new
    cross-batch pairs — oracle is a one-shot recompute over the union."""
    from tilegrab_spark.operators.dedup import minhash_lsh_pairs, release_signature_caches
    from tilegrab_spark.streaming.incremental_dedup import incremental_lsh_pairs

    sig_path = str(tmp_path / "sigs")
    batches = _dedup_batches()
    schema = "doc_id long, text string"
    seen = []
    got = set()
    for bi, batch in enumerate(batches):
        seen.extend(batch)
        new_df = spark.createDataFrame(batch, schema)
        corpus = spark.createDataFrame(seen, schema)
        pairs = incremental_lsh_pairs(
            new_df, sig_path, corpus, batch_id=bi, threshold=0.5
        )
        rows = {(r.id_a, r.id_b) for r in pairs.collect()}
        # every emitted pair involves at least one doc of THIS batch
        batch_ids = {i for i, _ in batch}
        assert all(a in batch_ids or b in batch_ids for a, b in rows)
        # no pair is ever emitted twice across batches
        assert not (rows & got)
        got |= rows

    full = minhash_lsh_pairs(
        spark.createDataFrame(seen, schema), threshold=0.5
    )
    want = {(r.id_a, r.id_b) for r in full.collect()}
    assert got == want
    assert len(want) >= 4  # the planted dups actually matched
    release_signature_caches()


def test_incremental_signature_table_grows_append_only(spark, tmp_path):
    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.streaming.incremental_dedup import incremental_lsh_pairs

    sig_path = str(tmp_path / "sigs")
    schema = "doc_id long, text string"
    b1, b2, _ = _dedup_batches()
    d1 = spark.createDataFrame(b1, schema)
    incremental_lsh_pairs(d1, sig_path, d1, batch_id=0).count()
    assert spark.read.parquet(sig_path).count() == len(b1)
    d2 = spark.createDataFrame(b2, schema)
    incremental_lsh_pairs(
        d2, sig_path, d1.unionByName(d2), batch_id=1
    ).count()
    t = spark.read.parquet(sig_path)
    assert t.count() == len(b1) + len(b2)
    assert {r.batch_id for r in t.select("batch_id").distinct().collect()} == {0, 1}
    release_signature_caches()


def test_incremental_sig_version_contract(spark, tmp_path):
    """A signature table from an incompatible build fails loudly."""
    import pytest
    from pyspark.sql import functions as F
    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.streaming.incremental_dedup import incremental_lsh_pairs

    sig_path = str(tmp_path / "sigs")
    schema = "doc_id long, text string"
    b1, b2, _ = _dedup_batches()
    d1 = spark.createDataFrame(b1, schema)
    incremental_lsh_pairs(d1, sig_path, d1, batch_id=0).count()
    release_signature_caches()
    # rewrite the table stamped as an older signature scheme
    t = spark.read.parquet(sig_path)
    t = t.withColumn("minhash", F.col("minhash").alias(
        "minhash", metadata={"sig_version": 1, "sig_hash": "blake2b-low-8"}))
    t.write.mode("overwrite").parquet(str(tmp_path / "sigs_v1"))
    d2 = spark.createDataFrame(b2, schema)
    with pytest.raises(ValueError, match="sig_version"):
        incremental_lsh_pairs(
            d2, str(tmp_path / "sigs_v1"), d1.unionByName(d2), batch_id=1
        )
    release_signature_caches()


def test_stream_document_dedup_end_to_end(spark, tmp_path):
    """Structured-Streaming composition: two parquet drops processed as
    separate micro-batches (maxFilesPerTrigger=1 semantics via separate
    catch-up runs); accumulated pairs equal the batch recompute."""
    from tilegrab_spark.operators.dedup import minhash_lsh_pairs, release_signature_caches
    from tilegrab_spark.streaming.incremental_dedup import stream_document_dedup

    landing = str(tmp_path / "landing")
    sig_path = str(tmp_path / "sigs")
    pairs_path = str(tmp_path / "pairs")
    corpus_path = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    b1, b2, _ = _dedup_batches()

    spark.createDataFrame(b1, schema).write.mode("append").parquet(landing)
    q = stream_document_dedup(
        spark, landing, sig_path, pairs_path, ckpt,
        corpus_path=corpus_path, schema=schema, threshold=0.5,
    )
    q.awaitTermination(180)

    spark.createDataFrame(b2, schema).write.mode("append").parquet(landing)
    q2 = stream_document_dedup(
        spark, landing, sig_path, pairs_path, ckpt,
        corpus_path=corpus_path, schema=schema, threshold=0.5,
    )
    q2.awaitTermination(180)

    got = {(r.id_a, r.id_b) for r in spark.read.parquet(pairs_path).collect()}
    full = minhash_lsh_pairs(
        spark.createDataFrame(b1 + b2, schema), threshold=0.5
    )
    want = {(r.id_a, r.id_b) for r in full.collect()}
    assert got == want and len(want) >= 2
    assert spark.read.parquet(sig_path).count() == len(b1) + len(b2)
    release_signature_caches()
