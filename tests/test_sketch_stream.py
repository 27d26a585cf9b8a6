"""Incremental sketch store: batch-equivalence oracle, time travel,
re-delivery idempotence (through compaction), parameter contract, and a
real structured-streaming drive."""

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.sketches import cms_sketch, hll_registers
from tilegrab_spark.plans.snapshots import SnapshotNotFound
from tilegrab_spark.streaming.sketch_stream import SketchStore, stream_sketch_ingest


def _batches(spark, n=3, rows=400):
    return [
        spark.range(i * rows, (i + 1) * rows).select(
            F.concat(F.lit("user"), (F.col("id") % (rows // 2))).alias("k")
        )
        for i in range(n)
    ]


def _regs(df):
    return sorted(tuple(r) for r in df.collect())


def test_hll_incremental_equals_batch_recompute(spark, tmp_path):
    batches = _batches(spark)
    store = SketchStore(spark, str(tmp_path / "hll"), kind="hll", key_col="k", p=10)
    for i, b in enumerate(batches):
        assert store.ingest_batch(b, i) == i + 1
    whole = batches[0].unionByName(batches[1]).unionByName(batches[2])
    assert _regs(store.registers()) == _regs(hll_registers(whole, key_col="k", p=10))
    est = store.distinct_summary().collect()[0]["n_distinct_est"]
    exact = whole.distinct().count()
    assert abs(est - exact) / exact < 0.15


def test_cms_incremental_equals_batch_recompute(spark, tmp_path):
    batches = _batches(spark)
    store = SketchStore(
        spark, str(tmp_path / "cms"), kind="cms", key_col="k", d=3, w=256
    )
    for i, b in enumerate(batches):
        store.ingest_batch(b, i)
    whole = batches[0].unionByName(batches[1]).unionByName(batches[2])
    assert _regs(store.registers()) == _regs(
        cms_sketch(whole, key_col="k", d=3, w=256)
    )
    est = {
        r["k"]: r["est_cnt"]
        for r in store.frequency_estimates(whole.limit(50)).collect()
    }
    for v in est.values():
        assert v >= 6  # every key occurs twice per batch x 3 batches

def test_bloom_incremental_equals_batch_recompute(spark, tmp_path):
    from tilegrab_spark.operators.bloom import bloom_build

    batches = _batches(spark)
    store = SketchStore(
        spark, str(tmp_path / "bl"), kind="bloom", key_col="k",
        m_bits=1024, k_hashes=3,
    )
    for i, b in enumerate(batches):
        assert store.ingest_batch(b, i) == i + 1
    whole = batches[0].unionByName(batches[1]).unionByName(batches[2])
    assert _regs(store.registers()) == _regs(
        bloom_build(whole, "k", m_bits=1024, k_hashes=3)
    )


def test_bloom_membership_no_false_negatives_across_batches(spark, tmp_path):
    batches = _batches(spark)
    store = SketchStore(
        spark, str(tmp_path / "blm"), kind="bloom", key_col="k",
        m_bits=4096, k_hashes=3,
    )
    for i, b in enumerate(batches):
        store.ingest_batch(b, i)
    whole = batches[0].unionByName(batches[1]).unionByName(batches[2])
    seen = {r.k for r in whole.select("k").distinct().collect()}
    probe = spark.createDataFrame(
        [(k,) for k in sorted(seen)] + [(f"never-{i}",) for i in range(50)],
        "k string",
    )
    got = {r.k: r.maybe_present for r in store.membership(probe).collect()}
    assert all(got[k] for k in seen)  # every ingested key, any batch
    fp = sum(got[f"never-{i}"] for i in range(50)) / 50
    assert fp <= 0.2
    # time travel: a key first ingested in a later batch is absent from
    # the earlier register state (unless a hash collision says maybe)
    late = spark.createDataFrame([("late-only-key",)], "k string")
    store.ingest_batch(late, 99)
    now = store.membership(late).collect()[0].maybe_present
    assert now is True  # no false negative ever
    before = store.membership(late, as_of=3).collect()[0].maybe_present
    # pre-ingest state: overwhelmingly False (4096 bits, ~600 set);
    # accept True only if the filter genuinely collides — re-derive
    import hashlib

    def pos(j):
        h = hashlib.md5(("late-only-key" + "bloom" + str(j)).encode()).hexdigest()
        return int(h[:15], 16) % 4096

    words = {
        r.word_idx: r.bits for r in store.registers(as_of=3).collect()
    }
    collide = all(
        (words.get(pos(j) >> 6, 0) & (1 << (pos(j) % 64))) != 0
        or (words.get(pos(j) >> 6, 0) < 0  # sign-bit word: python int of
            and ((words[pos(j) >> 6] + (1 << 64)) & (1 << (pos(j) % 64))) != 0)
        for j in range(3)
    )
    assert before == collide


def test_bloom_parameter_contract(spark, tmp_path):
    store = SketchStore(
        spark, str(tmp_path / "bpc"), kind="bloom", key_col="k",
        m_bits=1024, k_hashes=3,
    )
    store.ingest_batch(_batches(spark, n=1)[0], 0)
    with pytest.raises(ValueError, match="incompatible"):
        SketchStore(
            spark, str(tmp_path / "bpc"), kind="bloom", key_col="k",
            m_bits=2048, k_hashes=3,
        )
    with pytest.raises(ValueError, match="membership"):
        hll = SketchStore(spark, str(tmp_path / "bpc2"), kind="hll", key_col="k")
        hll.membership(_batches(spark, n=1)[0])


def test_time_travel_register_state(spark, tmp_path):
    batches = _batches(spark)
    store = SketchStore(spark, str(tmp_path / "tt"), kind="hll", key_col="k", p=9)
    seqs = [store.ingest_batch(b, i) for i, b in enumerate(batches)]
    at_first = store.registers(as_of=seqs[0])
    assert _regs(at_first) == _regs(hll_registers(batches[0], key_col="k", p=9))


def test_redelivery_is_noop_even_after_compaction(spark, tmp_path):
    batches = _batches(spark)
    store = SketchStore(spark, str(tmp_path / "re"), kind="cms", key_col="k", d=2, w=64)
    store.ingest_batch(batches[0], 0)
    store.ingest_batch(batches[1], 1)
    before = _regs(store.registers())
    assert store.ingest_batch(batches[0], 0) is None  # straight re-delivery
    assert _regs(store.registers()) == before
    store.compact()
    assert _regs(store.registers()) == before  # replace, not double-count
    assert store.ingest_batch(batches[1], 1) is None  # re-delivery across compaction
    assert _regs(store.registers()) == before
    store.ingest_batch(batches[2], 2)  # new work still lands
    whole = batches[0].unionByName(batches[1]).unionByName(batches[2])
    assert _regs(store.registers()) == _regs(cms_sketch(whole, key_col="k", d=2, w=64))


def test_two_writers_same_batch_no_double_count(spark, tmp_path):
    """Defense in depth beyond the single-writer contract: a second
    store instance on the same root re-delivering an already-committed
    batch_id is a no-op — its stale in-memory cache is refreshed from
    disk, not trusted (CMS sums would otherwise double-count)."""
    batches = _batches(spark, n=2)
    root = str(tmp_path / "two")
    a = SketchStore(spark, root, kind="cms", key_col="k", d=2, w=64)
    b = SketchStore(spark, root, kind="cms", key_col="k", d=2, w=64)
    # b builds (and caches) its EMPTY seen-set BEFORE a commits batch 0
    assert b._seen_cached() == set()
    assert a.ingest_batch(batches[0], 0) == 1
    state = _regs(a.registers())
    # b's cache is stale (doesn't know batch 0) but the disk check wins
    assert b.ingest_batch(batches[0], 0) is None
    assert _regs(b.registers()) == state
    # a genuinely new batch from b still lands
    assert b.ingest_batch(batches[1], 1) == 2
    whole = batches[0].unionByName(batches[1])
    assert _regs(b.registers()) == _regs(cms_sketch(whole, key_col="k", d=2, w=64))


def test_parameter_contract(spark, tmp_path):
    store = SketchStore(spark, str(tmp_path / "pc"), kind="hll", key_col="k", p=10)
    store.ingest_batch(_batches(spark, n=1)[0], 0)
    with pytest.raises(ValueError, match="incompatible"):
        SketchStore(spark, str(tmp_path / "pc"), kind="hll", key_col="k", p=12)
    with pytest.raises(ValueError, match="incompatible"):
        SketchStore(spark, str(tmp_path / "pc"), kind="cms", key_col="k")
    with pytest.raises(ValueError, match="kind"):
        SketchStore(spark, str(tmp_path / "x"), kind="theta", key_col="k")


def test_empty_store_raises(spark, tmp_path):
    store = SketchStore(spark, str(tmp_path / "empty"), kind="hll", key_col="k")
    with pytest.raises(SnapshotNotFound):
        store.registers()


def test_streaming_ingest_availablenow(spark, tmp_path):
    src = str(tmp_path / "src")
    batches = _batches(spark, n=2)
    for b in batches:
        b.write.mode("append").parquet(src)
    store = SketchStore(
        spark, str(tmp_path / "stream"), kind="hll", key_col="k", p=10
    )
    stream = spark.readStream.schema("k string").parquet(src)
    q = stream_sketch_ingest(
        stream, store, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    whole = batches[0].unionByName(batches[1])
    assert _regs(store.registers()) == _regs(hll_registers(whole, key_col="k", p=10))


def test_compaction_cas_refuses_to_drop_concurrent_delta(spark, tmp_path):
    """replace(expected_parent=N) must fail if a delta landed after N
    instead of silently erasing it."""
    from tilegrab_spark.plans.snapshots import CommitConflict

    store = SketchStore(spark, str(tmp_path / "cas"), kind="hll", key_col="k", p=8)
    b = _batches(spark, n=3)
    store.ingest_batch(b[0], 0)
    head = store.table.current_seq()
    folded = store.registers(as_of=head)
    store.ingest_batch(b[1], 1)  # concurrent delta after the fold was planned
    with pytest.raises(CommitConflict, match="concurrent"):
        store.table.replace(
            folded, summary={"compaction": True}, expected_parent=head
        )
    # a well-ordered compact() still works and keeps both batches
    store.compact()
    whole = b[0].unionByName(b[1])
    assert _regs(store.registers()) == _regs(hll_registers(whole, key_col="k", p=8))
