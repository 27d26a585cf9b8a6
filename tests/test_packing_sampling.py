"""Shard packing (distributed prefix sum) + deterministic stratified
sampling."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.packing import pack_shards, shard_manifest
from tilegrab_spark.operators.sampling import (
    sample_hash,
    stratified_sample,
    stratified_topn,
)


def _ref_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# pack_shards
# ---------------------------------------------------------------------------

def _pack_oracle(rows, shard_bytes):
    """Sequential reference: running offset in key order."""
    out, off = {}, 0
    for key, size in sorted(rows):
        out[key] = (off, off // shard_bytes)
        off += size
    return out


def test_pack_shards_matches_sequential_oracle(spark):
    rows = [(i, (i * 37) % 91 + 10) for i in range(977)]
    df = spark.createDataFrame(rows, "k long, sz long")
    got = {
        r.k: (r.start_offset, r.shard_id)
        for r in pack_shards(
            df, size_col="sz", order_col="k", shard_bytes=1000
        ).collect()
    }
    assert got == _pack_oracle(rows, 1000)


def test_pack_shards_partition_invariant(spark):
    """Same assignment regardless of input partitioning — the whole point
    of deterministic packing."""
    rows = [(i * 3 + 1, 50 + i % 7) for i in range(400)]
    a = spark.createDataFrame(rows, "k long, sz long").repartition(17)
    b = spark.createDataFrame(list(reversed(rows)), "k long, sz long").coalesce(1)
    pa = {
        r.k: (r.start_offset, r.shard_id)
        for r in pack_shards(a, size_col="sz", order_col="k", shard_bytes=512).collect()
    }
    pb = {
        r.k: (r.start_offset, r.shard_id)
        for r in pack_shards(b, size_col="sz", order_col="k", shard_bytes=512).collect()
    }
    assert pa == pb == _pack_oracle(rows, 512)


def test_pack_shards_oversized_row_owns_its_span(spark):
    rows = [(0, 10), (1, 5000), (2, 10)]
    df = spark.createDataFrame(rows, "k long, sz long")
    got = {
        r.k: r.shard_id
        for r in pack_shards(df, size_col="sz", order_col="k", shard_bytes=100).collect()
    }
    # row 1 starts in shard 0 (offset 10); row 2 starts at offset 5010 -> shard 50
    assert got == {0: 0, 1: 0, 2: 50}
    with pytest.raises(ValueError):
        pack_shards(df, size_col="sz", order_col="k", shard_bytes=0)


def test_shard_manifest(spark):
    rows = [(i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, sz long")
    packed = pack_shards(df, size_col="sz", order_col="k", shard_bytes=300)
    man = {
        r.shard_id: (r.n_items, r.bytes, r.first_key, r.last_key)
        for r in shard_manifest(packed, size_col="sz", order_col="k").collect()
    }
    # offsets 0..900 step 100; shard = offset // 300 -> 3,3,3,1 items
    assert man == {
        0: (3, 300, 0, 2),
        1: (3, 300, 3, 5),
        2: (3, 300, 6, 8),
        3: (1, 100, 9, 9),
    }


def test_pack_shards_repeat_run_stress(spark):
    """Byte-identical output across ≥10 executions with AQE toggled and
    shuffle-partition counts varied — the determinism property behind the
    one red CORRECTNESS_r03 row. Bucket identity is a pure function of
    the key (driver-computed boundaries), so no run configuration may
    change the assignment."""
    rows = [((i * 2654435761) % 100003, 10 + (i * 31) % 500) for i in range(2000)]
    # keys are unique under this multiplier/mod for the range used
    assert len({k for k, _ in rows}) == len(rows)
    df = spark.createDataFrame(rows, "k long, sz long").repartition(11)
    expect = _pack_oracle(rows, 4096)
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        outs = []
        for run in range(10):
            spark.conf.set("spark.sql.adaptive.enabled", str(run % 2 == 0).lower())
            spark.conf.set("spark.sql.shuffle.partitions", str([1, 3, 4, 7, 32][run % 5]))
            got = {
                r.k: (r.start_offset, r.shard_id)
                for r in pack_shards(
                    df, size_col="sz", order_col="k", shard_bytes=4096, n_buckets=8
                ).collect()
            }
            outs.append(got)
        assert all(o == expect for o in outs)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def test_pack_shards_string_keys_and_explicit_boundaries(spark):
    """Generic orderable keys (strings) + caller-supplied boundaries give
    the same assignment as derived boundaries."""
    rows = [(f"doc-{i:05d}", 40 + i % 13) for i in range(800)]
    df = spark.createDataFrame(rows, "k string, sz long")
    expect = _pack_oracle(rows, 1000)
    derived = {
        r.k: (r.start_offset, r.shard_id)
        for r in pack_shards(df, size_col="sz", order_col="k", shard_bytes=1000).collect()
    }
    explicit = {
        r.k: (r.start_offset, r.shard_id)
        for r in pack_shards(
            df,
            size_col="sz",
            order_col="k",
            shard_bytes=1000,
            boundaries=["doc-00200", "doc-00400", "doc-00600"],
        ).collect()
    }
    assert derived == explicit == expect
    with pytest.raises(ValueError):
        pack_shards(
            df, size_col="sz", order_col="k", shard_bytes=1000, boundaries=["b", "a"]
        )


def test_export_resume_shard_membership(spark, tmp_path):
    """End-to-end resume property: pack → write first N shards → 'crash'
    → re-pack the same corpus → remaining shards' membership is
    byte-identical to what a single uninterrupted run would have written.
    This is what makes packing resumable at 100 TB: shard membership is a
    pure function of the corpus, so a restart ships only missing shards."""
    rows = [((i * 48271) % 30011, 64 + (i * 17) % 200) for i in range(1500)]
    assert len({k for k, _ in rows}) == len(rows)
    df = spark.createDataFrame(rows, "k long, sz long")

    def membership():
        packed = pack_shards(df, size_col="sz", order_col="k", shard_bytes=2048)
        out: dict = {}
        for r in packed.collect():
            out.setdefault(r.shard_id, []).append((r.start_offset, r.k))
        return {s: sorted(v) for s, v in out.items()}

    full = membership()
    done = sorted(full)[: len(full) // 3]  # "crash" after the first third
    import json

    ckpt = tmp_path / "shards_done.json"
    ckpt.write_text(json.dumps(done))
    # resume: recompute, skip shards recorded in the checkpoint
    resumed = {s: v for s, v in membership().items() if s not in set(json.loads(ckpt.read_text()))}
    assert resumed == {s: v for s, v in full.items() if s not in set(done)}
    # and the union of done + resumed reconstructs the uninterrupted run
    assert set(done) | set(resumed) == set(full)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_sample_hash_matches_md5_contract(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {r.doc_id: r.h for r in df.select("doc_id", sample_hash("doc_id", "s1").alias("h")).collect()}
    assert got == {i: _ref_hash(f"{i}s1") for i in range(50)}


def test_stratified_sample_deterministic_and_rate(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    fr = {"en": 0.25, "de": 0.75}
    kept = stratified_sample(
        df, id_col="doc_id", fractions=fr, stratum_col="lang"
    )
    ids = {r.doc_id for r in kept.collect()}
    # pure function of the row: python recompute agrees exactly
    expect = {
        i
        for i, lang in rows
        if _ref_hash(str(i)) < int(fr[lang] * (1 << 60))
    }
    assert ids == expect
    # rates land near nominal (binomial, 3 sigma)
    n_en = sum(1 for i in ids if i % 3)
    n_de = len(ids) - n_en
    assert abs(n_en - 2000 * 0.25) < 3 * (2000 * 0.25 * 0.75) ** 0.5
    assert abs(n_de - 1000 * 0.75) < 3 * (1000 * 0.75 * 0.25) ** 0.5
    # unlisted strata fall back to default_fraction (0 -> dropped)
    df2 = df.withColumn("lang", F.lit("fr"))
    assert (
        stratified_sample(
            df2, id_col="doc_id", fractions=fr, stratum_col="lang"
        ).count()
        == 0
    )
    # a different salt draws a (near-)independent sample
    ids2 = {
        r.doc_id
        for r in stratified_sample(
            df, id_col="doc_id", fractions=fr, stratum_col="lang", salt="v2"
        ).collect()
    }
    assert ids2 != ids


def test_stratified_sample_validates(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        stratified_sample(df, id_col="doc_id", fractions=1.5)
    with pytest.raises(ValueError):
        stratified_sample(df, id_col="doc_id", fractions={"en": 0.5})


def test_stratified_topn_exact_quota(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string").repartition(13)
    got = stratified_topn(df, id_col="doc_id", stratum_col="lang", n=20).collect()
    by_lang: dict = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append((r.sample_rank, r.doc_id))
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 20, "de": 20}
    # exact: the 20 hash-smallest ids per stratum, rank in hash order
    for lang in ("en", "de"):
        pool = [i for i, l in rows if l == lang]
        expect = sorted(pool, key=lambda i: (_ref_hash(str(i)), i))[:20]
        got_ids = [i for _, i in sorted(by_lang[lang])]
        assert got_ids == expect
    # quota larger than the stratum returns the whole stratum
    assert (
        stratified_topn(df, id_col="doc_id", stratum_col="lang", n=10_000).count()
        == 500
    )


def test_stratified_topn_prefilter_consistent(spark):
    """With a generous prefilter the result is identical to no prefilter."""
    rows = [(i, "x") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    base = {
        r.doc_id
        for r in stratified_topn(df, id_col="doc_id", stratum_col="lang", n=10).collect()
    }
    pre = {
        r.doc_id
        for r in stratified_topn(
            df, id_col="doc_id", stratum_col="lang", n=10, prefilter_fraction=0.2
        ).collect()
    }
    assert base == pre and len(base) == 10


# ---------------------------------------------------------------------------
# weighted_sample (Efraimidis–Spirtas A-ES)
# ---------------------------------------------------------------------------

def _es_key(doc_id: int, w: float, salt: str = "") -> float:
    import math

    u = (_ref_hash(f"{doc_id}{salt}") + 1) / float(1 << 60)
    return -math.log(u) / w


def _es_oracle(rows, k, salt: str = ""):
    """Sequential reference: bottom-k by the exponential race key."""
    keyed = sorted(
        (( _es_key(i, w, salt), i) for i, w in rows if w is not None and w > 0)
    )
    return [i for _, i in keyed[:k]]


def test_weighted_sample_matches_python_oracle(spark):
    from tilegrab_spark.operators.sampling import weighted_sample

    rows = [(i, float((i * 13) % 29 + 1)) for i in range(1500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = (
        weighted_sample(df, id_col="doc_id", weight_col="w", k=100)
        .orderBy("sample_rank")
        .collect()
    )
    assert [r.doc_id for r in got] == _es_oracle(rows, 100)
    assert [r.sample_rank for r in got] == list(range(1, 101))


def test_weighted_sample_duckdb_oracle(spark):
    """Cross-engine parity: DuckDB re-derives the full race from the md5
    contract — hash, u, -ln(u)/w, bottom-k — and picks the same rows."""
    import duckdb

    from tilegrab_spark.operators.sampling import weighted_sample

    rows = [(i, float((i * 7) % 13 + 1)) for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        r.doc_id
        for r in weighted_sample(df, id_col="doc_id", weight_col="w", k=50)
        .orderBy("sample_rank")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {w})" for i, w in rows)
        + ") v(doc_id, w)"
    )
    want = [
        r[0]
        for r in con.execute(
            """
            SELECT doc_id FROM (
              SELECT doc_id,
                     -ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT + 1)
                          / 1152921504606846976.0) / w AS ekey
              FROM t WHERE w > 0
            ) ORDER BY ekey, doc_id LIMIT 50
            """
        ).fetchall()
    ]
    assert got == want


def test_weighted_sample_partition_invariant_and_prefix(spark):
    from tilegrab_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0 + (i % 5)) for i in range(1000)]
    a = spark.createDataFrame(rows, "doc_id long, w double").repartition(23)
    b = spark.createDataFrame(list(reversed(rows)), "doc_id long, w double").coalesce(1)
    sa = [
        r.doc_id
        for r in weighted_sample(a, id_col="doc_id", weight_col="w", k=60)
        .orderBy("sample_rank")
        .collect()
    ]
    sb = [
        r.doc_id
        for r in weighted_sample(b, id_col="doc_id", weight_col="w", k=60)
        .orderBy("sample_rank")
        .collect()
    ]
    assert sa == sb
    # any prefix is itself the valid smaller sample
    s30 = [
        r.doc_id
        for r in weighted_sample(a, id_col="doc_id", weight_col="w", k=30)
        .orderBy("sample_rank")
        .collect()
    ]
    assert sa[:30] == s30


def test_weighted_sample_weight_proportionality(spark):
    """Rows with 10x the weight are sampled ~10x as often (single
    deterministic draw, so check aggregate representation, generously)."""
    from tilegrab_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, id_col="doc_id", weight_col="w", k=400).collect()
    heavy = sum(1 for r in got if r.doc_id % 2 == 0)
    # expected heavy fraction ~ 10/11 = 0.909; allow wide slack
    assert heavy / 400 > 0.75


def test_weighted_sample_stratified_and_validation(spark):
    import pytest as _pytest

    from tilegrab_spark.operators.sampling import weighted_sample

    rows = [(i, "en" if i % 3 else "de", 1.0 + i % 4) for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    got = weighted_sample(
        df, id_col="doc_id", weight_col="w", k=25, stratum_col="lang"
    ).collect()
    per = {}
    for r in got:
        per.setdefault(r.lang, []).append((r.sample_rank, r.doc_id))
    assert set(per) == {"en", "de"} and all(len(v) == 25 for v in per.values())
    # per-stratum result equals the global oracle restricted to the stratum
    en_rows = [(i, w) for i, lang, w in rows if lang == "en"]
    assert [i for _, i in sorted(per["en"])] == _es_oracle(en_rows, 25)
    # null / non-positive weights drop; bad k raises
    df2 = spark.createDataFrame(
        [(1, None), (2, 0.0), (3, -1.0), (4, 2.0)], "doc_id long, w double"
    )
    kept = weighted_sample(df2, id_col="doc_id", weight_col="w", k=10).collect()
    assert [r.doc_id for r in kept] == [4]
    with _pytest.raises(ValueError):
        weighted_sample(df, id_col="doc_id", weight_col="w", k=0)
