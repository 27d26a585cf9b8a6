"""Dedup operators vs brute-force oracles on small corpora."""

import itertools

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over a lazy dog"),  # near dup
    (3, "pack my box with five dozen liquor jugs"),
    (4, "pack my box with five dozen liquor jugs today"),  # near dup of 3
    (5, "sphinx of black quartz judge my vow"),
    (6, "completely different text about spark dataframes and shuffles"),
    (7, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _shingles(text, k=3):
    toks = text.lower().split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _jaccard(a, b, k=3):
    sa, sb = _shingles(a, k), _shingles(b, k)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(docs_df):
    out = dedup.exact_dedup(docs_df)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [0, 2, 3, 4, 5, 6]  # 1 and 7 dropped, min-id kept
    groups = dedup.duplicate_groups(docs_df).collect()
    assert len(groups) == 1 and groups[0].n_dups == 3 and groups[0].keep_id == 0


def test_ngram_jaccard_pairs_vs_oracle(docs_df):
    thr = 0.3
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs_df, threshold=thr).collect()
    }
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        j = _jaccard(ta, tb)
        if j >= thr:
            want[(ia, ib)] = j
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k])


def test_minhash_lsh_finds_exact_and_near_dups(docs_df):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(docs_df, threshold=0.3).collect()
    }
    # exact dups always collide in every band
    assert (0, 1) in pairs and (0, 7) in pairs and (1, 7) in pairs
    assert pairs[(0, 1)] == 1.0
    # verified jaccard is EXACT (matches the brute-force value)
    for (a, b), j in pairs.items():
        assert j == pytest.approx(_jaccard(DOCS[a][1], DOCS[b][1]))
    # nothing below threshold leaks through
    assert all(j >= 0.3 for j in pairs.values())


def test_lsh_dedup_keeps_min_id(docs_df):
    kept = sorted(r.doc_id for r in dedup.lsh_dedup(docs_df, threshold=0.9).collect())
    assert 0 in kept and 1 not in kept and 7 not in kept


def test_simhash_pairs(docs_df):
    sp = {(r.id_a, r.id_b): r.hamming for r in dedup.simhash_pairs(docs_df, max_hamming=3).collect()}
    # exact dups at hamming 0
    assert sp.get((0, 1)) == 0 and sp.get((0, 7)) == 0
    # simhash is deterministic across invocations
    sp2 = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_pairs(docs_df, max_hamming=3).collect()
    }
    assert sp == sp2


def test_simhash_blocking_is_exhaustive_for_small_distance(spark):
    # pairs at hamming<=3 MUST be found (pigeonhole guarantee): build texts
    # whose simhashes differ by few bits by perturbing one word
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [(0, base), (1, base + " mu")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hs = {r.doc_id: r.simhash for r in dedup.with_simhash(df).collect()}
    d = bin((hs[0] ^ hs[1]) & ((1 << 64) - 1)).count("1")
    found = dedup.simhash_pairs(df, max_hamming=max(d, 1)).count()
    assert found == 1


def test_hamming_near_dup_exact_vs_bruteforce(spark):
    """Generic int64-hamming pairs: exact recovery vs a numpy popcount
    brute force, including sign-bit (bit 63) and uncovered-top-bit edge
    cases of the pigeonhole banding."""
    import numpy as np

    vals = [
        0,
        1,                      # d(0,1)=1
        3,                      # d(1,3)=1
        1 << 63,                # sign bit only: d(0, 1<<63)=1
        (1 << 63) | 1,          # d(1<<63, ...|1)=1
        (1 << 62) | (1 << 21),  # straddles band boundaries
        (1 << 62) | (1 << 21) | (1 << 42),
        0x5555555555555555,     # far from everything
    ]
    rows = [(i, np.int64(np.uint64(v)).item()) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, h long")
    for k in (1, 2, 3):
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in dedup.hamming_near_dup_pairs(
                df, hash_col="h", id_col="id", max_hamming=k
            ).collect()
        }
        want = {}
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                d = bin((vals[i] ^ vals[j]) & ((1 << 64) - 1)).count("1")
                if d <= k:
                    want[(i, j)] = d
        assert got == want, (k, got, want)


def test_phash_near_dup_pairs_images(spark):
    """Image-payload near-dup: a tile and its lightly perturbed re-render
    land within a few phash bits and MUST pair; unrelated tiles must not."""
    import numpy as np

    from tilegrab_spark.kernels import png

    # structured scenes (the synthetic XOR tiles have uniform 8x8 block
    # means, so their phashes all collapse to one value — a real phash
    # test needs real structure): vertical ramp vs horizontal ramp
    ramp = np.linspace(0, 255, 256, dtype=np.uint8)
    a = np.repeat(ramp[:, None, None], 256, axis=1).repeat(3, axis=2)
    b = a.copy()
    b[:40, :40] = 255  # local corruption: phash moves by a few bits at most
    c = np.repeat(ramp[None, :, None], 256, axis=0).repeat(3, axis=2)
    rows = [
        ("img_a", png.phash64(a)),
        ("img_b", png.phash64(b)),
        ("img_c", png.phash64(c)),
    ]
    d_ab = bin((rows[0][1] ^ rows[1][1]) & ((1 << 64) - 1)).count("1")
    d_ac = bin((rows[0][1] ^ rows[2][1]) & ((1 << 64) - 1)).count("1")
    assert d_ab < d_ac  # sanity: perturbation is nearer than a new scene
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.phash_near_dup_pairs(df, max_hamming=max(d_ab, 1)).collect()
    }
    assert got.get(("img_a", "img_b")) == d_ab
    assert ("img_a", "img_c") not in got


def test_embedding_cosine_pairs(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    rows = [
        (0, [float(v) for v in base]),
        (1, [float(v) for v in base * 2.0]),        # same direction => cos 1
        (2, [float(v) for v in base + rng.standard_normal(8) * 0.05]),
        (3, [float(v) for v in rng.standard_normal(8)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup.embedding_cosine_pairs(df, threshold=0.95, exact=True).collect()
    }
    assert (0, 1) in got and got[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in got
    assert not any(3 in p for p in got)
    # LSH-bucketed variant finds the same high-cosine pairs
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(df, threshold=0.95, n_probe_bits=2).collect()
    }
    assert (0, 1) in lsh
    # quadratic path requires explicit opt-in; bucketless default is an error
    with pytest.raises(ValueError, match="exact=True"):
        dedup.embedding_cosine_pairs(df, threshold=0.95, n_probe_bits=0)


def test_embedding_pairs_lsh_recall_vs_exact(spark):
    """Scale-safe default (LSH sign-buckets) vs exact all-pairs: on a
    clustered corpus the bucketed path keeps high recall at the near-dup
    threshold, and every pair it emits is a true pair (precision 1.0 by
    construction — the cosine filter is exact either way)."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for c in range(20):  # 20 clusters of 3 near-identical vectors
        center = rng.standard_normal(16)
        for _ in range(3):
            v = center + rng.standard_normal(16) * 0.02
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(df, threshold=0.95, exact=True).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(df, threshold=0.95).collect()
    }
    assert lsh <= exact  # precision 1.0: bucketing can only miss, not invent
    assert len(exact) >= 50
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below gate"


def test_ngram_jaccard_max_df_exact_on_kept_pairs(docs_df):
    # with max_df blocking, every kept pair's jaccard is the exact value
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs_df, k=1, threshold=0.3).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs_df, k=1, threshold=0.3, max_df=4).collect()
    }
    assert set(capped) <= set(full)
    for p, j in capped.items():
        assert j == pytest.approx(full[p])
    # exact dup groups always share rare shingles here -> still found
    assert (0, 1) in capped


def test_simhash_whitespace_only_is_zero(spark):
    """Whitespace-only text has no tokens => simhash 0, same as empty —
    matching the SQL oracle's token-less case (NOT all-ones)."""
    df = spark.createDataFrame([(0, "   "), (1, ""), (2, "\t\n")],
                               "doc_id long, text string")
    hs = {r.doc_id: r.simhash for r in dedup.with_simhash(df).collect()}
    assert hs == {0: 0, 1: 0, 2: 0}


def test_vectorized_minhash_matches_object_math_reference(spark):
    """The uint64 limb-arithmetic minhash (no Python bignums) must be
    bit-identical to the arbitrary-precision reference formula on real
    shingled rows — the DuckDB oracle pins the same contract."""
    import numpy as np

    from tilegrab_spark.operators.dedup import (
        _MERSENNE,
        _perm_params,
        _stable_hash64,
        with_minhash,
        with_shingles,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, ""),
        (3, "   "),
        (4, "one"),
        (5, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.minhash
        for r in with_minhash(with_shingles(df), num_hashes=16).collect()
    }
    a, b = _perm_params(16)
    sh = {r.doc_id: r.shingles for r in with_shingles(df).collect()}
    for did, shingles in sh.items():
        if not shingles:
            assert got[did] == [0] * 16
            continue
        hs = [_stable_hash64(s) & 0x7FFFFFFFFFFFFFFF for s in shingles]
        want = [
            min((int(a[i]) * h + int(b[i])) % _MERSENNE for h in hs)
            for i in range(16)
        ]
        assert got[did] == want, did


def test_vectorized_simhash_matches_scalar_reference(spark):
    """Batch-factorized simhash == the per-row scalar recurrence."""
    import numpy as np

    from tilegrab_spark.operators.dedup import _stable_hash64, with_simhash

    rows = [
        (0, "the quick brown fox"),
        (1, ""),
        (2, "   \t\n"),
        (3, "Tile TILE tile"),
        (4, "a b c d e f g h i j k l m n o p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in with_simhash(df).collect()}
    for did, text in rows:
        toks = text.lower().split() if text else []
        if not toks:
            assert got[did] == 0, did
            continue
        hs = [_stable_hash64(w) for w in toks]
        bits = [sum((h >> s) & 1 for h in hs) for s in range(64)]
        u = sum((1 << s) for s in range(64) if bits[s] * 2 >= len(toks))
        want = u - (1 << 64) if u >= (1 << 63) else u
        assert got[did] == want, did


def test_sig_version_marker_and_check(spark):
    """with_minhash/with_simhash stamp the hash-contract version into
    column metadata; check_sig_version raises on a mismatched marker and
    passes on current/absent ones (ADVICE r1: mixed-build signature
    tables must fail loudly)."""
    import pytest

    from tilegrab_spark.operators.dedup import (
        SIG_VERSION,
        check_sig_version,
        with_minhash,
        with_shingles,
        with_simhash,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    m = with_minhash(with_shingles(df), num_hashes=4)
    assert m.schema["minhash"].metadata["sig_version"] == SIG_VERSION
    s = with_simhash(df)
    assert s.schema["simhash"].metadata["sig_version"] == SIG_VERSION
    check_sig_version(m, "minhash")  # current -> ok
    check_sig_version(df, "text")  # no marker -> ok
    stale = df.withColumn(
        "simhash", F.lit(0).alias("simhash", metadata={"sig_version": 1})
    )
    with pytest.raises(ValueError, match="sig_version"):
        check_sig_version(stale, "simhash")


def test_release_signature_caches(spark, docs_df):
    """LSH/simhash signature caches are tracked and released on demand
    (ADVICE r2: persisted frames otherwise accumulate for the session)."""
    from tilegrab_spark.operators import dedup

    dedup.release_signature_caches()  # start clean
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    dedup.minhash_lsh_pairs(docs_df, threshold=0.3).count()
    dedup.simhash_pairs(docs_df, max_hamming=3).count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > before
    released = dedup.release_signature_caches()
    assert released >= 2
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


class TestSemanticDedup:
    """SemDeDup-style cluster-blocked semantic dedup (semantic_dedup)."""

    def _corpus(self, spark):
        import numpy as np

        rng = np.random.default_rng(17)
        # three well-separated unit directions in R^8
        dirs = np.eye(8)[:3]
        rows = []
        vid = 0
        expected_groups = []
        for d in range(3):
            # 4 near-duplicate groups of 3 + 4 singletons per direction,
            # all tightly around the direction (same cluster), groups
            # separated enough that cross-group cosine < 0.999
            for g in range(4):
                base = dirs[d] + 0.05 * rng.standard_normal(8) * (g + 1)
                ids = []
                for _ in range(3):
                    v = base + 1e-4 * rng.standard_normal(8)
                    rows.append((vid, [float(x) for x in v]))
                    ids.append(vid)
                    vid += 1
                expected_groups.append(tuple(sorted(ids)))
            for _ in range(4):
                v = dirs[d] + 0.2 * rng.standard_normal(8)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        return df, expected_groups

    def test_groups_get_min_id_representative(self, spark):
        df, groups = self._corpus(spark)
        out = dedup.semantic_dedup(
            df, n_centroids=3, threshold=0.999, iters=4
        ).toPandas().set_index("vec_id")
        for ids in groups:
            keep = min(ids)
            for i in ids:
                assert out.loc[i, "keep_id"] == keep, (i, ids)
                assert bool(out.loc[i, "is_kept"]) == (i == keep)

    def test_singletons_kept_and_total_rows(self, spark):
        df, groups = self._corpus(spark)
        out = dedup.semantic_dedup(df, n_centroids=3, threshold=0.999, iters=4)
        pdf = out.toPandas()
        assert len(pdf) == df.count()  # one row per input
        grouped_ids = {i for ids in groups for i in ids}
        singles = pdf[~pdf.vec_id.isin(grouped_ids)]
        assert singles.is_kept.all()
        assert (singles.keep_id == singles.vec_id).all()
        # dedup rate: each group of 3 keeps exactly 1
        assert int(pdf.is_kept.sum()) == len(pdf) - 2 * len(groups)

    def test_blocking_never_crosses_clusters(self, spark):
        """Representatives and members share a list_id — pairs are only
        generated within clusters (the scale contract)."""
        df, _ = self._corpus(spark)
        out = dedup.semantic_dedup(df, n_centroids=3, threshold=0.999, iters=4)
        a = out.select("vec_id", "list_id", "keep_id")
        b = out.select(F.col("vec_id").alias("keep_id"), F.col("list_id").alias("keep_list"))
        joined = a.join(b, "keep_id")
        assert joined.filter(F.col("list_id") != F.col("keep_list")).count() == 0
