"""Deduplication operators for large-scale training-data pipelines
(driver brief: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine). All Spark-first: hashing/banding are native expressions or
Arrow-vectorized kernels; candidate generation is always a *blocked*
self-join (band buckets / shared n-grams), never a cross join — the only
shape that survives 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy, keep the smallest id per content hash.
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per exact text (min id wins). Pure relational:
    md5-partitioned row_number — a single shuffle on the content hash,
    map-side combinable, no skew beyond true duplicate groups."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(content_hash, n_dups, keep_id) for groups with >1 member."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash + LSH banding.
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1

# Persisted signature frames (minhash_lsh_pairs / simhash_pairs cache the
# narrow signature table so the banded self-join doesn't run the hashing
# kernel twice). Spark dedups cache entries by canonicalized plan, so
# repeated calls over the SAME input reuse one entry — but a long-lived
# session sweeping many DISTINCT inputs accumulates entries and relies on
# LRU eviction. Handles are tracked here; call release_signature_caches()
# between sweeps to drop them deterministically.
_SIG_CACHE_HANDLES: list = []


def _persist_signatures(df: DataFrame) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()  # eager: both join sides must hit the cache, not race it
    _SIG_CACHE_HANDLES.append(out)
    return out


def _persist_owned(df: DataFrame, owned: list) -> DataFrame:
    """persist via the tracked registry AND record the handle in the
    caller's own list, so per-batch release can't touch frames another
    interleaved caller persisted (positional slicing of the global
    registry is unsafe when two foreachBatch streams share a driver)."""
    out = _persist_signatures(df)
    owned.append(out)
    return out


def _release_owned(owned: list) -> int:
    """Unpersist exactly the caller's own handles and drop them from
    the global registry BY IDENTITY (DataFrame __eq__ builds a Column,
    so list.remove would misbehave)."""
    ids = {id(h) for h in owned}
    for h in owned:
        h.unpersist()
    _SIG_CACHE_HANDLES[:] = [h for h in _SIG_CACHE_HANDLES if id(h) not in ids]
    n = len(owned)
    owned.clear()
    return n


def release_signature_caches() -> int:
    """Unpersist every signature frame cached by minhash_lsh_pairs /
    simhash_pairs in this process; returns how many were released. Safe
    to call while results are still referenced — Spark recomputes them."""
    n = len(_SIG_CACHE_HANDLES)
    for h in _SIG_CACHE_HANDLES:
        h.unpersist()
    _SIG_CACHE_HANDLES.clear()
    return n

# Hash-contract version for persisted signature tables. v2 = md5-low-8-bytes
# _stable_hash64 (v1, early round-1 builds, was blake2b-low-8 — signatures
# from the two are incompatible). with_minhash/with_simhash stamp this into
# the output column metadata so a mixed-build signature table can be
# detected with check_sig_version() instead of silently producing wrong
# near-dup pairs.
SIG_VERSION = 2
_SIG_META = {"sig_version": SIG_VERSION, "sig_hash": "md5-low-8"}


def check_sig_version(df: DataFrame, col: str) -> DataFrame:
    """Raise if ``col`` carries a signature-version marker that doesn't
    match this build's hash contract. Columns with no marker (pre-v2
    tables, or metadata stripped by a non-parquet round-trip) pass with
    no check — recompute such tables to be safe."""
    meta = df.schema[col].metadata or {}
    v = meta.get("sig_version")
    if v is not None and int(v) != SIG_VERSION:
        raise ValueError(
            f"{col!r} was computed under sig_version={v}, this build is "
            f"sig_version={SIG_VERSION} ({_SIG_META['sig_hash']}) — "
            "recompute the signature table; mixing versions yields wrong pairs"
        )
    return df


def _stable_hash64(s: str) -> int:
    """Process-independent 64-bit string hash (Python's builtin hash() is
    salted per interpreter — unusable across executors). md5-low-8-bytes
    so independent engines can re-derive it (DuckDB:
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` — the SimHash oracle in
    __spark_entry__.py depends on this exact choice)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _stable_hash64_batch(strings) -> np.ndarray:
    """Vectorized _stable_hash64 over a sequence of strings: one md5 call
    per string (the contract), but the 8-byte extraction is a single
    ``np.frombuffer`` over the joined digests instead of per-item
    ``int.from_bytes`` — and callers hash only the batch's UNIQUE strings
    (pd.factorize), which on natural text cuts the md5 count by ~10x."""
    import hashlib

    md5 = hashlib.md5
    joined = b"".join(md5(s.encode()).digest()[:8] for s in strings)
    return np.frombuffer(joined, dtype=">u8").astype(np.uint64)


def _permute_mod_mersenne(uh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(U, H) matrix of (a_j * h_i + b_j) mod (2^61 - 1), exact, entirely
    in uint64: the 128-bit product a*h is built from 32-bit limbs and
    reduced with the Mersenne fold 2^61 ≡ 1 (and 2^64 ≡ 8). Matches the
    arbitrary-precision reference bit-for-bit (test_dedup parity test);
    the DuckDB HUGEINT oracle pins the same semantics end-to-end.

    uh: (U,) uint64 < 2^63. a, b: (H,) uint64 < 2^61 - 1.
    """
    M = np.uint64(_MERSENNE)
    lo32 = np.uint64(0xFFFFFFFF)
    s32, s61 = np.uint64(32), np.uint64(61)

    def fold(x):  # x < 2^64  ->  x mod-congruent value < 2^61 + 8
        return (x >> s61) + (x & M)

    h = uh[:, None]
    av = a[None, :]
    a0, a1 = av & lo32, av >> s32
    h0, h1 = h & lo32, h >> s32
    p0 = a0 * h0                      # < 2^64
    pm = a1 * h0 + a0 * h1            # < 2^29*2^32 + 2^32*2^31 < 2^64
    p2 = a1 * h1                      # < 2^60
    # a*h = p2*2^64 + pm*2^32 + p0 ; 2^64 ≡ 8 (mod M)
    t2 = fold(p2 * np.uint64(8))
    tm = fold(fold((pm & lo32) << s32) + (pm >> s32) * np.uint64(8))
    t0 = fold(p0)
    s = fold(fold(t2 + tm + t0 + b[None, :]))
    return np.where(s >= M, s - M, s)


def _perm_params(num_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64)
    return a, b


def _with_min_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up when the input arrives with fewer partitions than
    cores (a single small parquet file = ONE partition = a serial UDF
    pass, whatever the cluster width). On a real 10^12-row table the
    scan has thousands of splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def with_shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Word k-shingles as an array column — native split + transform
    (higher-order functions, no UDF)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle = lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))  # noqa: E731
    return df.withColumn(
        "shingles",
        F.when(n >= k, F.array_distinct(F.transform(idx, shingle))).otherwise(
            F.array(F.concat_ws(" ", toks))
        ),
    )


def with_minhash(
    df: DataFrame, *, num_hashes: int = 64, shingle_col: str = "shingles", seed: int = 42
) -> DataFrame:
    """MinHash signature as an array<long> via a vectorized Arrow UDF:
    per row, sig[i] = min over shingles of (a_i * h(s) + b_i) mod M.

    Batch-vectorized end to end: the batch's shingles are factorized so
    each UNIQUE shingle is md5-hashed once (natural-text corpora repeat
    shingles heavily across rows), all permutations are computed in one
    uint64 limb-arithmetic pass (_permute_mod_mersenne — no Python-object
    bignums), and per-row minima come from ``np.minimum.reduceat`` over
    row boundaries. No per-shingle interpreted Python anywhere."""
    a, b = _perm_params(num_hashes, seed)
    a_u = a.astype(np.uint64)
    b_u = b.astype(np.uint64)

    @F.pandas_udf("array<long>")
    def minhash(shingles: pd.Series) -> pd.Series:
        lens = np.array(
            [0 if sh is None else len(sh) for sh in shingles], dtype=np.int64
        )
        out = [None] * len(shingles)
        if lens.sum() == 0:
            return pd.Series([[0] * num_hashes for _ in range(len(shingles))])
        flat = [s for sh in shingles if sh is not None for s in sh]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uh = _stable_hash64_batch(uniques) & np.uint64(0x7FFFFFFFFFFFFFFF)
        pv = _permute_mod_mersenne(uh, a_u, b_u)  # (U, H)
        nz = lens > 0
        starts = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
        # per-permutation reduceat: (T,) gather + segmented min — bounded
        # memory (one T-length column at a time, not a (T, H) matrix)
        mins = np.empty((nz.sum(), num_hashes), dtype=np.int64)
        for j in range(num_hashes):
            mins[:, j] = np.minimum.reduceat(pv[codes, j], starts).astype(np.int64)
        zero_sig = [0] * num_hashes
        mi = 0
        for i, n in enumerate(lens):
            if n == 0:
                out[i] = zero_sig
            else:
                out[i] = mins[mi].tolist()
                mi += 1
        return pd.Series(out)

    return df.withColumn(
        "minhash", minhash(F.col(shingle_col)).alias("minhash", metadata=_SIG_META)
    )


def band_hashes(sig: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """Explode a (_id, minhash) frame to (_id, band, band_hash) — the
    3-scalar LSH banding shape (see the shuffle-size note in
    minhash_lsh_pairs; also reused by streaming/incremental_dedup.py)."""
    return (
        sig.withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))))
        .withColumn(
            "band_hash",
            F.xxhash64(
                F.col("band"),
                F.slice(
                    F.col("minhash"), F.col("band") * rows_per_band + 1, rows_per_band
                )
                .cast("array<string>")
                .cast("string"),
            ),
        )
        .select("_id", "band", "band_hash")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate duplicate pairs via LSH banding, verified by EXACT
    n-gram Jaccard (computed from the shingle sets, not the estimate).

    shingle → minhash → band-hash → groupBy(band, hash) bucket join →
    distinct pairs → exact-jaccard filter. The self-join happens only
    within buckets (skew-bounded by band width), never across the corpus.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    df = _with_min_parallelism(df)
    sig = with_minhash(with_shingles(df, text_col, shingle_k), num_hashes=num_hashes)
    # the signature UDF feeds BOTH sides of the banded self-join — without
    # materialization Spark recomputes it per side (2x the dominant cost).
    # Persist the narrow (id, minhash) frame: this is the batch analogue
    # of the signature TABLE a 10^12-row pipeline would write once and
    # reuse (spill-safe MEMORY_AND_DISK; ~0.5 KB/row). Eagerly counted so
    # the join's two sides don't race the cache within one job and each
    # run the UDF anyway. Handle tracked in _SIG_CACHE_HANDLES —
    # release_signature_caches() drops it deterministically.
    sig = _persist_signatures(sig.select(F.col(id_col).alias("_id"), "minhash"))

    # the x-bands explode and its self-join carry ONLY (_id, band,
    # band_hash) — 3 scalar columns. Shipping the shingle arrays through
    # here would multiply shuffle bytes by the band count (16x); instead
    # the (much smaller) candidate-pair set joins the shingle sets back
    # afterwards for the exact-Jaccard verify — same shape as the max_df
    # branch of ngram_jaccard_pairs.
    banded = band_hashes(sig, bands, rows_per_band)

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # the verify branch re-derives shingle sets NATIVELY (split/transform,
    # no UDF) — cheaper than dragging the big string arrays through the
    # persisted frame's columnar cache encode
    sets = with_shingles(df, text_col, shingle_k).select(
        F.col(id_col).alias("_id"), "shingles"
    )
    sha = sets.select(F.col("_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    shb = sets.select(F.col("_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(sha, "id_a")
        .join(shb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def lsh_dedup(df: DataFrame, *, id_col: str = "doc_id", **kw) -> DataFrame:
    """Drop near-duplicates: keep a row unless it pairs (above threshold)
    with a smaller id. Single-link via iterated min-propagation is
    overkill for dedup; 'min-id survivor per pair' matches common
    training-pipeline practice (each dropped doc names its keeper)."""
    pairs = minhash_lsh_pairs(df, id_col=id_col, **kw)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash (64-bit) + hamming-banded near-dup.
# ---------------------------------------------------------------------------

def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word tokens — batch-vectorized Arrow UDF:
    tokens are factorized across the whole batch so each unique token is
    md5-hashed once, per-row bit-count sums come from segmented
    ``np.add.reduceat``, and the majority vote + bit-pack is one numpy
    pass. No per-token interpreted Python."""

    @F.pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        toks_per_row = [t.lower().split() if t else [] for t in texts]
        lens = np.array([len(t) for t in toks_per_row], dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.int64)
        if lens.sum() == 0:  # all empty/whitespace-only => simhash 0
            return pd.Series(out)
        flat = [w for toks in toks_per_row for w in toks]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uh = _stable_hash64_batch(uniques)
        ubits = ((uh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        nz = lens > 0
        starts = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
        R, U = int(nz.sum()), len(uniques)
        # histogram path only while the R x U bincount stays small
        # (<= 2^22 int64 = 32 MiB/batch; one Python worker per core means
        # per-batch allocations multiply by the core count)
        if R * U <= 1 << 22:
            # small vocabulary: per-row token histogram + one matmul
            # beats 64 segmented reductions
            row_ids = np.repeat(np.arange(R), lens[nz])
            hist = np.bincount(row_ids * U + codes, minlength=R * U).reshape(R, U)
            counts = hist @ ubits
        else:
            counts = np.empty((R, 64), dtype=np.int64)
            for bpos in range(64):
                counts[:, bpos] = np.add.reduceat(ubits[codes, bpos], starts)
        v = (counts * 2 >= lens[nz][:, None]).astype(np.uint64)
        out[nz] = (v << shifts[None, :]).sum(axis=1, dtype=np.uint64).astype(np.int64)
        return pd.Series(out)

    return df.withColumn(
        "simhash", simhash(F.col(text_col)).alias("simhash", metadata=_SIG_META)
    )


def hamming_near_dup_pairs(
    df: DataFrame, *, hash_col: str, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """EXACT near-dup pairs with hamming(hash) <= max_hamming over any
    int64 hash column, found by the pigeonhole block trick: split 64 bits
    into (max_hamming+1) blocks — any pair within distance k differs in
    <= k blocks, so it agrees exactly on >=1 block — bucket-join on
    (block_idx, block_value), then exact popcount filter. Blocked join,
    no cross product; completeness is a theorem, not a probability."""
    nblocks = max_hamming + 1
    width = 64 // nblocks
    # reject persisted signature tables from an incompatible hash
    # contract here, at the consumer — not only in the opt-in helper
    check_sig_version(df, hash_col)
    sh = df.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))
    mask = (1 << width) - 1
    vals = F.array(
        *[
            F.shiftrightunsigned(F.col("_h"), i * width).bitwiseAND(F.lit(mask))
            for i in range(nblocks)
        ]
    )
    blocks = sh.select(
        "_id", "_h", F.posexplode(vals).alias("blk", "blk_val")
    )
    l, r = blocks.alias("l"), blocks.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l.blk") == F.col("r.blk"),
                F.col("l.blk_val") == F.col("r.blk_val"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._h").alias("sh_a"),
            F.col("r._h").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def simhash_pairs(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup text pairs by SimHash (see hamming_near_dup_pairs for the
    exact pigeonhole blocking). The simhash frame is materialized once —
    the blocked self-join consumes it on both sides, and without the
    persist each side would re-run the hashing UDF. The cache handle is
    tracked; release_signature_caches() drops it deterministically."""
    df = _with_min_parallelism(df)
    sh = _persist_signatures(with_simhash(df, text_col).select(id_col, "simhash"))
    return hamming_near_dup_pairs(
        sh, hash_col="simhash", id_col=id_col, max_hamming=max_hamming
    )


def phash_near_dup_pairs(
    images_df: DataFrame,
    *,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 4,
) -> DataFrame:
    """Image near-dup pairs by perceptual hash — the image table carries
    ``phash:int64`` (BASELINE.json input_hint; computed by
    kernels/png.py::phash64 at ingest). Two re-encodes / slight crops of
    the same scene land within a few phash bits; this finds every pair
    with hamming(phash) <= max_hamming via the exact pigeonhole blocked
    join — the image-payload analogue of SimHash text dedup, and the only
    join shape that survives 10^12 rows (no cross product, candidates
    bucketed by 64/(k+1)-bit blocks)."""
    return hamming_near_dup_pairs(
        images_df, hash_col=phash_col, id_col=id_col, max_hamming=max_hamming
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity join (no LSH — exact, via shared-ngram blocking).
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via inverted-index blocking:
    explode shingles → self-join on shingle (pairs share >=1 shingle) →
    count common → jaccard from per-doc set sizes. Fully relational
    (SQL-expressible — this one has a DuckDB oracle).

    Scale note: a shingle appearing in d documents generates O(d^2)
    candidate pairs — with k>=3 word shingles this is sparse by
    construction, but degenerate vocabularies (or k=1) can blow up.
    ``max_df`` drops shingles whose document frequency exceeds it from
    the BLOCKING index only; jaccard is still computed on the full
    shingle sets, so kept pairs are exact — pairs that share ONLY
    ultra-common shingles may be missed (the standard stop-shingle
    tradeoff, stated rather than silent)."""
    sh = with_shingles(df, text_col, k).select(
        F.col(id_col).alias("_id"), "shingles"
    )
    sizes = sh.select("_id", F.size("shingles").alias("_n"))
    inv = sh.select("_id", F.explode("shingles").alias("s"))
    if max_df is not None:
        # block only on sub-max_df shingles, then RE-VERIFY candidates
        # with exact set intersection over the full shingle sets (the
        # blocked index alone would undercount `common`)
        rare = inv.groupBy("s").count().filter(F.col("count") <= max_df).select("s")
        blocked = inv.join(rare, on="s", how="left_semi")
        l, r = blocked.alias("l"), blocked.alias("r")
        cand = (
            l.join(r, on=[F.col("l.s") == F.col("r.s"), F.col("l._id") < F.col("r._id")])
            .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        sha = sh.select(F.col("_id").alias("id_a"), F.col("shingles").alias("sh_a"))
        shb = sh.select(F.col("_id").alias("id_b"), F.col("shingles").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
        return (
            cand.join(sha, "id_a")
            .join(shb, "id_b")
            .withColumn("jaccard", inter / union)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    l, r = inv.alias("l"), inv.alias("r")
    common = (
        l.join(r, on=[F.col("l.s") == F.col("r.s"), F.col("l._id") < F.col("r._id")])
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("nb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (exact over normalized vectors).
# ---------------------------------------------------------------------------

def embedding_cosine_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_probe_bits: int = 8,
    exact: bool = False,
    seed: int = 7,
) -> DataFrame:
    """Pairs with cosine >= threshold.

    Default (``exact=False``): random-hyperplane LSH sign-buckets first —
    candidates only within matching buckets, the only join shape that
    survives a 10^12-row corpus. Recall is probabilistic (two vectors at
    angle θ collide with prob (1-θ/π)^n_probe_bits); near-dup thresholds
    ~0.95 keep it high, and it rises as n_probe_bits falls.

    ``exact=True``: the quadratic self-join on only id_a < id_b — every
    candidate pair is scored. This is the ORACLE BASELINE, an explicit
    opt-in: it is a cross product with a filter, fine for <=10^5 rows per
    shard and catastrophic beyond. Defaults must be what users can run at
    scale, so quadratic is never the default (VERDICT r1 #4)."""
    if not exact and n_probe_bits <= 0:
        raise ValueError(
            "n_probe_bits must be > 0 (LSH bucketing); pass exact=True to "
            "opt in to the quadratic all-pairs path"
        )
    norm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda v: v / norm).alias("_v"),
    )
    if not exact:
        base = _with_hyperplane_bucket(base, "_v", n_probe_bits, seed)
        l, r = base.alias("l"), base.alias("r")
        on = [
            F.col("l._bucket") == F.col("r._bucket"),
            F.col("l._id") < F.col("r._id"),
        ]
    else:
        l, r = base.alias("l"), base.alias("r")
        on = [F.col("l._id") < F.col("r._id")]
    dot = F.aggregate(
        F.zip_with(F.col("l._v"), F.col("r._v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        l.join(r, on=on)
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            dot.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _with_hyperplane_bucket(df: DataFrame, vec_col: str, n_bits: int, seed: int) -> DataFrame:
    """Sign-bucket from n_bits random hyperplanes, evaluated natively:
    bucket = sum over bits of 2^i * (dot(v, h_i) > 0)."""
    sample_row = df.select(F.size(vec_col).alias("d")).first()
    dim = sample_row["d"]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_bits):
        arr = F.array(*[F.lit(float(v)) for v in planes[i]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return df.withColumn("_bucket", bucket)


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    threshold: float = 0.95,
    iters: int = 3,
    seed: int = 42,
    max_iter: int = 50,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column
    (Abbas et al. 2023, arXiv:2303.09540 — public method): k-means
    cluster BLOCKING -> exact cosine pairs WITHIN each cluster ->
    connected components over the near-dup graph -> keep the min-id
    representative per semantic group.

    Returns ``(id_col, list_id, keep_id, is_kept)`` for every input
    row; downstream filters on ``is_kept`` to obtain the deduplicated
    corpus, or joins on ``keep_id`` to map duplicates to their
    representative.

    Scale shape: the only join is an equi-join on ``list_id`` (cluster
    blocking — per-cluster work is quadratic in the CLUSTER size
    ~n/n_centroids, never in the corpus; on 10^12 rows n_centroids
    scales up so clusters stay bounded), and the component pass runs
    pointer-jumping over the near-dup pair list only. Pairs whose
    members land in different clusters are not candidates — the
    documented SemDeDup trade-off (boundary near-dups are missed with
    probability falling as the duplicate distance shrinks); raise
    n_centroids for speed, lower it for recall.
    """
    from tilegrab_spark.operators.components import connected_components
    from tilegrab_spark.operators.similarity import assign_lists, train_centroids

    cents = train_centroids(
        df, n_centroids=n_centroids, iters=iters, seed=seed, vec_col=vec_col
    )
    wl = assign_lists(df, cents, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("_id"), "list_id", F.col(vec_col).alias("_raw")
    )
    norm = F.sqrt(F.aggregate("_raw", F.lit(0.0), lambda acc, v: acc + v * v))
    base = wl.select("_id", "list_id", F.transform("_raw", lambda v: v / norm).alias("_v"))
    l, r = base.alias("l"), base.alias("r")
    dot = F.aggregate(
        F.zip_with(F.col("l._v"), F.col("r._v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.list_id") == F.col("r.list_id"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            dot.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs, max_iter=max_iter).select(
        F.col("node").alias("_id"), F.col("component").alias("keep_id")
    )
    out = base.select("_id", "list_id").join(comp, "_id", "left")
    return out.select(
        F.col("_id").alias(id_col),
        "list_id",
        F.coalesce(F.col("keep_id"), F.col("_id")).alias("keep_id"),
        (F.coalesce(F.col("keep_id"), F.col("_id")) == F.col("_id")).alias("is_kept"),
    )
