"""Deterministic stratified sampling — corpus curation at fixed rates.

Training-data pipelines sample per stratum (language, quality bucket,
source) with two non-negotiables at 100 TB: the decision must be a PURE
FUNCTION of the row (re-runs, resumes and incremental batches pick the
same rows — no RNG state, no seed-per-partition drift), and rate
sampling must be a map-side filter (no shuffle at all).

Both operators key off a 60-bit uniform hash of the row id:
``md5(id || salt)`` low 15 hex digits — the same md5 contract as
``dedup._stable_hash64``, chosen so an independent engine can re-derive
every decision (DuckDB: ``('0x' || substr(md5(x),1,15))::BIGINT``; the
contract oracle does exactly that). Changing ``salt`` draws an
independent sample; keeping it pins the sample forever.

- ``stratified_sample``: keep a row iff ``hash < fraction * 2^60`` with a
  per-stratum fraction — an integer compare against an inlined literal
  map, pure Catalyst, zero shuffle, streaming-safe (the filter works
  identically in foreachBatch).
- ``stratified_topn``: EXACT quota per stratum — the top-n rows by hash
  order. One shuffle on the stratum key; for mega-strata the optional
  ``prefilter_fraction`` bounds the window input first (rate filter ≫
  quota), keeping the per-stratum sort small.

The reference has no analogue; part of the training-data operator suite
from the driver brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "sample_hash",
    "stratified_sample",
    "stratified_topn",
    "mixture_rates",
    "sample_mixture",
    "weighted_sample_key",
    "weighted_sample",
]

_HASH_BITS = 60
_HASH_SPACE = 1 << _HASH_BITS


def sample_hash(id_col: str | Column, salt: str = "") -> Column:
    """60-bit uniform deterministic hash of ``id || salt`` (long). The
    engine-independent md5 contract — see module docstring."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    payload = F.concat(c.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def _thresholds(fractions: float | dict) -> Column | dict:
    def thr(f: float) -> int:
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction must be in [0, 1], got {f}")
        return int(f * _HASH_SPACE)

    if isinstance(fractions, dict):
        return {k: thr(v) for k, v in fractions.items()}
    return thr(fractions)


def stratified_sample(
    df: DataFrame,
    *,
    id_col: str,
    fractions: float | dict,
    stratum_col: str | None = None,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic rate sample: keep each row iff its hash falls under
    its stratum's threshold. ``fractions`` is a single float (uniform
    sample; ``stratum_col`` unused) or a ``{stratum_value: fraction}``
    dict with ``default_fraction`` for unlisted strata. Pure map-side
    filter — no shuffle, no RNG."""
    h = sample_hash(id_col, salt)
    t = _thresholds(fractions)
    if isinstance(t, dict):
        if stratum_col is None:
            raise ValueError("stratum_col is required with per-stratum fractions")
        pairs: list = []
        for k, v in sorted(t.items()):
            pairs += [F.lit(k), F.lit(v)]
        thr_map = F.create_map(*pairs)
        thr = F.coalesce(
            thr_map[F.col(stratum_col)],
            F.lit(int(_thresholds(default_fraction))),
        )
    else:
        thr = F.lit(t)
    return df.filter(h < thr)


def stratified_topn(
    df: DataFrame,
    *,
    id_col: str,
    stratum_col: str,
    n: int,
    salt: str = "",
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """EXACT ``n`` rows per stratum (fewer if the stratum is smaller),
    chosen deterministically by hash order (ties impossible: the hash
    order is refined by the unique id). Adds a ``sample_rank`` column
    (1-based within stratum).

    Scale note: the window shuffles on ``stratum_col`` and sorts each
    stratum. A stratum with 10^10 rows makes one giant partition —
    ``prefilter_fraction`` applies the rate filter FIRST (use a rate
    that keeps ≫ n expected rows, e.g. 10 * n / est_stratum_size); the
    result is still exact top-n BY HASH ORDER of the filtered space,
    which equals global hash top-n whenever the prefilter keeps ≥ n rows
    of the stratum (the kept set is exactly the hash-smallest rows iff
    the threshold cut is above the n-th hash — assert with a count if
    the estimate is rough)."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    d = df
    if prefilter_fraction is not None:
        d = stratified_sample(
            d, id_col=id_col, fractions=prefilter_fraction, salt=salt
        )
    h = sample_hash(id_col, salt)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        d.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


def weighted_sample_key(
    id_col: str | Column, weight_col: str | Column, salt: str = ""
) -> Column:
    """The Efraimidis–Spirtas exponential race key ``-ln(u) / w`` with
    ``u = (hash + 1) / 2^60`` drawn deterministically from the md5
    contract hash of the id (double, smaller = more likely sampled).

    The k rows with the SMALLEST keys are a weighted sample without
    replacement: P(row first) = w_i / Σw, then recursively over the
    rest — exactly the sequential weighted draw, but order-free and a
    pure function of (id, weight, salt). Engine-independent: DuckDB
    re-derives it as ``-ln((hash + 1) / 2^60) / w`` over the same md5
    hash (the contract oracle in tests does exactly that)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (sample_hash(id_col, salt) + F.lit(1)).cast("double") / F.lit(
        float(_HASH_SPACE)
    )
    return -F.log(u) / w.cast("double")


def weighted_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: exactly ``k``
    rows (fewer if the input is smaller), inclusion odds proportional to
    ``weight_col`` (Efraimidis–Spirtas A-ES, VLDB/IPL 2006 — the
    standard one-pass weighted reservoir scheme, here as a relational
    bottom-k instead of a sequential reservoir). The quality-weighted
    corpus-selection step (sample by classifier margin, perplexity
    weight, DSIR importance weight) that plain rate sampling can't
    express.

    Rows with NULL or non-positive weight are dropped (zero weight =
    never sampled; the race key is undefined there). Adds
    ``sample_rank`` (1-based draw order — rank 1 is the first
    sequential draw, so any prefix of the output is itself a valid
    weighted sample of size < k).

    Scale shape: global form (``stratum_col=None``) plans as
    TakeOrderedAndProject — each task keeps its local top-k and the
    driver merges P×k rows, no global sort, no single-task window.
    Per-stratum form ranks inside a window partitioned by the stratum;
    the ``row_number <= k`` filter pushes down as WindowGroupLimit, so
    hot strata are bounded map-side before the exchange (same plan as
    :func:`stratified_topn`). Determinism: the key is a pure function
    of (id, weight, salt) and ties are impossible for distinct ids
    (continuous keys, order refined by id) — re-runs, resumes and
    re-partitionings pick the identical row set.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key = weighted_sample_key(id_col, weight_col, salt)
    d = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    if stratum_col is None:
        out = (
            d.withColumn("_wkey", key)
            .orderBy(F.col("_wkey").asc(), F.col(id_col).asc())
            .limit(k)
        )
        w = Window.orderBy(F.col("_wkey").asc(), F.col(id_col).asc())
        return (
            out.withColumn("sample_rank", F.row_number().over(w)).drop("_wkey")
        )
    w = Window.partitionBy(stratum_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        d.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def mixture_rates(
    group_tokens: dict,
    weights: dict,
    budget_tokens: int,
) -> dict:
    """Water-filling rate solver for token-budget data mixing.

    Given per-group available tokens, target mixture ``weights`` and a
    total ``budget_tokens``, return ``{group: rate}`` with
    ``rate in [0, 1]`` such that expected sampled tokens per group are
    proportional to the weights — except where a group is EXHAUSTED
    (rate capped at 1.0); its unmet share is redistributed across the
    remaining groups in weight proportion, iterated to fixpoint (the
    classic water-filling loop; terminates in <= len(groups) rounds
    because each round caps at least one new group or stops).

    Pure driver arithmetic over one tiny dict (groups are languages /
    domains / sources — thousands at most, never data-sized): the
    expensive part of mixing stays map-side in :func:`sample_mixture`.
    Groups with no weight entry get weight 0 (rate 0.0). A budget at or
    above the weighted-reachable total simply caps every weighted group
    at 1.0 (you cannot sample tokens that do not exist).
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    bad = {g: w for g, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"weights must be >= 0, got {bad}")
    rates = {g: 0.0 for g in group_tokens}
    active = {
        g
        for g, tok in group_tokens.items()
        if weights.get(g, 0.0) > 0 and tok > 0
    }
    remaining = float(budget_tokens)
    while active and remaining > 0:
        wsum = sum(weights[g] for g in active)
        newly_capped = set()
        for g in active:
            target = remaining * weights[g] / wsum
            if target >= group_tokens[g]:
                rates[g] = 1.0
                newly_capped.add(g)
        if not newly_capped:
            for g in active:
                rates[g] = (remaining * weights[g] / wsum) / group_tokens[g]
            break
        remaining -= sum(group_tokens[g] for g in newly_capped)
        active -= newly_capped
    return rates


def sample_mixture(
    df: DataFrame,
    *,
    id_col: str,
    group_col: str,
    token_col: str,
    weights: dict,
    budget_tokens: int,
    salt: str = "",
) -> DataFrame:
    """Token-budget mixture sampling — "give me ~N tokens at these
    domain/language proportions", the data-mixing step every training
    run starts with.

    Two stages: (1) one map-side-combinable aggregation collects the
    per-group token totals to the driver (bounded: one row per group),
    and :func:`mixture_rates` water-fills the budget into per-group
    keep rates; (2) the rates are inlined as a literal map and applied
    as the same deterministic ``sample_hash`` threshold filter as
    :func:`stratified_sample` — pure map-side, no shuffle of the
    corpus, reproducible row-for-row across runs/resumes/engines.

    Expected sampled tokens ≈ ``budget_tokens`` (exact in expectation;
    variance ~ 1/sqrt(docs per group)). Rows whose group has no weight
    are dropped.
    """
    totals = {
        r[0]: int(r[1])
        for r in df.groupBy(group_col)
        .agg(F.sum(F.col(token_col).cast("long")))
        .collect()
        if r[0] is not None and r[1] is not None
    }
    rates = mixture_rates(totals, weights, budget_tokens)
    keep = {g: r for g, r in rates.items() if r > 0}
    if not keep:
        return df.filter(F.lit(False))
    return stratified_sample(
        df,
        id_col=id_col,
        fractions=keep,
        stratum_col=group_col,
        default_fraction=0.0,
        salt=salt,
    )
