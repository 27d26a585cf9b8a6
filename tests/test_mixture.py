"""Token-budget mixture sampling: water-filling rate solver (pure
driver arithmetic, tested exhaustively) + the deterministic map-side
row filter (tested for exact equivalence with stratified_sample and
statistical budget adherence)."""

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.sampling import (
    mixture_rates,
    sample_mixture,
    stratified_sample,
)

# ---------------------------------------------------------------------------
# mixture_rates (driver water-filling)
# ---------------------------------------------------------------------------


def test_rates_proportional_when_nothing_caps():
    rates = mixture_rates(
        {"en": 1000, "de": 1000}, {"en": 3.0, "de": 1.0}, budget_tokens=400
    )
    assert rates == {"en": 0.3, "de": 0.1}


def test_capped_group_redistributes_to_the_rest():
    # de can only supply 100 of its 300-token share; the 200-token
    # shortfall flows to en (the only other weighted group).
    rates = mixture_rates(
        {"en": 10_000, "de": 100}, {"en": 1.0, "de": 1.0}, budget_tokens=600
    )
    assert rates["de"] == 1.0
    assert rates["en"] == pytest.approx(500 / 10_000)


def test_cascaded_caps():
    # both small groups saturate across successive rounds; the big one
    # absorbs everything left.
    rates = mixture_rates(
        {"a": 10, "b": 50, "c": 100_000},
        {"a": 1.0, "b": 1.0, "c": 1.0},
        budget_tokens=3_000,
    )
    assert rates["a"] == 1.0 and rates["b"] == 1.0
    assert rates["c"] == pytest.approx(2_940 / 100_000)


def test_budget_exceeds_supply_caps_everything():
    rates = mixture_rates({"a": 5, "b": 7}, {"a": 1.0, "b": 2.0}, budget_tokens=10**9)
    assert rates == {"a": 1.0, "b": 1.0}


def test_zero_weight_and_zero_budget():
    rates = mixture_rates({"a": 100, "b": 100}, {"a": 1.0}, budget_tokens=50)
    assert rates == {"a": 0.5, "b": 0.0}
    assert mixture_rates({"a": 100}, {"a": 1.0}, budget_tokens=0) == {"a": 0.0}


def test_expected_tokens_hit_budget_exactly_in_expectation():
    toks = {"en": 9_000, "fr": 4_000, "code": 50}
    w = {"en": 2.0, "fr": 1.0, "code": 5.0}
    budget = 3_000
    rates = mixture_rates(toks, w, budget)
    assert sum(rates[g] * toks[g] for g in toks) == pytest.approx(budget)


def test_rate_validation():
    with pytest.raises(ValueError):
        mixture_rates({"a": 10}, {"a": 1.0}, budget_tokens=-1)
    with pytest.raises(ValueError):
        mixture_rates({"a": 10}, {"a": -0.5}, budget_tokens=10)


# ---------------------------------------------------------------------------
# sample_mixture (distributed filter)
# ---------------------------------------------------------------------------


def _corpus(spark, n=4000):
    rows = [
        (
            f"doc{i}",
            ("en", "de", "code")[i % 3] if i % 11 else "unweighted",
            40 + (i * 13) % 50,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, lang string, n_tokens int")


def test_mixture_equals_stratified_sample_at_solver_rates(spark):
    """The distributed path is EXACTLY stratified_sample at the solver's
    rates — same hash, same thresholds, row-for-row."""
    df = _corpus(spark)
    w = {"en": 2.0, "de": 1.0, "code": 1.0}
    budget = 60_000
    got = sorted(
        r[0]
        for r in sample_mixture(
            df,
            id_col="doc_id",
            group_col="lang",
            token_col="n_tokens",
            weights=w,
            budget_tokens=budget,
            salt="mx",
        ).collect()
    )
    totals = {
        r[0]: r[1]
        for r in df.groupBy("lang").agg(F.sum("n_tokens")).collect()
    }
    rates = mixture_rates(totals, w, budget)
    want = sorted(
        r[0]
        for r in stratified_sample(
            df,
            id_col="doc_id",
            fractions={g: r for g, r in rates.items() if r > 0},
            stratum_col="lang",
            default_fraction=0.0,
            salt="mx",
        ).collect()
    )
    assert got == want and len(got) > 0


def test_mixture_budget_and_proportions(spark):
    df = _corpus(spark, n=6000)
    w = {"en": 3.0, "de": 1.0}
    budget = 80_000
    out = sample_mixture(
        df,
        id_col="doc_id",
        group_col="lang",
        token_col="n_tokens",
        weights=w,
        budget_tokens=budget,
    )
    by_lang = {
        r[0]: r[1] for r in out.groupBy("lang").agg(F.sum("n_tokens")).collect()
    }
    assert set(by_lang) <= {"en", "de"}  # unweighted groups dropped
    got_total = sum(by_lang.values())
    assert got_total == pytest.approx(budget, rel=0.10)
    assert by_lang["en"] / by_lang["de"] == pytest.approx(3.0, rel=0.20)


def test_mixture_deterministic_across_runs_and_partitioning(spark):
    df = _corpus(spark)
    kw = dict(
        id_col="doc_id",
        group_col="lang",
        token_col="n_tokens",
        weights={"en": 1.0, "code": 2.0},
        budget_tokens=30_000,
    )
    a = sorted(r[0] for r in sample_mixture(df, **kw).collect())
    b = sorted(r[0] for r in sample_mixture(df.repartition(13), **kw).collect())
    assert a == b and len(a) > 0


def test_mixture_no_weights_returns_empty(spark):
    df = _corpus(spark, n=100)
    out = sample_mixture(
        df,
        id_col="doc_id",
        group_col="lang",
        token_col="n_tokens",
        weights={"xx": 1.0},
        budget_tokens=1000,
    )
    assert out.count() == 0
