"""URL/domain curation suite — golden canonicalization pairs, domain
extraction, stats, blocklist, deterministic per-domain caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators.urls import (
    canonicalize_url,
    cap_per_domain,
    domain_stats,
    filter_blocked_domains,
    registered_domain,
    with_url_parts,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonicalize_url("url")).collect()]


class TestCanonicalize:
    def test_golden_pairs(self, spark):
        pairs = [
            # scheme+host lowercased, path case preserved
            ("HTTP://Example.COM/Path", "http://example.com/Path"),
            # fragment stripped
            ("https://a.com/x#section-2", "https://a.com/x"),
            # default ports dropped
            ("http://a.com:80/x", "http://a.com/x"),
            ("https://a.com:443/x", "https://a.com/x"),
            # non-default port kept
            ("http://a.com:8080/x", "http://a.com:8080/x"),
            # tracking params stripped, real ones kept
            ("https://a.com/p?utm_source=tw&q=1", "https://a.com/p?q=1"),
            ("https://a.com/p?q=1&utm_medium=email", "https://a.com/p?q=1"),
            ("https://a.com/p?utm_source=x", "https://a.com/p"),
            ("https://a.com/p?gclid=abc&fbclid=def", "https://a.com/p"),
            # trailing slash dropped (path and host forms)
            ("https://a.com/path/", "https://a.com/path"),
            ("https://a.com/path/?q=1", "https://a.com/path?q=1"),
            # everything at once
            (
                "HTTPS://WWW.Site.Co.UK:443/A/B/?utm_campaign=z&id=7#top",
                "https://www.site.co.uk/A/B?id=7",
            ),
        ]
        got = _canon(spark, [p[0] for p in pairs])
        for (src, want), g in zip(pairs, got):
            assert g == want, f"{src!r}: {g!r} != {want!r}"

    def test_idempotent(self, spark):
        urls = [
            "HTTP://Example.COM:80/Path/?utm_source=x&q=1#f",
            "https://a.com/p?q=1",
        ]
        once = _canon(spark, urls)
        twice = _canon(spark, once)
        assert once == twice


class TestDomain:
    def test_registered_domain_cases(self, spark):
        cases = [
            ("www.example.com", "example.com"),
            ("blog.example.com", "example.com"),
            ("a.b.site.co.uk", "site.co.uk"),
            ("site.co.uk", "site.co.uk"),
            ("gov.uk", "gov.uk"),          # 2 labels stay as-is
            ("localhost", "localhost"),
            ("EXAMPLE.ORG", "example.org"),
            (None, None),
        ]
        df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
        got = [r[0] for r in df.select(registered_domain("host")).collect()]
        assert got == [w for _, w in cases]

    def test_with_url_parts(self, spark):
        df = spark.createDataFrame(
            [("HTTPS://News.Site.co.uk/world/2024/story.html?ref=rss",)],
            "url string",
        )
        r = with_url_parts(df).first()
        assert r["host"] == "news.site.co.uk"
        assert r["domain"] == "site.co.uk"
        assert r["path"] == "/world/2024/story.html"
        assert r["path_depth"] == 3
        assert r["canon_url"] == "https://news.site.co.uk/world/2024/story.html"


class TestStatsAndBlock:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = []
        for i in range(60):
            dom = ["seo-farm.com", "good.org", "blog.example.com"][i % 3]
            rows.append((i, f"https://{dom}/p{i}", 10 + i))
        return spark.createDataFrame(rows, "doc_id long, url string, n_tok long")

    def test_domain_stats(self, spark, docs):
        parts = with_url_parts(docs)
        stats = {r["domain"]: r for r in domain_stats(parts, token_col="n_tok").collect()}
        assert stats["seo-farm.com"]["n_docs"] == 20
        assert sum(r["doc_share"] for r in stats.values()) == pytest.approx(1.0)
        assert stats["example.com"]["n_tokens"] == sum(
            10 + i for i in range(60) if i % 3 == 2
        )

    def test_blocklist_with_subdomains(self, spark, docs):
        parts = with_url_parts(docs)
        kept = filter_blocked_domains(
            parts, ["SEO-FARM.com"], domain_col="host"
        )
        assert kept.count() == 40
        # subdomain form blocked via host match
        kept2 = filter_blocked_domains(parts, ["example.com"], domain_col="host")
        assert kept2.count() == 40  # blog.example.com dropped
        kept3 = filter_blocked_domains(
            parts, ["example.com"], domain_col="host", include_subdomains=False
        )
        assert kept3.count() == 60  # host is blog.example.com, not exact

    def test_cap_per_domain_exact_and_deterministic(self, spark, docs):
        parts = with_url_parts(docs)
        capped = cap_per_domain(parts, max_docs=7, id_col="doc_id")
        per = capped.groupBy("domain").count().collect()
        assert all(r["count"] == 7 for r in per)
        ids_a = sorted(r["doc_id"] for r in capped.collect())
        ids_b = sorted(
            r["doc_id"]
            for r in cap_per_domain(
                parts.repartition(13), max_docs=7, id_col="doc_id"
            ).collect()
        )
        assert ids_a == ids_b
        # small domains survive whole
        few = cap_per_domain(parts, max_docs=1000, id_col="doc_id")
        assert few.count() == 60
