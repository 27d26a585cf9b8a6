"""URL / domain curation operators (RefinedWeb-style source hygiene).

Web-corpus curation keys everything on the URL: canonicalize it so
trivially-different addresses dedupe together, extract the registered
domain for per-source accounting, block bad domains, and cap how many
documents any single domain contributes (the anti-SEO-farm rule —
RefinedWeb, Penedo et al. 2023, caps per-domain document share before
content dedup). Everything here is PURE CATALYST: ``parse_url`` +
regexp projections for the parsing, one map-side-combinable groupBy for
the stats, and the engine's deterministic hash-order top-n
(sampling.py) for the cap — so the whole module is a filter/projection
pipeline Catalyst can push around freely.

Registered-domain note: the real rule needs the Public Suffix List
(not available in-sandbox, and a moving target). ``registered_domain``
implements the documented approximation: strip the host to its last
two labels, or last three when the second-to-last is a well-known
multi-part suffix (``co.uk``-class) — exact for the common web, and
deterministic. Callers with a PSL can substitute their own column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tilegrab_spark.operators.sampling import stratified_topn

__all__ = [
    "canonicalize_url",
    "with_url_parts",
    "registered_domain",
    "domain_stats",
    "filter_blocked_domains",
    "cap_per_domain",
]

# second-level labels that form a multi-part public suffix with a ccTLD
# (the documented approximation of the PSL's dominant entries)
_MULTI_SLD = ("co", "com", "net", "org", "gov", "edu", "ac", "mil")

# query params that never change content identity (tracking)
_TRACKING_RE = (
    r"(?:utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|ref_src)=[^&#]*"
)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form for URL-keyed dedup: lowercase scheme+host, strip
    the fragment, strip tracking query params (utm_* class), strip a
    trailing ``?``/``&`` left behind, drop default ports, drop a
    trailing slash on the path. Pure Catalyst regexps (Java regex, no
    UDF)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")                       # fragment
    # lowercase scheme://host (authority) only
    scheme_host = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.when(scheme_host == "", u).otherwise(F.concat(scheme_host, rest))
    u = F.regexp_replace(u, r"(?i)^(https?://[^/?#]*):(?:80|443)(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, _TRACKING_RE, "")                  # tracking params
    u = F.regexp_replace(u, r"\?&+", "?")                      # "?&q" -> "?q"
    u = F.regexp_replace(u, r"&&+", "&")                       # "a&&b" -> "a&b"
    u = F.regexp_replace(u, r"[?&]+$", "")                     # dangling ? / &
    u = F.regexp_replace(u, r"(://[^/?#]+[^?#]*?)/+(?=\?|$)", r"$1")  # trailing /
    return u


def registered_domain(host: Column | str) -> Column:
    """Approximate registered domain of a host column (see module
    docstring): www-stripped, last two labels, or three for
    ``co.uk``-class suffixes. NULL host -> NULL."""
    h = F.col(host) if isinstance(host, str) else host
    h = F.lower(F.regexp_replace(h, r"^www\.", ""))
    parts = F.split(h, r"\.")
    n = F.size(parts)
    sld = F.element_at(parts, -2)
    tld = F.element_at(parts, -1)
    take3 = (
        (n >= 3)
        & sld.isin(*_MULTI_SLD)
        & (F.length(tld) == 2)
    )
    return (
        F.when(h.isNull() | (n < 2), h)
        .when(take3, F.concat_ws(".", F.element_at(parts, -3), sld, tld))
        .otherwise(F.concat_ws(".", sld, tld))
    )


def with_url_parts(
    df: DataFrame, *, url_col: str = "url", canonical: bool = True
) -> DataFrame:
    """Add ``canon_url`` (when ``canonical``), ``host``, ``domain``
    (registered domain), ``path`` and ``path_depth`` — all pure
    Catalyst (``parse_url`` + regexps)."""
    out = df
    src = F.col(url_col)
    if canonical:
        out = out.withColumn("canon_url", canonicalize_url(src))
        src = F.col("canon_url")
    out = out.withColumn("host", F.parse_url(src, F.lit("HOST")))
    out = out.withColumn("domain", registered_domain(F.col("host")))
    out = out.withColumn("path", F.parse_url(src, F.lit("PATH")))
    return out.withColumn(
        "path_depth",
        F.size(F.filter(F.split(F.coalesce(F.col("path"), F.lit("")), "/"),
                        lambda s: s != "")),
    )


def domain_stats(
    df: DataFrame, *, domain_col: str = "domain", token_col: str | None = None
) -> DataFrame:
    """Per-domain accounting: document count (+ token sum when
    ``token_col`` given) and corpus share. One map-side-combinable
    aggregation; the share divides by a broadcast one-row total."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col).cast("long")).alias("n_tokens"))
    per = df.groupBy(domain_col).agg(*aggs)
    total = per.agg(F.sum("n_docs").alias("_total"))
    return per.crossJoin(F.broadcast(total)).withColumn(
        "doc_share", F.col("n_docs") / F.col("_total")
    ).drop("_total")


def filter_blocked_domains(
    df: DataFrame,
    blocked,
    *,
    domain_col: str = "domain",
    include_subdomains: bool = True,
) -> DataFrame:
    """Drop rows whose domain is on the blocklist.

    ``blocked`` is a driver-side iterable (blocklists are small) — the
    filter compiles to an ``isin`` literal (or a broadcast join via
    ``isin`` semantics), map-side, no shuffle. ``include_subdomains``
    also drops ``*.blocked.tld`` when ``domain_col`` holds full hosts."""
    blocked = sorted({b.strip().lower() for b in blocked if b and b.strip()})
    if not blocked:
        return df
    d = F.lower(F.col(domain_col))
    cond = d.isin(*blocked)
    if include_subdomains:
        for b in blocked:
            cond = cond | d.endswith("." + b)
    return df.filter(~F.coalesce(cond, F.lit(False)))


def cap_per_domain(
    df: DataFrame,
    *,
    max_docs: int,
    id_col: str,
    domain_col: str = "domain",
    salt: str = "",
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """Keep at most ``max_docs`` documents per domain, chosen
    deterministically by the engine's md5 hash order (partition- and
    arrival-order-invariant: re-running the pipeline keeps the SAME
    documents). Delegates to sampling.stratified_topn — including its
    ``prefilter_fraction`` escape hatch for mega-domains, the skew
    axis of this operator."""
    return stratified_topn(
        df,
        id_col=id_col,
        stratum_col=domain_col,
        n=int(max_docs),
        salt=salt,
        prefilter_fraction=prefilter_fraction,
    ).drop("sample_rank")
