"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting. Everything that
can be a native expression is one (whole-stage codegen); only language-ID
scoring (a table lookup per character n-gram) uses an Arrow UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Token counting (whitespace + a BPE-ish regex) — pure Catalyst.
# ---------------------------------------------------------------------------

# word pieces, numbers, or single non-space symbols (GPT-2-ish shape)
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_RE), 0))
    return df.withColumn(
        "ws_tokens", F.when(F.length(F.trim(t)) == 0, 0).otherwise(ws)
    ).withColumn("bpe_tokens", bpe)


# ---------------------------------------------------------------------------
# Quality scoring — pure Catalyst.
# ---------------------------------------------------------------------------

STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with for on as at by".split()
)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """length / punctuation-ratio / stopword-ratio / mean-word-length
    heuristics composed into a [0,1] quality score (C4/Gopher-style
    filters, expressed natively)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(F.lower(F.trim(t)), r"\s+")
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(toks))
    n_punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?\"']", ""))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_hit = F.when(n_tokens > 0, n_stop).otherwise(0)
    mean_wlen = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(0.0)
    score = (
        F.when(n_tokens >= 5, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_wlen >= 3) & (mean_wlen <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_hit >= 1, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("n_stopwords", stop_hit)
        .withColumn("mean_word_len", mean_wlen)
        .withColumn("quality", score)
    )


# ---------------------------------------------------------------------------
# Language ID — character-n-gram profiles, Arrow UDF scoring.
# ---------------------------------------------------------------------------

# Tiny trigram/charclass profiles for a 5-language heuristic. Built from
# public orthography facts (characteristic letters/digraphs), not corpora.
_LANG_MARKERS = {
    "en": ["the ", " and ", "ing ", " of ", "tion"],
    "es": ["ción", " el ", " de la ", "¿", "ñ", " los "],
    "de": ["der ", " und ", "sch", "ß", " die ", "ung "],
    "fr": [" le ", " les ", "é", "è", " est ", "aux "],
    "zh": [],  # CJK handled by unicode-range ratio
}


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK unicode-range ratio decides zh;
    otherwise argmax of per-language marker-ngram hit rates (en fallback).
    Vectorized pandas str ops — one Arrow batch, no per-row Python loop
    beyond pandas' own."""

    @F.pandas_udf("string")
    def lang_id(texts: pd.Series) -> pd.Series:
        s = texts.fillna("")
        low = s.str.lower()
        n = s.str.len().clip(lower=1)
        cjk = s.str.count(r"[一-鿿]") / n
        scores = {}
        for lang, marks in _LANG_MARKERS.items():
            if not marks:
                continue
            acc = None
            for m in marks:
                c = low.str.count(m if m not in ".?¿" else "\\" + m)
                acc = c if acc is None else acc + c
            scores[lang] = acc / n
        sc = pd.DataFrame(scores)
        best = sc.idxmax(axis=1).where(sc.max(axis=1) > 0, "en")
        return best.where(cjk < 0.2, "zh")

    return df.withColumn("lang_pred", lang_id(F.col(text_col)))


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters) — duplicate-line
# fraction natively; top-word fraction as a relational explode+agg (one
# shuffle on (doc, word), map-side combinable — the 100 TB shape).
# ---------------------------------------------------------------------------

def with_repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition metrics used by C4/Gopher-style corpus filters:

    - ``n_lines`` / ``dup_line_frac``: fraction of nonempty lines that
      are duplicates of an earlier line (pure Catalyst: split +
      array_distinct, no shuffle)
    - ``top_word_frac``: occurrences of the most frequent word / total
      words (relational: explode → two-level aggregate → join back;
      ties don't matter because only the max count is kept)

    Boilerplate-heavy or looping documents (nav menus, scraped tables,
    decoding glitches) score high and get dropped upstream of dedup.
    """
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    dup_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
    ).otherwise(0.0)
    base = df.withColumn("n_lines", n_lines).withColumn("dup_line_frac", dup_frac)

    toks = F.filter(
        F.split(F.lower(F.trim(t)), r"\s+"), lambda w: F.length(w) > 0
    )
    words = df.select(F.col(id_col).alias("_id"), F.explode(toks).alias("w"))
    per_word = words.groupBy("_id", "w").agg(F.count("*").alias("c"))
    top = per_word.groupBy("_id").agg(
        F.max("c").alias("_top_c"), F.sum("c").alias("_total_c")
    )
    return (
        base.join(top, base[id_col] == top._id, "left")
        .withColumn(
            "top_word_frac",
            F.coalesce(F.col("_top_c") / F.col("_total_c"), F.lit(0.0)),
        )
        .drop("_id", "_top_c", "_total_c")
    )


# ---------------------------------------------------------------------------
# Text cleaning + PII scrubbing — pure Catalyst regexp passes. Patterns
# stay in the Java-regex ∩ RE2 common subset so the DuckDB oracle can
# re-derive them verbatim (no lookaround, no backrefs).
# ---------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# international-ish phone shapes: +1-555-123-4567, (555) 123 4567, 5551234567.
# The optional prefix group must START with '+', '(' or a digit — bare
# separators (spaces, dashes) can't lead the match, so surrounding
# whitespace is never swallowed into the <PHONE> rewrite.
PHONE_RE = (
    r"(?:\+?\(?[0-9]{1,3}[-. ()]{0,3}|\()?[0-9]{3}[-. ()]{0,2}[0-9]{3}[-. ]?[0-9]{4}"
)
# digit-boundary wrapper: RE2 has no lookaround, so the phone core is
# bracketed by `(^|[^0-9]) ... ([^0-9]|$)` capture groups restored in the
# replacement. A digit run LONGER than a phone (timestamps like
# 20260817123456, order ids, hashes) can never match: every 10-13 digit
# window inside it has a digit on at least one side.
PHONE_BOUNDED_RE = r"(^|[^0-9])(" + PHONE_RE + r")([^0-9]|$)"
_CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


def with_clean_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``clean_text``: control characters stripped, runs of spaces/tabs
    collapsed to one space, outer whitespace trimmed. Newlines survive
    (document structure is a feature for line-dedup)."""
    t = F.col(text_col)
    cleaned = F.trim(
        F.regexp_replace(F.regexp_replace(t, _CONTROL_RE, ""), "[ \\t]+", " ")
    )
    return df.withColumn("clean_text", cleaned)


def with_pii_scrubbed(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``scrubbed`` + match counts: emails → <EMAIL>, phone-shaped
    numbers → <PHONE> (training-corpus hygiene pass; counts let a
    downstream gate drop documents that are mostly PII).

    The phone pass runs TWICE: the trailing boundary group CONSUMES the
    separator character, so of two phones separated by a single
    non-digit only the first matches in one pass (the second would leak
    into the corpus verbatim). A pass-1 match leaves each survivor
    bounded by the '>' of its neighbour's replacement, so survivors are
    isolated between matches and the second pass catches every one —
    two passes provably converge, lookaround-free (the RE2∩Java subset
    keeps the DuckDB oracle verbatim)."""
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    scrubbed1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phone1 = F.size(F.regexp_extract_all(scrubbed1, F.lit(PHONE_BOUNDED_RE), 0))
    scrubbed2 = F.regexp_replace(scrubbed1, PHONE_BOUNDED_RE, r"$1<PHONE>$3")
    n_phone2 = F.size(F.regexp_extract_all(scrubbed2, F.lit(PHONE_BOUNDED_RE), 0))
    scrubbed3 = F.regexp_replace(scrubbed2, PHONE_BOUNDED_RE, r"$1<PHONE>$3")
    return (
        df.withColumn("n_emails", n_email)
        .withColumn("n_phones", n_phone1 + n_phone2)
        .withColumn("scrubbed", scrubbed3)
    )


# ---------------------------------------------------------------------------
# Document fingerprinting — rolling (Rabin-Karp) hash winnowing.
# ---------------------------------------------------------------------------

_RK_B = 1000003
_RK_B_INV = pow(_RK_B, -1, 1 << 64)  # B odd => invertible mod 2^64
_RK_POW_CACHE: dict = {}


# cache ceiling: 2^20 entries = 8 MiB per array per Python worker. One
# outlier-length document must not pin worker memory forever — beyond the
# cap, powers are computed transiently for that document only.
_RK_POW_CACHE_MAX = 1 << 20


def _rk_pow_arrays(m: int) -> tuple:
    with np.errstate(over="ignore"):
        bp = np.ones(m, dtype=np.uint64)
        bp[1:] = np.uint64(_RK_B)
        bp = np.cumprod(bp)
        bi = np.ones(m, dtype=np.uint64)
        bi[1:] = np.uint64(_RK_B_INV)
        bi = np.cumprod(bi)
    return bp, bi


def _rk_powers(n: int) -> tuple:
    """(B^k mod 2^64, B^-k mod 2^64) for k < n: grown geometrically and
    cached per process up to _RK_POW_CACHE_MAX entries; longer requests
    (outlier documents) get transient arrays that are NOT retained."""
    if n > _RK_POW_CACHE_MAX:
        return _rk_pow_arrays(n)
    cur = _RK_POW_CACHE.get("arrs")
    if cur is None or len(cur[0]) < n:
        m = min(
            _RK_POW_CACHE_MAX,
            max(n, 4096, 0 if cur is None else 2 * len(cur[0])),
        )
        cur = _rk_pow_arrays(m)
        _RK_POW_CACHE["arrs"] = cur
    return cur

def with_fingerprint(
    df: DataFrame, text_col: str = "text", *, window: int = 16, keep: int = 8
) -> DataFrame:
    """Winnowed rolling-hash fingerprint: Rabin-Karp over bytes mod 2^64,
    keep the ``keep`` smallest window hashes (set-similarity-preserving
    doc signature).

    Fully vectorized: B=1000003 is odd, hence invertible mod 2^64, so
    every window hash h_i = sum_j b[i+j]·B^(w-1-j) factors as
    B^(i+w-1)·(S_{i+w} − S_i) with S_n = Σ_{j<n} b[j]·B^(−j) — one
    cumsum + one elementwise multiply per document (uint64 wraparound IS
    the mod-2^64 arithmetic), instead of the per-byte interpreted rolling
    loop. Identical output to the scalar recurrence; the DuckDB HUGEINT
    oracle (doc_fingerprint) pins the exact hash values."""
    @F.pandas_udf("array<long>")
    def fingerprint(texts: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for t in texts:
                if not t:
                    out.append([])
                    continue
                b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                n = len(b)
                bpow, bipow = _rk_powers(n + 1)
                S = np.zeros(n + 1, dtype=np.uint64)
                np.cumsum(b * bipow[:n], out=S[1:])
                if n < window:
                    h = np.array([S[n] * bpow[n - 1]], dtype=np.uint64)
                else:
                    h = (S[window:] - S[: n - window + 1]) * bpow[window - 1 : n]
                sel = np.unique(h)[:keep]  # unique sorts (unsigned order)
                out.append(sel.astype(np.int64).tolist())
        return pd.Series(out)

    return df.withColumn("fingerprint", fingerprint(F.col(text_col)))
