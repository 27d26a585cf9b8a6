"""Text-analysis operators: token counts, quality, lang-id, fingerprints."""

import pytest
from pyspark.sql import functions as F

from tilegrab_spark.operators import text as T

SF_DIR = "/root/testdata/sf0.001"


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "hello world"), (1, "  a  b   c "), (2, ""), (3, "don't stop-me now!")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.ws_tokens, r.bpe_tokens) for r in T.with_token_counts(df).collect()}
    assert out[0] == (2, 2)
    assert out[1][0] == 3
    assert out[2] == (0, 0)
    # "don't stop-me now!" -> don ' t stop - me now !
    assert out[3][1] == 8


def test_quality_score(spark):
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog and runs away"),
            (1, "!!! ??? ... ;;; :::"),
            (2, "ok"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.with_quality_score(df).collect()}
    assert out[0].quality == 1.0
    assert out[1].quality <= 0.5
    assert out[2].quality <= 0.5
    assert out[0].n_stopwords >= 2
    assert out[1].punct_ratio > 0.5


def test_lang_id(spark):
    samples = [
        (0, "the cat and the dog are sitting on the mat", "en"),
        (1, "la ciudad de los niños está en la región", "es"),
        (2, "der Hund und die Katze schlafen in der Wohnung", "de"),
        (3, "le chat est dans les jardins près de la ville", "fr"),
        (4, "今天天气很好我们一起去公园散步吧", "zh"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in samples], "doc_id long, text string")
    out = {r.doc_id: r.lang_pred for r in T.with_lang_id(df).collect()}
    for i, _, want in samples:
        assert out[i] == want, (i, out[i], want)


def test_fingerprint_properties(spark):
    df = spark.createDataFrame(
        [
            (0, "a long enough document body for rolling hashes to exist"),
            (1, "a long enough document body for rolling hashes to exist"),
            (2, "a totally different body of text with other content here"),
            (3, "x"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: list(r.fingerprint) for r in T.with_fingerprint(df).collect()}
    assert out[0] == out[1]  # deterministic, content-derived
    assert out[0] != out[2]
    assert len(out[0]) <= 8 and len(out[0]) > 0
    assert len(out[3]) == 1  # short-text path
    assert out[4] == []


def test_on_real_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = T.with_quality_score(T.with_token_counts(docs))
    rows = out.select("doc_id", "ws_tokens", "n_tokens", "quality").collect()
    assert len(rows) == docs.count()
    for r in rows[:50]:
        assert r.ws_tokens == r.n_tokens
        assert 0.0 <= r.quality <= 1.0


def test_vectorized_fingerprint_matches_scalar_reference(spark):
    """The prefix-sum Rabin-Karp (invertible B mod 2^64) must equal the
    per-byte scalar recurrence on every window, including short docs,
    empties, and multi-byte UTF-8."""
    import numpy as np

    from tilegrab_spark.operators.text import with_fingerprint

    B, MASK = 1000003, (1 << 64) - 1

    def ref(t, window=16, keep=8):
        if not t:
            return []
        bts = t.encode("utf-8")
        if len(bts) < window:
            h = 0
            for v in bts:
                h = (h * B + v) & MASK
            hs = [h]
        else:
            hs = []
            for i in range(len(bts) - window + 1):
                h = 0
                for v in bts[i : i + window]:
                    h = (h * B + v) & MASK
                hs.append(h)
        sel = np.sort(np.unique(np.array(hs, dtype=np.uint64)))[:keep]
        return sel.astype(np.int64).tolist()

    rows = [
        (0, ""),
        (1, "short"),
        (2, "exactly sixteen!"),
        (3, "the quick brown fox jumps over the lazy dog " * 10),
        (4, "ñandú 字符串 emoji mix ✓ with multibyte bytes everywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.fingerprint for r in with_fingerprint(df).collect()}
    for did, text in rows:
        assert got[did] == ref(text), did


def test_repetition_signals(spark):
    from tilegrab_spark.operators.text import with_repetition_signals

    rows = [
        (0, "line one\nline one\nline two\n\n  \nline one"),
        (1, "the the the the cat"),
        (2, ""),
        (3, "unique words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_repetition_signals(df).collect()}
    assert got[0].n_lines == 4 and got[0].dup_line_frac == 0.5
    assert got[0].top_word_frac == 0.5  # 'line' x4 of 8
    assert got[1].top_word_frac == 0.8  # 'the' x4 of 5
    assert got[2].n_lines == 0 and got[2].dup_line_frac == 0.0
    assert got[2].top_word_frac == 0.0
    assert got[3].dup_line_frac == 0.0 and got[3].top_word_frac == 0.25


def test_clean_text_and_pii_scrub(spark):
    from tilegrab_spark.operators.text import with_clean_text, with_pii_scrubbed

    rows = [
        (0, "mail bob.smith+x@example.co.uk and ALSO jane@x.io thanks"),
        (1, "call +1-555-123-4567 or (555) 123 4567 tomorrow"),
        (2, "a\x00b\x07c   d\t\te keeps\nnewlines"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_pii_scrubbed(with_clean_text(df)).collect()}
    assert got[0].n_emails == 2
    assert "<EMAIL>" in got[0].scrubbed and "@" not in got[0].scrubbed
    assert got[1].n_phones == 2
    assert got[1].scrubbed.count("<PHONE>") == 2
    assert got[2].clean_text == "abc d e keeps\nnewlines"
    assert got[3].n_emails == 0 and got[3].n_phones == 0
    assert got[3].scrubbed == rows[3][1]


def test_pii_phone_digit_boundaries(spark):
    """Digit runs longer than a phone (timestamps, ids, hashes) must NOT
    be partially rewritten; exact phone-length runs still are."""
    from tilegrab_spark.operators.text import with_pii_scrubbed

    rows = [
        (0, "ts 20260817123456 is a timestamp"),        # 14 digits: keep
        (1, "order 123456789012345678 shipped"),         # 18 digits: keep
        (2, "call 5551234567 now"),                      # 10 digits: scrub
        (3, "+1-555-123-4567 works"),                    # at string start
        (4, "ends with (555) 123 4567"),                 # at string end
        (5, "id9+15551234567 embedded plus"),            # '+' is the boundary
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_pii_scrubbed(df).collect()}
    assert got[0].n_phones == 0 and got[0].scrubbed == rows[0][1]
    assert got[1].n_phones == 0 and got[1].scrubbed == rows[1][1]
    assert got[2].n_phones == 1 and got[2].scrubbed == "call <PHONE> now"
    assert got[3].n_phones == 1 and got[3].scrubbed == "<PHONE> works"
    assert got[4].n_phones == 1 and got[4].scrubbed == "ends with <PHONE>"
    assert got[5].n_phones == 1 and got[5].scrubbed == "id9+<PHONE> embedded plus"


def test_pii_scrub_adjacent_phones_both_caught(spark):
    """Regression (round-3 review): the bounded pattern's trailing group
    consumes the separator, so of two phones split by ONE non-digit only
    the first matched in a single pass — the two-pass scrub catches
    both and n_phones counts both."""
    from tilegrab_spark.operators.text import with_pii_scrubbed

    rows = [
        (1, "call 555-123-4567 555-123-4568 now"),
        (2, "5551234567,5551234568"),
        (3, "a 555-123-4567,555-123-4568,555-123-4569 b"),
        (4, "only one 555-123-4567 here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_pii_scrubbed(df).collect()}
    for i, want_n in ((1, 2), (2, 2), (3, 3), (4, 1)):
        assert got[i].n_phones == want_n, (i, got[i].scrubbed)
        assert "<PHONE>" in got[i].scrubbed
        import re
        assert not re.search(r"[0-9]{7}", got[i].scrubbed), got[i].scrubbed
