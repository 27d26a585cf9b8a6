"""Cross-modal (phash + caption) near-dup pairs over image+caption rows."""

import numpy as np
import pytest

from tilegrab_spark.kernels import png
from tilegrab_spark.operators.crossmodal import cross_modal_pairs


def _scenes():
    """Four structured scenes + captions covering every modality class:

    a/b: same scene lightly corrupted (visual match), captions rewritten
         (no caption match)            -> 'visual'
    a/c: unrelated scene (no visual), caption copied verbatim -> 'caption'
    a/d: re-encode with same alt-text  -> 'both'
    e:   unrelated everything          -> no pairs
    """
    ramp = np.linspace(0, 255, 256, dtype=np.uint8)
    vert = np.repeat(ramp[:, None, None], 256, axis=1).repeat(3, axis=2)
    corrupted = vert.copy()
    corrupted[:40, :40] = 255
    horiz = np.repeat(ramp[None, :, None], 256, axis=0).repeat(3, axis=2)
    checker = ((np.add.outer(np.arange(256) // 32, np.arange(256) // 32) % 2) * 255).astype(
        np.uint8
    )[:, :, None].repeat(3, axis=2)
    cap_a = "aerial view of the harbor docks at dawn with moored boats"
    cap_b = "harbour skyline photographed from the water at first light"
    cap_e = "dense forest canopy seen from a drone in midsummer heat"
    return [
        ("img_a", png.phash64(vert), cap_a),
        ("img_b", png.phash64(corrupted), cap_b),
        ("img_c", png.phash64(horiz), cap_a),
        ("img_d", png.phash64(vert), cap_a),
        ("img_e", png.phash64(checker), cap_e),
    ]


@pytest.fixture(scope="module")
def pairs_df(spark):
    df = spark.createDataFrame(_scenes(), "image_id string, phash long, caption string")
    return cross_modal_pairs(df, max_hamming=10, k=3, jaccard_threshold=0.5)


def test_modality_classification(pairs_df):
    got = {(r.id_a, r.id_b): r for r in pairs_df.collect()}
    assert got[("img_a", "img_b")].modality == "visual"
    assert got[("img_a", "img_b")].jaccard is None
    assert got[("img_a", "img_c")].modality == "caption"
    assert got[("img_a", "img_c")].hamming is None
    assert got[("img_a", "img_d")].modality == "both"
    assert got[("img_a", "img_d")].hamming == 0
    assert got[("img_a", "img_d")].jaccard == pytest.approx(1.0)
    assert not any("img_e" in (k[0], k[1]) for k in got)


def test_mode_filters(spark):
    df = spark.createDataFrame(_scenes(), "image_id string, phash long, caption string")
    kw = dict(max_hamming=10, k=3, jaccard_threshold=0.5)
    both = {
        (r.id_a, r.id_b) for r in cross_modal_pairs(df, mode="both", **kw).collect()
    }
    visual = {
        (r.id_a, r.id_b) for r in cross_modal_pairs(df, mode="visual", **kw).collect()
    }
    caption = {
        (r.id_a, r.id_b) for r in cross_modal_pairs(df, mode="caption", **kw).collect()
    }
    anym = {(r.id_a, r.id_b) for r in cross_modal_pairs(df, mode="any", **kw).collect()}
    assert both == {("img_a", "img_d")}
    assert ("img_a", "img_b") in visual and ("img_a", "img_c") not in visual
    assert ("img_a", "img_c") in caption and ("img_a", "img_b") not in caption
    assert anym == visual | caption and both == visual & caption
    with pytest.raises(ValueError):
        cross_modal_pairs(df, mode="nope")


def test_matches_per_modality_generators(spark):
    """The combined output must equal the union of the two standalone
    generators — no pair invented, none dropped, values carried through."""
    from tilegrab_spark.operators.dedup import (
        hamming_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(_scenes(), "image_id string, phash long, caption string")
    vis = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_near_dup_pairs(
            df, hash_col="phash", id_col="image_id", max_hamming=10
        ).collect()
    }
    cap = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, id_col="image_id", text_col="caption", k=3, threshold=0.5
        ).collect()
    }
    got = {
        (r.id_a, r.id_b): (r.hamming, r.jaccard)
        for r in cross_modal_pairs(
            df, max_hamming=10, k=3, jaccard_threshold=0.5
        ).collect()
    }
    assert set(got) == set(vis) | set(cap)
    for key, (h, j) in got.items():
        assert h == vis.get(key) and (
            j == pytest.approx(cap[key]) if key in cap else j is None
        )
