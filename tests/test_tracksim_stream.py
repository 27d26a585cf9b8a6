"""Incremental track similarity — batch-equivalence oracle: accumulated
per-batch pairs == one-shot track_similarity_join over the union, for
multiple batch splits and arrival orders; parameter pinning; streaming
composition end-to-end."""

import pytest

from tilegrab_spark.operators.dedup import release_signature_caches
from tilegrab_spark.operators.tracksim import track_similarity_join
from tilegrab_spark.streaming.tracksim_stream import (
    incremental_track_pairs,
    stream_track_similarity,
)
from tests.test_tracksim import make_tracks, tracks_df

D = 120.0


def _by_tracks(rows, names):
    return [r for r in rows if r[0] in names]


def _run_split(spark, tmp_path, splits, metric="hausdorff"):
    got = {}
    for i, names in enumerate(splits):
        batch = spark.createDataFrame(
            _by_tracks(make_tracks(), names),
            "track_id string, ts double, lon double, lat double",
        )
        frame = incremental_track_pairs(
            batch, str(tmp_path / "state"),
            batch_id=i, max_dist_m=D, metric=metric,
        )
        pairs = frame.collect()
        # a MULTISET check: the refreshByPath cache invalidation the
        # commit triggers must not make post-commit reads double-count
        # (each pair exactly once, also when re-collected after commit)
        keys = [(r["track_a"], r["track_b"]) for r in pairs]
        assert len(keys) == len(set(keys)), f"duplicate pairs in batch {i}: {keys}"
        rekeys = [(r["track_a"], r["track_b"]) for r in frame.collect()]
        assert sorted(rekeys) == sorted(keys)
        for r in pairs:
            assert (r["track_a"], r["track_b"]) not in got, "pair re-emitted"
            got[(r["track_a"], r["track_b"])] = r["dist_m"]
        release_signature_caches()
    return got


ALL = ["a0", "a1", "a2", "rev", "far", "am1", "am2"]


@pytest.mark.parametrize(
    "splits",
    [
        [["a0", "far"], ["a1", "rev"], ["a2", "am1", "am2"]],
        [["am2", "a2"], ["a1", "am1", "far"], ["rev"], ["a0"]],
        [ALL],
    ],
)
def test_incremental_equals_one_shot(spark, tmp_path, splits):
    want = {
        (r["track_a"], r["track_b"]): r["dist_m"]
        for r in track_similarity_join(tracks_df(spark), D).collect()
    }
    release_signature_caches()
    got = _run_split(spark, tmp_path, splits)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_incremental_frechet_and_no_reemission(spark, tmp_path):
    want = {
        (r["track_a"], r["track_b"]): r["dist_m"]
        for r in track_similarity_join(tracks_df(spark), D, metric="frechet").collect()
    }
    release_signature_caches()
    # per-batch frames must be disjoint: a pair appears in exactly the
    # batch that introduced its newer track
    seen = set()
    got = {}
    for i, names in enumerate([["a0", "a1"], ["a2", "rev"], ["far", "am1", "am2"]]):
        batch = spark.createDataFrame(
            _by_tracks(make_tracks(), names),
            "track_id string, ts double, lon double, lat double",
        )
        pairs = incremental_track_pairs(
            batch, str(tmp_path / "state"), batch_id=i, max_dist_m=D, metric="frechet"
        ).collect()
        keys = {(r["track_a"], r["track_b"]) for r in pairs}
        assert not keys & seen
        seen |= keys
        got.update({(r["track_a"], r["track_b"]): r["dist_m"] for r in pairs})
        release_signature_caches()
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_parameter_contract_pinned(spark, tmp_path):
    batch = spark.createDataFrame(
        _by_tracks(make_tracks(), ["a0"]),
        "track_id string, ts double, lon double, lat double",
    )
    incremental_track_pairs(batch, str(tmp_path / "s"), batch_id=0, max_dist_m=D)
    release_signature_caches()
    b2 = spark.createDataFrame(
        _by_tracks(make_tracks(), ["a1"]),
        "track_id string, ts double, lon double, lat double",
    )
    with pytest.raises(ValueError, match="fresh state_path"):
        incremental_track_pairs(b2, str(tmp_path / "s"), batch_id=1, max_dist_m=50.0)
    with pytest.raises(ValueError, match="fresh state_path"):
        incremental_track_pairs(
            b2, str(tmp_path / "s"), batch_id=1, max_dist_m=D, metric="frechet"
        )
    # matching params proceed
    incremental_track_pairs(b2, str(tmp_path / "s"), batch_id=1, max_dist_m=D)
    release_signature_caches()


def test_stream_composition_availablenow(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    schema = "track_id string, ts double, lon double, lat double"
    for i, names in enumerate([["a0", "a1", "far"], ["a2", "rev", "am1", "am2"]]):
        spark.createDataFrame(_by_tracks(make_tracks(), names), schema).coalesce(
            1
        ).write.mode("append").parquet(str(landing / f"drop{i}"))
    q = stream_track_similarity(
        spark,
        str(landing / "*"),
        str(tmp_path / "state"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
        schema=schema,
        max_dist_m=D,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "pairs"))
    assert "batch_id" in got.columns  # replay detectability
    rows = got.collect()
    gotk = {(r["track_a"], r["track_b"]) for r in rows}
    assert len(rows) == len(gotk)  # multiset: no pair written twice
    want = {
        (r["track_a"], r["track_b"])
        for r in track_similarity_join(tracks_df(spark), D).collect()
    }
    release_signature_caches()
    assert gotk == want


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """At-least-once replay: re-running a committed batch with the SAME
    batch_id must rewrite identical state (per-batch partition
    overwrite), so later batches emit each pair exactly once."""
    rows = make_tracks()
    b0 = spark.createDataFrame(
        _by_tracks(rows, ["a0", "a1"]),
        "track_id string, ts double, lon double, lat double",
    )
    for _ in range(2):  # original + replay
        incremental_track_pairs(b0, str(tmp_path / "st"), batch_id=0, max_dist_m=D)
        release_signature_caches()
    b1 = spark.createDataFrame(
        _by_tracks(rows, ["a2", "rev"]),
        "track_id string, ts double, lon double, lat double",
    )
    pairs = incremental_track_pairs(
        b1, str(tmp_path / "st"), batch_id=1, max_dist_m=D
    ).collect()
    release_signature_caches()
    keys = [(r["track_a"], r["track_b"]) for r in pairs]
    assert len(keys) == len(set(keys)), f"replay duplicated state: {sorted(keys)}"
    assert ("a0", "a2") in set(keys) and ("a1", "a2") in set(keys)


def test_dry_run_does_not_pin_params(spark, tmp_path):
    batch = spark.createDataFrame(
        _by_tracks(make_tracks(), ["a0"]),
        "track_id string, ts double, lon double, lat double",
    )
    incremental_track_pairs(
        batch, str(tmp_path / "dry"), batch_id=0, max_dist_m=50.0, commit=False
    ).collect()
    release_signature_caches()
    # a later REAL run with different params must start clean
    incremental_track_pairs(batch, str(tmp_path / "dry"), batch_id=0, max_dist_m=D)
    release_signature_caches()


def test_stale_track_id_raises(spark, tmp_path):
    """A track id re-appearing in a LATER batch violates the
    append-only-ids contract and must raise instead of silently leaving
    two state rows (duplicate/incorrect pairs downstream). A replay of
    the SAME batch_id is still legal (covered above)."""
    rows = make_tracks()
    b0 = spark.createDataFrame(
        _by_tracks(rows, ["a0", "a1"]),
        "track_id string, ts double, lon double, lat double",
    )
    incremental_track_pairs(b0, str(tmp_path / "st"), batch_id=0, max_dist_m=D)
    release_signature_caches()
    b1 = spark.createDataFrame(
        _by_tracks(rows, ["a1", "a2"]),  # a1 already committed in batch 0
        "track_id string, ts double, lon double, lat double",
    )
    with pytest.raises(ValueError, match="already committed"):
        incremental_track_pairs(
            b1, str(tmp_path / "st"), batch_id=1, max_dist_m=D
        )
    release_signature_caches()


def test_params_pinned_on_scheme_qualified_path(spark, tmp_path):
    """ADVICE r4 #1: the _params.json pin goes through the Hadoop FS
    API, so it must engage on scheme-qualified state paths (file://
    here standing in for hdfs:///s3a://) — the old os.path probe never
    found the pin there and silently skipped the fail-loudly check."""
    root = f"file://{tmp_path}/schemed"
    batch = spark.createDataFrame(
        _by_tracks(make_tracks(), ["a0"]),
        "track_id string, ts double, lon double, lat double",
    )
    incremental_track_pairs(batch, root, batch_id=0, max_dist_m=D)
    release_signature_caches()
    with pytest.raises(ValueError, match="fresh state_path"):
        incremental_track_pairs(batch, root, batch_id=1, max_dist_m=D * 2)
    release_signature_caches()
