"""Incremental connected components (streaming/incremental_cc.py) —
batch-equivalence oracle: read_components over any sequence of
add_edges batches == one-shot connected_components over the edge
union, for multiple batch splits and arrival orders; replay
idempotence; cross-batch component merges; cache hygiene."""

import pytest

from tilegrab_spark.operators.components import connected_components
from tilegrab_spark.operators.dedup import _SIG_CACHE_HANDLES
from tilegrab_spark.streaming.incremental_cc import add_edges, read_components

# three eventual components: {1,2,3,4}, {10,11,12}, {20,21};
# the (3,4)+(1,2) halves only merge when (2,3) arrives
EDGES = [
    (1, 2), (3, 4), (2, 3),
    (10, 11), (11, 12),
    (20, 21),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _oracle(spark, rows):
    got = connected_components(_df(spark, rows)).collect()
    return {r["node"]: r["component"] for r in got}


def _ingest(spark, tmp_path, splits, cutoffs=(100_000, 0)):
    """Run each split through both the driver-union-find and the
    distributed CC path (cutoff 0)."""
    outs = []
    for cutoff in cutoffs:
        root = str(tmp_path / f"cc_{cutoffs.index(cutoff)}_{len(outs)}")
        for i, batch in enumerate(splits):
            add_edges(_df(spark, batch), root, batch_id=i, driver_cutoff=cutoff)
        got = {
            r["node"]: r["component"]
            for r in read_components(spark, root).collect()
        }
        outs.append(got)
    return outs


@pytest.mark.parametrize(
    "splits",
    [
        [EDGES],                                       # one shot
        [EDGES[:2], EDGES[2:4], EDGES[4:]],            # merge arrives batch 2
        [[(2, 3)], [(1, 2)], [(3, 4)], [(10, 11)], [(20, 21), (11, 12)]],
        [[(20, 21)], [(11, 12)], [(10, 11)], [(3, 4)], [(2, 3)], [(1, 2)]],
    ],
)
def test_matches_one_shot_for_any_split(spark, tmp_path, splits):
    want = _oracle(spark, [e for b in splits for e in b])
    for got in _ingest(spark, tmp_path, splits):
        assert got == want


def test_cross_batch_merge_relabels_untouched_members(spark, tmp_path):
    root = str(tmp_path / "cc")
    add_edges(_df(spark, [(5, 9), (9, 40)]), root, batch_id=0)
    add_edges(_df(spark, [(1, 40)]), root, batch_id=1)  # merges via 40 only
    got = {r["node"]: r["component"] for r in read_components(spark, root).collect()}
    # 5 and 9 were NOT touched by batch 1, yet must re-label to 1
    assert got == {1: 1, 5: 1, 9: 1, 40: 1}


def test_new_root_smaller_than_old(spark, tmp_path):
    root = str(tmp_path / "cc")
    add_edges(_df(spark, [(7, 8)]), root, batch_id=0)       # root 7
    add_edges(_df(spark, [(2, 8)]), root, batch_id=1)       # root -> 2
    add_edges(_df(spark, [(0, 7)]), root, batch_id=2)       # root -> 0
    got = {r["node"]: r["component"] for r in read_components(spark, root).collect()}
    assert got == {0: 0, 2: 0, 7: 0, 8: 0}


def test_replayed_batch_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "cc")
    add_edges(_df(spark, [(1, 2), (3, 4)]), root, batch_id=0)
    # at-least-once replay of the SAME batch_id must not erase or
    # duplicate state (state view excludes the batch's own partitions)
    add_edges(_df(spark, [(1, 2), (3, 4)]), root, batch_id=0)
    add_edges(_df(spark, [(2, 3)]), root, batch_id=1)
    add_edges(_df(spark, [(2, 3)]), root, batch_id=1)  # replay after merge
    got = read_components(spark, root)
    rows = got.collect()
    assert len(rows) == len({r["node"] for r in rows})  # one row per node
    assert {r["node"]: r["component"] for r in rows} == {
        1: 1, 2: 1, 3: 1, 4: 1,
    }


def test_touched_labels_returned_and_cache_released(spark, tmp_path):
    root = str(tmp_path / "cc")
    n0 = len(_SIG_CACHE_HANDLES)
    out = add_edges(_df(spark, [(6, 7), (7, 9)]), root, batch_id=0)
    assert {r["node"]: r["component"] for r in out.collect()} == {6: 6, 7: 6, 9: 6}
    assert len(_SIG_CACHE_HANDLES) == n0  # no handle leak per batch


def test_stream_composition_availablenow(spark, tmp_path):
    from tilegrab_spark.streaming.incremental_cc import stream_components

    landing = tmp_path / "edges_in"
    landing.mkdir()
    _df(spark, EDGES[:3]).write.mode("append").parquet(str(landing / "d0"))
    _df(spark, EDGES[3:]).write.mode("append").parquet(str(landing / "d1"))
    q = stream_components(
        spark, f"{landing}/*", str(tmp_path / "st"), str(tmp_path / "ckpt"),
        schema="id_a long, id_b long",
    )
    q.awaitTermination(120)
    got = {
        r["node"]: r["component"]
        for r in read_components(spark, str(tmp_path / "st")).collect()
    }
    assert got == _oracle(spark, EDGES)
