"""PMTiles v3 kernel suite — spec tile-id vectors, Hilbert properties,
archive round-trips (dedup, run-length, leaf split), lookup, hostile
input guards. Pure kernel tests (no Spark fixture needed)."""

from __future__ import annotations

import gzip
import struct

import pytest

from tilegrab_spark.kernels.pmtiles import (
    HEADER_LEN,
    get_tile,
    parse_header,
    read_pmtiles,
    tileid_to_zxy,
    write_pmtiles,
    zxy_to_tileid,
)


class TestTileId:
    def test_spec_vectors(self):
        # the spec's worked examples: id 0 = 0/0/0; z=1 ids 1..4 walk
        # the Hilbert curve (0,0) (0,1) (1,1) (1,0)
        assert zxy_to_tileid(0, 0, 0) == 0
        assert zxy_to_tileid(1, 0, 0) == 1
        assert zxy_to_tileid(1, 0, 1) == 2
        assert zxy_to_tileid(1, 1, 1) == 3
        assert zxy_to_tileid(1, 1, 0) == 4
        assert zxy_to_tileid(2, 0, 0) == 5

    def test_bijective_and_zoom_partition(self):
        for z in (0, 1, 2, 3, 5):
            base = ((1 << (2 * z)) - 1) // 3
            seen = set()
            for x in range(1 << z):
                for y in range(1 << z):
                    tid = zxy_to_tileid(z, x, y)
                    assert base <= tid < base + (1 << (2 * z))
                    assert tileid_to_zxy(tid) == (z, x, y)
                    seen.add(tid)
            assert len(seen) == 1 << (2 * z)

    def test_hilbert_continuity(self):
        # consecutive ids within a zoom are 4-adjacent tiles
        z = 4
        base = ((1 << (2 * z)) - 1) // 3
        prev = None
        for tid in range(base, base + (1 << (2 * z))):
            _, x, y = tileid_to_zxy(tid)
            if prev is not None:
                px, py = prev
                assert abs(x - px) + abs(y - py) == 1, tid
            prev = (x, y)

    def test_validation(self):
        with pytest.raises(ValueError):
            zxy_to_tileid(1, 2, 0)
        with pytest.raises(ValueError):
            zxy_to_tileid(-1, 0, 0)
        with pytest.raises(ValueError):
            tileid_to_zxy(-5)


def _mk_tiles():
    tiles = []
    for x in range(4):
        for y in range(4):
            tiles.append((2, x, y, f"tile-{x}-{y}".encode()))
    tiles.append((0, 0, 0, b"root"))
    tiles.append((1, 1, 0, b"z1"))
    return tiles


class TestArchive:
    def test_roundtrip(self):
        tiles = _mk_tiles()
        blob = write_pmtiles(tiles, tile_type="png", metadata={"name": "t"})
        got = read_pmtiles(blob)
        assert got["metadata"] == {"name": "t"}
        assert got["header"]["n_addressed_tiles"] == len(tiles)
        assert got["header"]["min_zoom"] == 0
        assert got["header"]["max_zoom"] == 2
        want = {(z, x, y): d for z, x, y, d in tiles}
        assert got["tiles"] == want
        for (z, x, y), d in want.items():
            assert get_tile(blob, z, x, y) == d
        assert get_tile(blob, 3, 0, 0) is None
        assert get_tile(blob, 2, 3, 2) == b"tile-3-2"

    def test_content_dedup_and_run_length(self):
        # an entire z=3 level of identical ocean tiles: one content copy,
        # few run-length entries
        tiles = [(3, x, y, b"OCEAN" * 20) for x in range(8) for y in range(8)]
        blob = write_pmtiles(tiles)
        h = parse_header(blob)
        assert h["n_addressed_tiles"] == 64
        assert h["n_tile_contents"] == 1
        assert h["data_length"] == 100  # single copy
        got = read_pmtiles(blob)
        assert len(got["tiles"]) == 64
        assert all(v == b"OCEAN" * 20 for v in got["tiles"].values())
        # hilbert-consecutive identical tiles coalesce aggressively
        assert h["n_tile_entries"] < 64

    def test_leaf_directory_split(self):
        # scattered ids (incompressible deltas) so the root exceeds its
        # bootstrap budget and the writer splits into leaves
        # unique by construction: odd multiplier mod 2^24 is a
        # bijection, so v (hence the (x, y) pair) is distinct per i,
        # scattered over the full 4096x4096 grid -> irregular Hilbert
        # deltas gzip can't crush under the bootstrap budget
        tiles = []
        for i in range(40_000):
            v = (i * 2654435761) % (1 << 24)
            tiles.append((12, v >> 12, v & 0xFFF, struct.pack("<I", i)))
        blob = write_pmtiles(tiles)
        h = parse_header(blob)
        assert h["leaf_length"] > 0
        assert h["root_length"] <= 16384 - HEADER_LEN
        for (z, x, y, d) in tiles[:: 997]:
            assert get_tile(blob, z, x, y) == d
        assert len(read_pmtiles(blob)["tiles"]) == len(tiles)

    def test_gzipped_tile_payloads_pass_through(self):
        payload = gzip.compress(b"mvt-data", mtime=0)
        blob = write_pmtiles(
            [(0, 0, 0, payload)], tile_type="mvt", tile_compression=2
        )
        h = parse_header(blob)
        assert h["tile_compression"] == 2 and h["tile_type"] == 1
        assert get_tile(blob, 0, 0, 0) == payload  # stored verbatim

    def test_validation_and_hostile(self):
        with pytest.raises(ValueError, match="no tiles"):
            write_pmtiles([])
        with pytest.raises(ValueError, match="duplicate"):
            write_pmtiles([(1, 0, 0, b"a"), (1, 0, 0, b"b")])
        with pytest.raises(ValueError, match="not a PMTiles"):
            parse_header(b"GARBAGE" + b"\x00" * 200)
        blob = write_pmtiles(_mk_tiles())
        bad = bytearray(blob)
        bad[7] = 9  # future version
        with pytest.raises(ValueError, match="version"):
            parse_header(bytes(bad))
        # truncated directory
        h = parse_header(blob)
        trunc = blob[: h["root_offset"] + 3]
        with pytest.raises(Exception):
            get_tile(trunc + b"\x00", 0, 0, 0)

    def test_clustered_layout_offsets_ascend(self):
        blob = write_pmtiles(_mk_tiles())
        got = read_pmtiles(blob)
        h = got["header"]
        assert h["clustered"] is True
        # every tile payload lies inside the data section
        assert h["data_offset"] + h["data_length"] == len(blob)


class TestVectorizedIds:
    def test_tileids_np_parity(self):
        import numpy as np

        from tilegrab_spark.kernels.pmtiles import tileids_np

        zs, xs, ys = [], [], []
        for z in (0, 1, 2, 5, 12, 19):
            n = 1 << z
            for i in range(40):
                v = (i * 2654435761 + z) % (n * n)
                zs.append(z)
                xs.append(v % n)
                ys.append(v // n)
        got = tileids_np(np.array(zs), np.array(xs), np.array(ys))
        want = [zxy_to_tileid(z, x, y) for z, x, y in zip(zs, xs, ys)]
        assert got.tolist() == want

    def test_tileids_np_validation(self):
        import numpy as np

        from tilegrab_spark.kernels.pmtiles import tileids_np

        with pytest.raises(ValueError):
            tileids_np(np.array([1]), np.array([2]), np.array([0]))
        with pytest.raises(ValueError):
            tileids_np(np.array([33]), np.array([0]), np.array([0]))
        assert tileids_np(np.array([], dtype=int), np.array([], dtype=int),
                          np.array([], dtype=int)).tolist() == []


class TestIncrementalWriter:
    def test_writer_matches_batch_and_streams_to_file(self, tmp_path):
        from tilegrab_spark.kernels.pmtiles import PMTilesWriter

        tiles = _mk_tiles()
        batch = write_pmtiles(tiles, metadata={"name": "t"})
        w = PMTilesWriter(metadata={"name": "t"}, spool_max_bytes=16)
        for z, x, y, d in sorted(tiles, key=lambda t: zxy_to_tileid(t[0], t[1], t[2])):
            w.add(z, x, y, d)
        out = tmp_path / "a.pmtiles"
        w.finalize(str(out))
        assert out.read_bytes() == batch  # bit-identical to the batch path

    def test_writer_rejects_unsorted(self):
        from tilegrab_spark.kernels.pmtiles import PMTilesWriter

        w = PMTilesWriter()
        w.add(2, 1, 1, b"a")
        with pytest.raises(ValueError, match="ascend"):
            w.add(1, 0, 0, b"b")


class TestSparkSink:
    def test_export_pmtiles_roundtrip(self, spark, tmp_path):
        from tilegrab_spark.sources.export import export_pmtiles

        tiles = _mk_tiles()
        df = spark.createDataFrame(
            [(z, x, y, bytearray(d)) for z, x, y, d in tiles],
            "z int, x int, y int, bytes binary",
        ).repartition(5)  # scattered partitions: the orderBy must cluster
        out = tmp_path / "layer.pmtiles"
        n = export_pmtiles(df, out, metadata={"layer": "test"})
        assert n == len(tiles)
        got = read_pmtiles(out.read_bytes())
        assert got["metadata"] == {"layer": "test"}
        assert got["header"]["clustered"] is True
        assert got["tiles"] == {(z, x, y): d for z, x, y, d in tiles}
