"""Vector generalization pyramid: polygonize rings → per-zoom simplify
→ one multi-zoom MVT cut → PMTiles archive. Invariants: exteriors
survive with bounded area drift, holes never orphan, tiny rings drop
at coarse zooms, and every archived tile decodes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilegrab_spark.kernels import mvt as mvtk, png as pngk, pmtiles as pmk
from tilegrab_spark.operators.dedup import release_signature_caches
from tilegrab_spark.operators.polygonize import polygonize
from tilegrab_spark.operators.vectortiles import (
    generalize_rings,
    polygons_to_mvt,
    ring_pyramid,
)

Z, PX = 6, 64


def _cat_table(spark):
    """One 2x1 tile strip: a big blob of label 1 spanning both tiles, a
    small 3x3 speck of label 2, background 0."""
    lab = np.zeros((PX, 2 * PX), dtype=np.uint8)
    gy, gx = np.mgrid[0:PX, 0:2 * PX]
    lab[((gx - 64) ** 2 / 2.2 + (gy - 32) ** 2) < 550] = 1
    lab[5:8, 5:8] = 2  # speck: survives at z6, drops when generalized
    rows = []
    for tx in range(2):
        g = lab[:, tx * PX:(tx + 1) * PX]
        arr = np.stack([g, g, g], axis=2)
        rows.append((f"{Z}_{tx}_{0}", pngk.encode_png(arr), PX, PX, "png", Z, tx, 0))
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, z int, x long, y long",
    ), lab


def test_generalize_area_and_speck_drop(spark):
    df, lab = _cat_table(spark)
    rings = polygonize(df, zoom=Z).filter(F.col("label") > 0)
    base = rings.collect()
    release_signature_caches()
    blob_area = int((lab == 1).sum())
    # source-zoom rings: blob + speck
    labels = {r["label"] for r in base}
    assert labels == {1, 2}
    rdf = spark.createDataFrame(base, rings.schema)
    gen = generalize_rings(rdf, to_zoom=Z - 2, tolerance_px=1.0,
                           min_ring_area_px=2.0).collect()
    # the 3x3 speck is 0.1875px^2 at z-2 -> dropped; the blob survives
    assert {r["label"] for r in gen} == {1}
    for r in gen:
        if r["ring_idx"] == 0:
            got_area = abs(r["signed_area_px"])
            want = blob_area / 16.0  # area scales by 1/4 per zoom
            assert abs(got_area - want) / want < 0.25  # simplify drift bound
            assert r["n_vertices"] <= len(base[0]["xs"])  # simplified
    # z passthrough-ish: to_zoom == source keeps the speck
    same = generalize_rings(rdf, to_zoom=Z, tolerance_px=0.0,
                            min_ring_area_px=2.0).collect()
    assert {r["label"] for r in same} == {1, 2}


def test_hole_never_orphans(spark):
    """A ring-shaped region (label 1 with a label-0 hole): if the
    exterior drops at a coarse zoom, the hole must drop with it."""
    lab = np.zeros((PX, PX), dtype=np.uint8)
    gy, gx = np.mgrid[0:PX, 0:PX]
    d2 = (gx - 32) ** 2 + (gy - 32) ** 2
    lab[(d2 < 49)] = 1
    lab[(d2 < 9)] = 0  # hole
    arr = np.stack([lab, lab, lab], axis=2)
    df = spark.createDataFrame(
        [(f"{Z}_0_0", pngk.encode_png(arr), PX, PX, "png", Z, 0, 0)],
        "image_id string, bytes binary, w int, h int, fmt string, z int, x long, y long",
    )
    rings = polygonize(df, zoom=Z).filter(F.col("label") == 1)
    base = rings.collect()
    release_signature_caches()
    assert {r["ring_idx"] for r in base} == {0, 1}  # exterior + hole
    rdf = spark.createDataFrame(base, rings.schema)
    # generalize so far the whole donut collapses below min area
    gen = generalize_rings(rdf, to_zoom=0, tolerance_px=1.0,
                           min_ring_area_px=2.0).collect()
    assert gen == []  # no orphan hole rows


def test_pyramid_to_mvt_and_pmtiles(spark, tmp_path):
    df, _ = _cat_table(spark)
    rings = polygonize(df, zoom=Z).filter(F.col("label") > 0)
    base = rings.collect()
    release_signature_caches()
    rdf = spark.createDataFrame(base, rings.schema)
    pyr = ring_pyramid(rdf, zooms=[Z, Z - 1, Z - 2], tolerance_px=1.0)
    tiles = polygons_to_mvt(pyr, tile_px=PX)
    got = tiles.collect()
    zs = {r["z"] for r in got}
    assert zs == {Z, Z - 1, Z - 2}
    for r in got:
        feats = mvtk.decode_mvt(bytes(r["mvt"]))
        assert feats  # every emitted tile decodes with features
    # archive the whole pyramid as one PMTiles file
    from tilegrab_spark.sources.export import export_pmtiles

    path = str(tmp_path / "pyr.pmtiles")
    export_pmtiles(tiles.select("z", "x", "y", F.col("mvt").alias("bytes")), path)
    with open(path, "rb") as f:
        archive = f.read()
    meta = pmk.read_pmtiles(archive)
    for r in got:
        blob = pmk.get_tile(archive, r["z"], r["x"], r["y"])
        assert blob == bytes(r["mvt"])


def test_validation(spark):
    df, _ = _cat_table(spark)
    rings = polygonize(df, zoom=Z)
    base = rings.collect()
    release_signature_caches()
    rdf = spark.createDataFrame(base, rings.schema)
    with pytest.raises(ValueError, match="tolerance_px"):
        generalize_rings(rdf, to_zoom=Z, tolerance_px=-1.0)
    with pytest.raises(Exception, match="finer"):
        generalize_rings(rdf, to_zoom=Z + 1).collect()
