"""augment_images pixel oracles: decode every augmented PNG and compare
byte-exactly with the same numpy transform applied to the original,
plus determinism (partitioning + rerun invariance) and failure rows."""

import hashlib

import numpy as np
import pytest

from tilegrab_spark.kernels import png
from tilegrab_spark.operators.augment import AUGMENT_OPS, augment_images


def _img(seed, w=24, h=16):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _table(spark, n=6, w=24, h=16):
    rows = []
    for i in range(n):
        arr = _img(i, w, h)
        rows.append((f"img{i}", bytearray(png.encode_png(arr)), w, h, "png"))
    return (
        spark.createDataFrame(
            rows, "image_id string, bytes binary, w int, h int, fmt string"
        ),
        {f"img{i}": _img(i, w, h) for i in range(n)},
    )


def _expected(arr, op, digest, crop_frac=0.75, delta=32):
    return AUGMENT_OPS[op](arr, (crop_frac, delta), digest[1], digest[2])


def test_all_ops_pixel_exact(spark):
    df, originals = _table(spark)
    ops = tuple(sorted(AUGMENT_OPS))
    rows = augment_images(df, ops=ops, mode="all", seed=3).collect()
    assert len(rows) == len(originals) * len(ops)
    for r in rows:
        assert r.decode_ok
        got = png.decode_png(bytes(r.bytes))
        digest = hashlib.md5(f"{r.image_id}|3".encode()).digest()
        want = _expected(originals[r.image_id], r.aug, digest)
        assert got.shape == want.shape == (r.h, r.w, 3)
        assert np.array_equal(got, want), (r.image_id, r.aug)


def test_mode_one_deterministic_choice(spark):
    df, originals = _table(spark)
    ops = ("hflip", "rot90", "crop")
    rows = {r.image_id: r for r in augment_images(df, ops=ops, seed=7).collect()}
    assert len(rows) == len(originals)
    for iid, r in rows.items():
        digest = hashlib.md5(f"{iid}|7".encode()).digest()
        assert r.aug == ops[digest[0] % len(ops)]
        got = png.decode_png(bytes(r.bytes))
        assert np.array_equal(got, _expected(originals[iid], r.aug, digest))


def test_rerun_and_partitioning_invariant(spark):
    df, _ = _table(spark, n=8)
    a = sorted(
        (r.image_id, r.aug, bytes(r.bytes))
        for r in augment_images(df, seed=11).collect()
    )
    b = sorted(
        (r.image_id, r.aug, bytes(r.bytes))
        for r in augment_images(df.repartition(7), seed=11).collect()
    )
    assert a == b
    c = sorted(
        (r.image_id, r.aug) for r in augment_images(df, seed=12).collect()
    )
    assert c != [(x[0], x[1]) for x in a]  # seed actually moves choices


def test_crop_dims_and_brightness_clip(spark):
    df, originals = _table(spark, n=4, w=32, h=20)
    rows = augment_images(df, ops=("crop",), mode="all", crop_frac=0.5).collect()
    for r in rows:
        assert (r.w, r.h) == (16, 10)
    bright = augment_images(df, ops=("brightness",), mode="all",
                            brightness_delta=300).collect()
    for r in bright:
        got = png.decode_png(bytes(r.bytes))
        assert got.min() == 0 or got.max() == 255  # saturated, not wrapped


def test_bad_payload_surfaces(spark):
    rows = [("bad", bytearray(b"notapng"), 8, 8, "png")]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    out = augment_images(df).collect()
    assert len(out) == 1 and not out[0].decode_ok and out[0].bytes is None


def test_validation(spark):
    df, _ = _table(spark, n=1)
    with pytest.raises(ValueError):
        augment_images(df, ops=("spin",))
    with pytest.raises(ValueError):
        augment_images(df, ops=())
    with pytest.raises(ValueError):
        augment_images(df, mode="some")
    with pytest.raises(ValueError):
        augment_images(df, crop_frac=0.0)
