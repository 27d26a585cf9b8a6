"""points_in_polygons vs an independent scalar even-odd oracle."""

import numpy as np
import pytest

from tilegrab_spark.operators.points import points_in_polygons
from tilegrab_spark.sources.geometries import GeometrySet


def _scalar_pip(px, py, polygons):
    """Independent even-odd: crossing-count per ring, xor across rings
    of one polygon, OR across polygons."""
    for poly in polygons:
        inside = False
        for ring in poly:
            r = np.asarray(ring, dtype=float)
            if not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            c = False
            for i in range(len(r) - 1):
                x1, y1 = r[i]
                x2, y2 = r[i + 1]
                if (y1 > py) != (y2 > py):
                    xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                    if px < xint:
                        c = not c
            inside ^= c
        if inside:
            return True
    return False


def _square(cx, cy, half):
    return np.array(
        [[cx - half, cy - half], [cx + half, cy - half],
         [cx + half, cy + half], [cx - half, cy + half]]
    )


@pytest.fixture(scope="module")
def zones():
    donut = GeometrySet("donut", [[_square(10.0, 45.0, 2.0), _square(10.0, 45.0, 0.7)]])
    solid = GeometrySet("solid", [[_square(13.0, 45.0, 1.0)]])
    overlap = GeometrySet("overlap", [[_square(11.5, 45.0, 1.2)]])
    return [donut, solid, overlap]


def _grid_points():
    xs = np.linspace(7.0, 15.0, 33)
    ys = np.linspace(42.0, 48.0, 25)
    return [(float(x), float(y)) for x in xs for y in ys]


def test_tag_matches_scalar_oracle(spark, zones):
    pts = _grid_points()
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = {(r.lon, r.lat): r.geom_id
           for r in points_in_polygons(df, zones).collect()}
    for lon, lat in pts:
        want = None
        for g in zones:
            if _scalar_pip(lon, lat, g.polygons):
                want = g.geom_id
                break
        assert got[(lon, lat)] == want, (lon, lat)


def test_donut_hole_is_outside(spark, zones):
    df = spark.createDataFrame(
        [(10.0, 45.0), (10.0, 46.0), (10.0, 48.0)], "lon double, lat double"
    )
    got = [r.geom_id for r in
           points_in_polygons(df, zones[0]).orderBy("lat").collect()]
    assert got == [None, "donut", None]  # hole center, ring area, far out


def test_multi_returns_all_matches(spark, zones):
    # 12.2 sits in both 'solid' and 'overlap'
    df = spark.createDataFrame([(12.2, 45.0), (9.0, 45.0)], "lon double, lat double")
    got = {r.lon: sorted(r.geom_id) for r in
           points_in_polygons(df, zones, multi=True).collect()}
    assert got[12.2] == ["overlap", "solid"]
    assert got[9.0] == ["donut"]
    # single-match mode: first geometry in caller order wins
    first = {r.lon: r.geom_id for r in points_in_polygons(df, zones).collect()}
    assert first[12.2] == "solid"


def test_inner_drops_unmatched(spark, zones):
    df = spark.createDataFrame(
        [(10.0, 46.0), (0.0, 0.0), (13.0, 45.0)], "lon double, lat double"
    )
    got = points_in_polygons(df, zones, how="inner").collect()
    assert {r.geom_id for r in got} == {"donut", "solid"} and len(got) == 2
    got_m = points_in_polygons(df, zones, how="inner", multi=True).collect()
    assert len(got_m) == 2


def test_zero_shuffle_plan(spark, zones):
    df = spark.createDataFrame([(10.0, 46.0)], "lon double, lat double")
    plan = points_in_polygons(df, zones)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_validation(spark, zones):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    with pytest.raises(ValueError):
        points_in_polygons(df, zones, how="outer")
    with pytest.raises(ValueError):
        points_in_polygons(df, [])
