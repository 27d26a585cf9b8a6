"""Multi-executor submission evidence (north rule: "runs via spark-submit
--py-files on multi-executor clusters").

``local-cluster[2,1,1024]`` is Spark's testing master that launches TWO
REAL executor JVMs (separate processes, separate heaps) talking to the
driver over RPC — unlike ``local[N]``, code here crosses process
boundaries exactly as on a real cluster: the ``--py-files`` zip must
reach each executor's Python workers, closures must serialize, and
shuffle blocks must move between processes. The driver script runs the
flagship pipeline (enumerate → PIP refine → J1 join → A2 stitch) over a
generated image table and reports executor count + row counts.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

DRIVER = """
import json, sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

out_path = sys.argv[1]
spark = SparkSession.builder.appName("submit-smoke").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from tilegrab_spark.kernels import geo
from tilegrab_spark.operators.image_join import join_images
from tilegrab_spark.operators.mosaic import mosaic
from tilegrab_spark.operators.tiles import enumerate_tiles, refine_by_shape
from tilegrab_spark.sources.geometries import geometry_from_rings
from tilegrab_spark.sources.images import (
    read_image_table,
    write_synthetic_image_table,
)

zoom, x0, y0, edge = 15, 23000, 15000, 8
cells = [(zoom, x0 + i, y0 + j, 0) for i in range(edge) for j in range(edge)]
table = out_path + ".table"
write_synthetic_image_table(spark, table, cells, n_buckets=4)
images = read_image_table(spark, table)

b0 = geo.tile_bounds(x0, y0 + edge, zoom)
b1 = geo.tile_bounds(x0 + edge, y0, zoom)
ring = [
    (b0[0], b0[1]), (b0[0], b1[3]), (b1[2], b1[3]), (b1[2], b0[1]), (b0[0], b0[1]),
]
geom = geometry_from_rings("sub", [ring])
tiles = refine_by_shape(enumerate_tiles(spark, geom, zoom), geom)
joined = join_images(tiles, images.drop("cell_id"))
m = mosaic(joined, group_w=4, group_h=4, full_groups_only=False, anchor=(x0, y0))
n_tiles = m.select(F.sum("n_tiles")).collect()[0][0]

# separate executor JVMs: driver + 2 executors register block managers
n_block_managers = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
result = {
    "join_rows": joined.count(),
    "mosaics": m.count(),
    "n_tiles_merged": int(n_tiles),
    "n_block_managers": int(n_block_managers),
    "master": spark.sparkContext.master,
}
with open(out_path, "w") as f:
    json.dump(result, f)
spark.stop()
"""


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    return str(cand) if cand.exists() else None


def test_spark_submit_pyfiles_local_cluster(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not available")

    # package the engine exactly as a cluster deploy would
    zip_path = tmp_path / "tilegrab_spark.zip"
    pkg = REPO / "tilegrab_spark"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(pkg.rglob("*.py")):
            zf.write(p, p.relative_to(REPO))

    driver_py = tmp_path / "driver.py"
    driver_py.write_text(DRIVER)
    out_json = tmp_path / "result.json"

    import pyspark

    env = dict(os.environ)
    env.setdefault("SPARK_HOME", str(Path(pyspark.__file__).parent))
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            submit,
            "--master", "local-cluster[2,1,1024]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(driver_py), str(out_json),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=540,
        cwd=str(tmp_path),  # anywhere BUT the repo: the zip must be the import source
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    result = json.loads(out_json.read_text())
    assert result["join_rows"] == 64
    assert result["mosaics"] == 4
    assert result["n_tiles_merged"] == 64
    assert result["master"] == "local-cluster[2,1,1024]"
    # driver + 2 executor JVMs
    assert result["n_block_managers"] >= 3, result
