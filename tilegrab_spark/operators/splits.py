"""Spatially-blocked train/val/test splits — leakage-safe dataset
partitioning for geo-ML.

Random per-row splits leak in spatial learning: a model trained on tile
(x, y) is evaluated on its neighbor (x+1, y), which shares most of its
content (Roberts et al. 2017, "Cross-validation strategies for data with
temporal, spatial, hierarchical, or phylogenetic structure", Ecography
40). The standard fix is BLOCKED assignment: carve the world into coarse
cells and give every row inside a cell the same split, so train/test
boundaries follow block edges, never row edges.

Engine shapes:

- the block key is the row's ancestor tile at ``block_zoom`` —
  ``x >> (z - block_zoom)`` for tile rows (the pyramid ancestor
  contract, pyramid.py) or P1 cell encoding for lon/lat rows;
- assignment is the md5-60 ``sample_hash`` contract over the block id
  string ``"{bz}_{bx}_{by}" || salt`` (sampling.py:44) against the
  cumulative fraction thresholds — a PURE Catalyst projection: zero
  shuffle, streaming-safe, identical on re-runs/resumes/new epochs, and
  re-derivable by an independent engine (DuckDB:
  ``('0x' || substr(md5(id || salt), 1, 15))::BIGINT``);
- leakage-safety is by construction (one hash per block → one label per
  block), and fraction accuracy concentrates at the BLOCK count, not the
  row count — document the variance to users: with B occupied blocks the
  realized fraction is Binomial(B, f)/B.

The reference has no analogue; part of the training-data operator suite
from the driver brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tilegrab_spark.functions.cells import cell_encode_cols
from tilegrab_spark.operators.sampling import _HASH_SPACE, sample_hash

__all__ = ["with_block_cell", "spatial_split", "split_leakage_report"]


def with_block_cell(
    df: DataFrame,
    block_zoom: int,
    *,
    zoom_col: str = "z",
    x_col: str = "x",
    y_col: str = "y",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Adds ``block_x, block_y`` — the row's ancestor cell at
    ``block_zoom``. Tile rows (``zoom_col`` present) shift their key
    down; lon/lat rows encode directly at ``block_zoom`` (P1). Tile rows
    coarser than the block zoom would make "block" meaningless (one tile
    spans many blocks) — that's an error, pick a coarser ``block_zoom``."""
    if block_zoom < 0:
        raise ValueError(f"block_zoom must be >= 0, got {block_zoom}")
    cols = set(df.columns)
    if {zoom_col, x_col, y_col} <= cols:
        up = F.col(zoom_col) - F.lit(int(block_zoom))
        guard = F.when(
            up < 0,
            F.raise_error(
                F.concat(
                    F.lit(f"row zoom coarser than block_zoom={block_zoom}: z="),
                    F.col(zoom_col).cast("string"),
                )
            ),
        )
        return df.withColumn(
            "block_x",
            F.coalesce(guard, F.expr(f"shiftright(`{x_col}`, `{zoom_col}` - {int(block_zoom)})")).cast("long"),
        ).withColumn(
            "block_y",
            F.expr(f"shiftright(`{y_col}`, `{zoom_col}` - {int(block_zoom)})").cast("long"),
        )
    if {lon_col, lat_col} <= cols:
        bx, by = cell_encode_cols(F.col(lon_col), F.col(lat_col), int(block_zoom))
        return df.withColumn("block_x", bx.cast("long")).withColumn(
            "block_y", by.cast("long")
        )
    raise ValueError(
        f"need ({zoom_col},{x_col},{y_col}) or ({lon_col},{lat_col}) columns, "
        f"got {sorted(cols)}"
    )


def split_key(block_zoom: int, salt: str = "split") -> Column:
    """The block's 60-bit assignment hash (requires block_x/block_y)."""
    bid = F.concat_ws(
        "_", F.lit(int(block_zoom)), F.col("block_x"), F.col("block_y")
    )
    return sample_hash(bid, salt)


def spatial_split(
    df: DataFrame,
    *,
    block_zoom: int,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
    keep_block: bool = False,
    **block_kw,
) -> DataFrame:
    """Input rows + a ``split`` label, spatially blocked at
    ``block_zoom``. ``fractions`` maps label → share in label order
    (default ``{"train": .8, "val": .1, "test": .1}``) and must sum to
    1. Pure projection — zero shuffle, deterministic in (row, salt)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for k, v in fractions.items():
        if not 0.0 < v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in (0, 1], got {v}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")

    out = with_block_cell(df, block_zoom, **block_kw)
    h = split_key(block_zoom, salt)
    labels = list(fractions)
    expr = None
    cum = 0.0
    # the last label takes the open tail so float rounding of the
    # cumulative thresholds can never drop a block
    for k in labels[:-1]:
        cum += fractions[k]
        cond = h < F.lit(int(cum * _HASH_SPACE))
        expr = F.when(cond, F.lit(k)) if expr is None else expr.when(cond, F.lit(k))
    last = F.lit(labels[-1])
    expr = last if expr is None else expr.otherwise(last)
    out = out.withColumn("split", expr)
    return out if keep_block else out.drop("block_x", "block_y")


def split_leakage_report(df: DataFrame, block_zoom: int, **block_kw) -> DataFrame:
    """Audit frame: one row per occupied block with its split label(s)
    and row count — ``n_splits > 1`` anywhere means leakage (impossible
    for ``spatial_split`` output by construction; the report exists to
    audit EXTERNALLY-assigned splits). One exchange, block-sized."""
    out = with_block_cell(df, block_zoom, **block_kw)
    return (
        out.groupBy("block_x", "block_y")
        .agg(
            F.countDistinct("split").alias("n_splits"),
            F.sort_array(F.collect_set("split")).alias("splits"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
