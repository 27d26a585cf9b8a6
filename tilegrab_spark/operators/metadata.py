"""Image-metadata extraction + GPS geotagging — the multimodal/geo
crossover: pull EXIF (JPEG) / text chunks (PNG) out of the binary
payload column, surface camera fields and decimal GPS coordinates, and
key geotagged rows by tile cell so photo corpora join directly against
the engine's coverage tables.

Curation uses: PII audit (EXIF GPS is personal data — find every image
that carries it before release), capture-time/device stratification,
and spatial joins of photo corpora against tile coverage
(``geotag_cells`` output is join-ready on the packed cell key).

Plan shape at 100 TB: one ``mapInPandas`` pass for extraction (bytes
stay in Arrow batches executor-side, no shuffle); ``geotag_cells`` adds
a pure-Catalyst cell encode (functions/cells.py, whole-stage codegen)
— still no shuffle. Malformed metadata surfaces as ``ok=false`` rows,
never task failures (the multimodal.py convention).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from tilegrab_spark.kernels import exif

__all__ = ["IMAGE_METADATA_SCHEMA", "extract_image_metadata", "geotag_cells", "strip_image_metadata"]

IMAGE_METADATA_SCHEMA = (
    "image_id string, fmt string, ok boolean, has_gps boolean, "
    "lon double, lat double, alt_m double, "
    "make string, model string, orientation int, datetime string, "
    "extra map<string,string>"
)


def extract_image_metadata(df: DataFrame) -> DataFrame:
    """Per-image metadata rows (IMAGE_METADATA_SCHEMA) from the
    (image_id, bytes, fmt) table. JPEG -> EXIF IFD0 + EXIF + GPS IFDs;
    PNG -> tEXt/zTXt/iTXt pairs in ``extra``. Images without metadata
    are ``ok=true, has_gps=false`` with null fields; malformed metadata
    is ``ok=false``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                row = {
                    "image_id": iid, "fmt": fmt, "ok": True, "has_gps": False,
                    "lon": None, "lat": None, "alt_m": None,
                    "make": None, "model": None, "orientation": None,
                    "datetime": None, "extra": {},
                }
                try:
                    raw = bytes(data)
                    if fmt in ("jpg", "jpeg"):
                        m = exif.parse_jpeg_exif(raw)
                        # coerce to schema types: a malformed-but-parseable
                        # stream can yield wrong-typed fields (e.g. a
                        # string orientation) that would fail the Arrow cast
                        _s = lambda v: v if isinstance(v, str) else None
                        _i = lambda v: int(v) if isinstance(v, int) else None
                        dt = m.get("datetime_original") or m.get("datetime")
                        row.update(
                            lon=m.get("lon"), lat=m.get("lat"),
                            alt_m=m.get("alt_m"), make=_s(m.get("make")),
                            model=_s(m.get("model")),
                            orientation=_i(m.get("orientation")),
                            datetime=_s(dt),
                            has_gps="lon" in m and "lat" in m,
                            extra={
                                k: str(v) for k, v in m.items()
                                if k in ("exposure_s", "focal_mm")
                            },
                        )
                    elif fmt == "png":
                        row["extra"] = exif.parse_png_text(raw)
                    # other formats: no metadata channel -> ok, empty row
                except (ValueError, KeyError, IndexError):
                    row["ok"] = False
                out.append(row)
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        kernel, schema=IMAGE_METADATA_SCHEMA
    )


def geotag_cells(meta: DataFrame, zoom: int) -> DataFrame:
    """Geotagged rows keyed by tile cell: filters to ``has_gps`` rows and
    adds (z, x, y) at ``zoom`` — pure Catalyst, join-ready against
    coverage/tile tables. Input: any frame with lon/lat doubles (e.g.
    ``extract_image_metadata`` output)."""
    if not 0 <= int(zoom) <= 29:
        raise ValueError(f"zoom must be in [0, 29], got {zoom}")
    from tilegrab_spark.functions.cells import cell_encode_cols

    x, y = cell_encode_cols(F.col("lon"), F.col("lat"), int(zoom))
    return (
        meta.filter(
            F.col("has_gps") & F.col("lon").isNotNull() & F.col("lat").isNotNull()
        )
        .withColumn("z", F.lit(int(zoom)))
        .withColumn("x", x)
        .withColumn("y", y)
    )


def strip_image_metadata(df: DataFrame) -> DataFrame:
    """PII scrub for image payloads: EXIF/XMP/ICC/comment segments
    (JPEG) and text/EXIF/timestamp chunks (PNG) removed byte-level —
    decoded pixels untouched. Output replaces ``bytes`` and adds
    ``bytes_saved`` (long) and ``strip_ok``; unknown formats and
    malformed streams pass through unmodified with ``strip_ok=false``.
    One shuffle-free ``mapInPandas`` pass; idempotent."""
    fields = [f.name for f in df.schema.fields]
    if "bytes" not in fields or "fmt" not in fields:
        raise ValueError("strip_image_metadata needs 'bytes' and 'fmt' columns")
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", bytes_saved long, strip_ok boolean"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            saved, ok, cleaned = [], [], []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                raw = bytes(data)
                try:
                    if fmt in ("jpg", "jpeg"):
                        new = exif.strip_jpeg_metadata(raw)
                    elif fmt == "png":
                        new = exif.strip_png_metadata(raw)
                    else:
                        raise ValueError("no metadata channel")
                    cleaned.append(new)
                    saved.append(len(raw) - len(new))
                    ok.append(True)
                except ValueError:
                    cleaned.append(raw)
                    saved.append(0)
                    ok.append(False)
            pdf = pdf.copy()
            pdf["bytes"] = cleaned
            pdf["bytes_saved"] = saved
            pdf["strip_ok"] = ok
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)
