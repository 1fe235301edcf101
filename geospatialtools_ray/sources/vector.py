"""Vector layer ingestion — the engine's twin of the reference's shapefile
path (libraries/gdal_tools.py:170-192, which shells out to ogr2ogr).

In-engine a polygon layer is a table (poly_id, field_value, geom_wkb) —
SURVEY.md section 1.2. Readers here accept:
- parquet with those columns (the interchange format; any shapefile can be
  converted offline with standard tools),
- a JSON file [{"poly_id", "field_value", "wkb_hex"}, ...] for tests.

`read_polygon_layer` returns the layer dict `PolygonIndex.from_synth`
consumes (bbox + geocell cover computed here from the WKB rings), so a
file layer drops straight into the flagship spatial join. True shapefile
parsing stays behind `read_shapefile` — an explicit NotImplementedError
seam (no OGR in this sandbox)."""

from __future__ import annotations

import json
import os

import numpy as np

from .. import geocell, wkb


def _layer_from_columns(poly_ids, field_values, wkbs, cover_res: int) -> dict:
    bboxes = [wkb.polygon_bbox(b) for b in wkbs]
    covers = [geocell.cover_bbox(b[0], b[1], b[2], b[3], cover_res) for b in bboxes]
    return {
        "poly_id": np.asarray(poly_ids, dtype=np.int64),
        "field_value": np.asarray(field_values, dtype=np.float64),
        "geom_wkb": list(wkbs),
        "bbox": np.asarray(bboxes, dtype=np.float64).reshape(len(bboxes), 4),
        "cell_cover": covers,
    }


def read_polygon_layer(path: str, cover_res: int = 6) -> dict:
    """Polygon layer file -> layer dict (see module docstring)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".parquet", ".pq"):
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["poly_id", "field_value", "geom_wkb"])
        return _layer_from_columns(
            t["poly_id"].to_numpy(zero_copy_only=False),
            t["field_value"].to_numpy(zero_copy_only=False),
            [bytes(x) for x in t["geom_wkb"].to_pylist()],
            cover_res,
        )
    if ext == ".json":
        recs = json.load(open(path))
        return _layer_from_columns(
            [r["poly_id"] for r in recs],
            [r["field_value"] for r in recs],
            [bytes.fromhex(r["wkb_hex"]) for r in recs],
            cover_res,
        )
    if ext in (".shp", ".gpkg"):
        raise NotImplementedError(
            f"{path}: shapefile/geopackage parsing needs OGR (not in this sandbox) — "
            "convert to parquet (poly_id, field_value, geom_wkb) offline"
        )
    raise ValueError(f"{path}: unknown polygon layer format {ext!r}")


def write_polygon_layer(path: str, layer: dict) -> str:
    """Layer dict -> parquet interchange file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "poly_id": pa.array(np.asarray(layer["poly_id"], dtype=np.int64)),
            "field_value": pa.array(np.asarray(layer["field_value"], dtype=np.float64)),
            "geom_wkb": pa.array([bytes(b) for b in layer["geom_wkb"]], type=pa.binary()),
        }
    )
    pq.write_table(t, path)
    return path
