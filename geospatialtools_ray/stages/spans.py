"""Span-level operators over the interleaved corpus (input_hint schema).

The per-row invariant the whole engine is gated on (BASELINE.json
input_hint): the span sequence `(kind, text, media_ref, order)` of every doc
must pass through every pipeline byte-identical. Stages here therefore never
rebuild the `spans` column — they only read it (zero-copy Arrow) and attach
derived columns, or explode to a side table keyed by doc_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import geocell

_POINT_RE = r"POINT\((?P<lon>[-0-9.eE+]+) (?P<lat>[-0-9.eE+]+)\)"


def doc_key_u64(doc_id: pa.Array) -> pa.Array:
    """Pack string doc ids into uint64 join keys. `doc-<digits>` ids parse
    to their numeric suffix (invertible); anything else falls back to a
    64-bit content hash. The parse/hash decision is PER ROW (a function of
    the id alone), so the same doc_id maps to the same key in every batch —
    an all-or-nothing per-batch fallback would give one doc different keys
    depending on batch composition. Shipping an 8-byte key through a
    10^11-row join instead of a 13-byte string + offsets is a measured
    ~15% cut in the fan-out's memory traffic (BENCH round 2)."""
    ids = doc_id.combine_chunks() if isinstance(doc_id, pa.ChunkedArray) else doc_id
    # fast path (the synthetic corpus shape): every id is doc-<digits>
    if pc.all(pc.starts_with(ids, "doc-")).as_py():
        try:
            num = pc.cast(pc.utf8_slice_codeunits(ids, start=4, stop=64), pa.int64())
            return pc.cast(num, pa.uint64())
        except pa.ArrowInvalid:
            pass
    from ..hashing import text_hash_u64

    # <=19 digits: always fits uint64 (20+ digits could overflow the cast)
    is_doc = pc.match_substring_regex(ids, r"^doc-[0-9]{1,19}$")
    mask = is_doc.to_numpy(zero_copy_only=False)
    out = text_hash_u64(ids).astype(np.uint64)
    if mask.any():
        safe = pc.if_else(is_doc, pc.utf8_slice_codeunits(ids, start=4, stop=64), "0")
        nums = pc.cast(safe, pa.uint64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        out = np.where(mask, nums, out)
    return pa.array(out, type=pa.uint64())


def explode_geo_points(batch: pa.Table, key_mode: str = "string",
                       f32_coords: bool = False) -> pa.Table:
    """docs batch -> one row per geo span: (doc_id, span_ord, lon, lat).

    Fully vectorized: Arrow list-flatten + regex extract; no Python row
    loop. This replaces the reference's per-point driver loop in
    `extract_point_data` (libraries/gdal_tools.py:26-32) with a batch
    transform.
    """
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):  # pragma: no cover
        spans = spans.combine_chunks()
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans)
    # ordinal of each span within its doc
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    total = len(flat)
    ords = np.arange(total, dtype=np.int32) - np.repeat(offsets[:-1], np.diff(offsets)).astype(np.int32)

    kind = flat.field("kind")
    is_geo = pc.equal(kind, "geo")
    geo_idx = np.flatnonzero(is_geo.to_numpy(zero_copy_only=False))
    key_col = "doc_key" if key_mode == "u64" else "doc_id"
    key_src = doc_key_u64(batch["doc_id"]) if key_mode == "u64" else batch["doc_id"]
    if len(geo_idx) == 0:
        return pa.table(
            {
                key_col: pa.array([], type=pa.uint64() if key_mode == "u64" else batch["doc_id"].type),
                "span_ord": pa.array([], type=pa.int32()),
                "lon": pa.array([], type=pa.float64()),
                "lat": pa.array([], type=pa.float64()),
            }
        )
    geo_text = flat.field("text").take(pa.array(geo_idx))
    m = pc.extract_regex(geo_text, _POINT_RE)
    lon = pc.struct_field(m, "lon").cast(pa.float64())
    lat = pc.struct_field(m, "lat").cast(pa.float64())
    if f32_coords:
        # narrow-bytes shuffle variant: f32 coordinates (~1e-5 deg = ~1 m
        # quantization) halve the fan-out's coordinate traffic; containment
        # near polygon edges can flip within that metre — a documented
        # precision/bandwidth trade, not the correctness default
        lon = lon.cast(pa.float32())
        lat = lat.cast(pa.float32())
    keys = key_src.take(pa.array(parent.to_numpy(zero_copy_only=False)[geo_idx]))
    out = pa.table(
        {
            key_col: keys,
            "span_ord": pa.array(ords[geo_idx], type=pa.int32()),
            "lon": lon,
            "lat": lat,
        }
    )
    # malformed geo spans (text not matching WKT POINT) extract to null:
    # drop them here so downstream joins never see null coordinates
    if lon.null_count:
        out = out.filter(pc.is_valid(out["lon"]))
    return out


def attach_cell(batch: pa.Table, res: int, lon_col: str = "lon", lat_col: str = "lat",
                compact: bool = False) -> pa.Table:
    """Tile assignment: add the geocell partition key (uint64 packed, or
    uint32 row-major when `compact` — the narrow-bytes shuffle variant)."""
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    if compact:
        cells = geocell.cell_of_compact(lon, lat, res)
        return batch.append_column("cell", pa.array(cells, type=pa.uint32()))
    cells = geocell.cell_of(lon, lat, res)
    return batch.append_column("cell", pa.array(cells, type=pa.uint64()))


def hex8_to_int(refs: pa.Array, prefix_len: int = 13) -> np.ndarray:
    """Vectorized parse of the 8-hex-digit suffix of `media://blob/%08x`
    refs to int64 — a per-row pure function, so asset ids never need a
    broadcast ref->id map (scale-wrong at planetary asset counts). No
    Python loop: the fixed-width suffix is viewed as a (n, 8) uint8 matrix
    and dotted with the 16^k place values. Raises on malformed refs (any
    non-hex byte) rather than aliasing assets silently."""
    if isinstance(refs, pa.ChunkedArray):
        refs = refs.combine_chunks()
    n = len(refs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    suffix = pc.utf8_slice_codeunits(refs, start=prefix_len, stop=prefix_len + 8)
    lens = pc.binary_length(suffix).to_numpy(zero_copy_only=False)
    if not (lens == 8).all():
        raise ValueError("hex8_to_int: ref suffix not 8 chars — malformed media_ref")
    # zero-copy: the flat value buffer of a no-null fixed-width string
    # array IS the (n, 8) digit matrix
    arr = suffix.combine_chunks() if isinstance(suffix, pa.ChunkedArray) else suffix
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset: arr.offset + n + 1]
    mat = data[offs[0]: offs[0] + 8 * n].reshape(n, 8)
    digit = mat.astype(np.int64) - 48
    alpha = mat >= 97
    digit[alpha] = mat[alpha].astype(np.int64) - 87
    if ((digit < 0) | (digit > 15)).any():
        raise ValueError("hex8_to_int: non-hex byte in media_ref suffix")
    place = (np.int64(16) ** np.arange(7, -1, -1, dtype=np.int64))
    return digit @ place


def explode_spans(batch: pa.Table, fields: tuple[str, ...] = ("kind",),
                  kind: str | None = None) -> pa.Table:
    """docs batch -> one row per span: (doc_id, span_ord, <fields...>),
    optionally filtered to a single span kind. Fully vectorized (Arrow
    list-flatten + parent indices); the `spans` column is only READ —
    the north-rule sequence invariant is untouched. `span_ord` is the
    span's 0-based position within its doc, so order-sensitive consumers
    (kind-transition counts, signature checks) can reconstruct adjacency
    after the explode."""
    spans = batch["spans"].combine_chunks()
    flat = spans.flatten()
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    total = len(flat)
    ords = np.arange(total, dtype=np.int32) - np.repeat(offsets[:-1], np.diff(offsets)).astype(np.int32)
    parent = pc.list_parent_indices(spans)
    doc_id = batch["doc_id"].combine_chunks().take(parent)
    cols: dict[str, pa.Array] = {
        "doc_id": doc_id,
        "span_ord": pa.array(ords, type=pa.int32()),
    }
    for f in fields:
        cols[f] = flat.field(f)
    out = pa.table(cols)
    if kind is not None:
        out = out.filter(pc.equal(flat.field("kind"), kind))
    return out


def span_signature(batch: pa.Table) -> pa.Table:
    """Per-doc stable signature of the span sequence (kind,text,media_ref,
    order) — used by tests and lineage to assert span-sequence equality
    without shipping span payloads around."""
    spans = batch["spans"].combine_chunks()
    flat = spans.flatten()
    joined = pc.binary_join_element_wise(
        flat.field("kind"),
        flat.field("text"),
        flat.field("media_ref"),
        pc.cast(flat.field("offset"), pa.string()),
        "\x1f",
    )
    # re-wrap to per-doc list and join with a record separator
    per_doc = pa.ListArray.from_arrays(spans.offsets, joined)
    sig = pc.binary_join(per_doc, "\x1e")
    return pa.table({"doc_id": batch["doc_id"], "span_sig": sig})
