"""hydro_raster_ray — a Ray-Data-native spatial-join + tiling engine.

Reimplements the capabilities of ``mingxiaodong/hydro-raster`` (reference at
/root/reference, read-only) as streaming operators over a Lance-shaped table
of image tiles (``image_id, bytes, w, h, fmt, caption, phash``): every stage
is a ``map_batches`` transform over Arrow blocks (actor pools for stateful
stages), wide steps are explicit hash-partitioned shuffles keyed on a Morton
cell index, and outputs are partitioned Parquet with per-partition lineage so
killed runs resume.

Layout:
    grid.py       coordinate math + tiling scheme (reference-exact rounding)
    codecs.py     fmt codecs (raw-f32 / raw-u16 / qlossy) + NODATA↔NaN
    geom.py       point-in-polygon, polyline walk
    oracle.py     single-process numpy oracle (conformance witness)
    fixtures.py   deterministic synthetic fixtures (FIXTURES.md)
    sources/      tiles table readers/writers
    stages/       distributed operators (clip, rasterize, mosaic, interp, ...)
    pipelines/    end-to-end entry-point pipelines (EP1-EP3)
    text/         training-data ops (dedup, quality, ANN) over documents
    state/        lineage manifests + resumable writes
"""

from .grid import GridSpec, TileScheme  # noqa: F401

__version__ = "0.1.0"
