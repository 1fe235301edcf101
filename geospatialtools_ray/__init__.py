"""geospatialtools_ray — a Ray-Data-native spatial-join + tiling engine.

Brand-new engine (NOT a port) with the query/data-processing capabilities of
chaneyn/geospatialtools (reference at /root/reference, cited per-module as
file:line), re-expressed as ray.data.Dataset pipelines: map_batches over
zero-copy Arrow batches, actor pools for stateful index/model stages,
explicit geocell partitioning with salted shuffles for skew, and resumable
partitioned Parquet sinks with per-partition lineage.

Layout:
- geocell / wkb / hashing: numpy foundations (partition key, geometry codec,
  deterministic synthesis hashing).
- synth: deterministic corpus / polygon / station / DEM generators.
- sources: corpus + tiled-raster table readers/writers.
- functions: stateless scalar math (pedotransfer, metrics, time_average, ...).
- stages: span extraction, spatial join, kNN, dedup, text analysis, ANN,
  multimodal plumbing.
- terrain: the distributed terrain engine (fill, D8/MFD accumulation,
  channels, basins, hillslopes, HAND, CCL) + the single-node numpy oracle.
- pipelines: end-to-end flagship pipelines.
- state: lineage records + checkpoint/resume.

None of the library code calls ray.init()/ray.shutdown(); sessions are owned
by bench.py / tests / the driver.
"""

__version__ = "0.1.0"
