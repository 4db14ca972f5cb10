"""gmx — a PySpark-native GIS-metadata extraction + spatial-join/tiling engine.

Re-derives the query/data-processing semantics of consbio/gis-metadata-parser
(reference at /root/reference, cited per-module as file:line) as columnar Spark
dataflow over an interleaved text+media span corpus, then layers the spatial
capabilities mandated by BASELINE.json: cell-grid (H3/S2-style) indexing of each
record's bounding box, bbox-overlap / point-in-polygon spatial joins, kNN,
raster-tile joins, with explicit skew handling.

Design notes (Spark-first, 100 TB scale):
- All extraction is declarative: per-standard property->path specs compiled at
  driver time; execution is one Arrow-batched ``mapInPandas`` pass per corpus
  partition (no per-row Python UDFs, no RDDs).
- The spatial layer is pure DataFrame ops: explode(cell covering) -> equi-join
  -> exact refine; hot cells (whole-world bboxes) are salted.
- Kernels in ``gmx.extract`` / ``gmx.serialize`` are plain-Python batch
  functions shared by the Spark UDFs and the pytest oracles, so golden
  equality is tested on exactly the code that runs in executors.
"""

__version__ = "0.1.0"
