"""esda_spark — a PySpark-native exploratory spatial statistics +
spatial-join engine with the query semantics of pysal/esda, built
Spark-first for web-scale (10^12-row) tables.

Public surface (see SURVEY.md §2 for the operator inventory):

- sources:  deterministic geocoding (``sources.points``), synthetic
  Common-Crawl-shaped pages (``sources.webpages``), polygon layers
  (``sources.polygons``)
- weights:  kNN / distance-band / lattice-contiguity edge DataFrames,
  R/B/D/O/V transforms, s0/s1/s2 summaries (``operators.weights``)
- global stats: Moran, Moran_BV, Geary, Getis-Ord G, Gamma,
  Join_Counts, Lee, Moran_Rate (``operators.global_stats``)
- local stats: Moran_Local (+BV/+Rate), Geary_Local, G_Local/G*,
  local join counts (uni/BV/MV), local Lee, LOSH
  (``operators.local_stats``)
- inference: conditional-randomization engine (``operators.crand``),
  pseudo-p alternatives + FDR (``operators.significance``)
- rates: Assunção, excess risk, EB, spatial EB/rate/median/disk
  (``operators.rates``)
- spatial joins: point-in-polygon, kNN join, polygon overlay
  entropies, raster<->vector tiling (``operators.spatial_join``)
- text pipeline: exact/MinHash-LSH/SimHash dedup, n-gram Jaccard,
  language ID, quality scores, token counts, fingerprints
  (``operators.text``)
- similarity: brute-force + LSH cosine top-k (``operators.similarity``)
- streaming ingest + checkpoint/lineage (``streaming``, ``plans``)
"""

from esda_spark.session import get_spark

__version__ = "0.1.0"
__all__ = ["get_spark", "__version__"]
