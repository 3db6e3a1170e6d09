"""pointdatabase_spark — a PySpark-native spatial point analytics engine.

A from-scratch re-expression of the capabilities of SmithB/PointDatabase
(reference surveyed in SURVEY.md) on top of Apache Spark DataFrames:

- spatial binning + bin-partitioned Parquet layout (replaces geo_index)
- box queries with partition pruning (replaces query_xy_box)
- quality / along-track window filters (replaces ATL06_filters)
- exact block-median / block-max spatial aggregation (replaces
  pt_blockmedian / blockmax)
- track reconstruction + crossover analysis (replaces
  cross_ATL06_tile + xover_search)
- raster broadcast interpolation joins (replaces mapData.interp)
- CRS transforms as vectorized pandas UDFs (replaces get_xy/from_latlon)
- training-data pipeline ops: dedup (exact/MinHash/SimHash/Jaccard),
  similarity search, text analysis, multimodal plumbing.

Everything is declarative DataFrame / SQL so Catalyst handles partition
pruning, predicate pushdown, column pruning and join strategy; Python
kernels (NumPy inside applyInPandas) exist only where geometry cannot be
expressed with built-in expressions (crossover refinement, plane fit,
CRS transform, raster interpolation).
"""

__version__ = "0.1.0"
