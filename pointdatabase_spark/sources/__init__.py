"""Source/sink connectors: parquet tile store, science-format
converters (ATL06/Qfit transform layers), and the stdlib GeoTIFF
codec (S4/S5 scan + S14 sink)."""

from pointdatabase_spark.sources.geotiff import (  # noqa: F401
    grid_from_points,
    read_geotiff,
    write_geotiff,
)
