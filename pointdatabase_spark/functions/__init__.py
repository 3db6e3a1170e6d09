from pointdatabase_spark.functions.binning import (  # noqa: F401
    bin_center, bin_key, cell_index, neighbor_offsets,
)
from pointdatabase_spark.functions.nullsafe import finite, nan_to_null  # noqa: F401
