from lswms_forage_etl_spark.sources.readers import (
    read_csv_strict,
    read_points_csv,
    read_raster_cells,
    scan_raster_filenames,
)
from lswms_forage_etl_spark.sources.sinks import (
    geotiff_export,
    read_manifest,
    rest_post_sink,
    write_legacy_csv,
    write_manifest,
    write_partitioned,
)

__all__ = [
    "read_csv_strict", "read_points_csv", "read_raster_cells",
    "scan_raster_filenames", "write_partitioned", "write_legacy_csv",
    "write_manifest", "read_manifest", "rest_post_sink", "geotiff_export",
]
