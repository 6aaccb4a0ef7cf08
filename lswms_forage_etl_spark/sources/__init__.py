from lswms_forage_etl_spark.sources.geometry import (
    zone_coverage_from_wkt,
    zone_coverage_tables,
)
from lswms_forage_etl_spark.sources.geotiff import (
    geotiff_to_cells,
    geotiff_to_cells_distributed,
    read_geotiff,
)
from lswms_forage_etl_spark.sources.ingest import (
    Notifier,
    daily_fetch_plan,
    run_fetches,
)
from lswms_forage_etl_spark.sources.shapefile import (
    read_shapefile_zones,
    read_shp_polygons,
)
from lswms_forage_etl_spark.sources.readers import (
    read_csv_strict,
    read_points_csv,
    read_raster_cells,
    scan_raster_filenames,
)
from lswms_forage_etl_spark.sources.xlsx import (
    read_points_xlsx,
    read_xlsx_rows,
)
from lswms_forage_etl_spark.sources.geoserver import (
    GeoServerPublisher,
    build_mosaic_zip,
)
from lswms_forage_etl_spark.sources.sinks import (
    geotiff_export,
    read_manifest,
    rest_post_sink,
    write_bucketed,
    write_legacy_csv,
    write_manifest,
    write_partitioned,
)

__all__ = [
    "read_csv_strict", "read_points_csv", "read_raster_cells",
    "scan_raster_filenames", "write_partitioned", "write_legacy_csv",
    "write_manifest", "read_manifest", "rest_post_sink", "geotiff_export",
    "write_bucketed",
    "zone_coverage_from_wkt", "zone_coverage_tables",
    "daily_fetch_plan", "run_fetches", "Notifier",
    "read_geotiff", "geotiff_to_cells", "geotiff_to_cells_distributed",
    "GeoServerPublisher", "build_mosaic_zip",
    "read_shapefile_zones", "read_shp_polygons",
    "read_xlsx_rows", "read_points_xlsx",
]
