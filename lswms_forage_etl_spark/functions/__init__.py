"""Pure column-expression scalar functions (SURVEY §2.3 C1-C22).

Everything here is a Catalyst expression — JVM-side, whole-stage-codegen
eligible. No Python UDFs.
"""

from lswms_forage_etl_spark.functions.grid import (  # noqa: F401
    cell_to_lat,
    cell_to_lon,
    lat_to_row,
    lon_to_col,
    snap_cell,
)
from lswms_forage_etl_spark.functions.dates import (  # noqa: F401
    date_to_yyyymmdd,
    yyyymmdd_to_date,
)
from lswms_forage_etl_spark.functions.cleansing import (  # noqa: F401
    mask_sentinels,
    normalized_difference,
    biomass_calibration,
)
