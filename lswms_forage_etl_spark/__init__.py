"""lswms_forage_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of CIAT-DAPA/lswms_forage_etl.

The reference (see /root/reference, SURVEY.md) is a single-node pandas/numpy
forage-biomass ETL. This package re-expresses its dataflow semantics —
sources, scalar functions, joins, aggregations, windows, and model operators —
as lazy Spark DataFrame plans so that Catalyst/AQE provide planning and the
same code scales from the reference's ~19k-point workload to a 100 TB cluster.

Layout:
  functions/   pure column-expression scalar functions (SURVEY §2.3)
  operators/   DataFrame->DataFrame relational/window/dedup operators (§2.2-2.8)
  models/      numpy model kernels wrapped by applyInPandas (§2.9 M1/M2)
  sources/     schema-enforced readers and legacy-compatible sinks (§2.1)
  plans/       stage composition / pipeline driver (§3)
  streaming/   incremental & Structured Streaming layer (§2.10)
"""

__version__ = "0.1.0"

from lswms_forage_etl_spark.session import get_spark  # noqa: F401
