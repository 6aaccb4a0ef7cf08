from lswms_forage_etl_spark.plans.corpus import corpus_pipeline
from lswms_forage_etl_spark.plans.pipeline import (
    Pipeline,
    Stage,
    StageResult,
    forage_pipeline,
)

__all__ = ["Pipeline", "Stage", "StageResult", "forage_pipeline",
           "corpus_pipeline"]
